#!/usr/bin/env python
"""Generate a tiny synthetic ShapeNet-like .dd voxel dataset for smoke tests.

Filenames follow the reference layout so the category filter's 5th '_'-token
parse (data.py:146) works: e.g. ``x_y_z_w_03001627_0001.dd``.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shapegen_tpu.data.dataset import save_dd  # noqa: E402

SYNSETS = {
    "chair": "03001627",
    "airplane": "02691156",
    "table": "04379243",
    "sofa": "04256520",
    "lamp": "03636649",
}

# Default output keeps the original dimension-distinct trio; the confusable
# sofa/lamp families are opt-in via --categories (conditional stress evals).
DEFAULT_CATEGORIES = ["chair", "airplane", "table"]


def make_blob(rng: np.random.Generator, res: int = 32, kind: str = "ellipsoid") -> np.ndarray:
    """A random solid occupancy grid; `kind` picks a class-distinct family
    (ellipsoid / box / cross) so conditional-generation demos have an actual
    class signal to learn."""
    center = rng.uniform(10, 22, 3)
    radii = rng.uniform(4, 10, 3)
    zz, yy, xx = np.meshgrid(*([np.arange(res)] * 3), indexing="ij")
    dz = np.abs(zz - center[0]) / radii[0]
    dy = np.abs(yy - center[1]) / radii[1]
    dx = np.abs(xx - center[2]) / radii[2]
    if kind == "box":
        occ = np.maximum(np.maximum(dz, dy), dx) < 1.0
    elif kind == "cross":
        thin = 0.3
        occ = (
            ((dz < thin) & (dy < thin) & (dx < 1.0))
            | ((dz < thin) & (dx < thin) & (dy < 1.0))
            | ((dy < thin) & (dx < thin) & (dz < 1.0))
        )
    elif kind == "rod":
        # A thin bar along one axis: 1-D mass distribution.
        occ = (dz < 1.0) & (dy < 0.28) & (dx < 0.28)
    elif kind == "slab":
        # A thin flat plate: 2-D mass distribution.
        occ = (dz < 0.18) & (dy < 1.0) & (dx < 1.0)
    elif kind == "thick_slab":
        # DELIBERATELY CONFUSABLE with "slab": same 2-D plate family, only
        # ~2x thicker — separating these stresses the class conditioning far
        # beyond the dimension-distinct rod/plate/cube trio.
        occ = (dz < 0.40) & (dy < 1.0) & (dx < 1.0)
    elif kind == "headed_rod":
        # DELIBERATELY CONFUSABLE with "rod": the same thin 1-D bar plus a
        # small head blob at one end (a lamp) — most of the mass still lies
        # on the rod, so CD margins to the plain rod are narrow.
        rod = (dz < 1.0) & (dy < 0.28) & (dx < 0.28)
        hz = (zz - (center[0] + radii[0])) / 3.0
        hy = (yy - center[1]) / 3.0
        hx = (xx - center[2]) / 3.0
        head = hz**2 + hy**2 + hx**2 < 1.0
        occ = rod | head
    else:  # ellipsoid
        occ = dz**2 + dy**2 + dx**2 < 1.0
    return occ.astype(np.float32)


# Class-distinct families with wide Chamfer margins — mass distributions of
# different intrinsic dimension (3-D solid cube / 1-D rod / 2-D plate) — so
# conditional-generation evals have separable targets even at moderate
# sample quality. sofa/lamp are DELIBERATELY CONFUSABLE with table/airplane
# (thicker plate / rod-with-head) for conditional stress evals.
SHAPE_KINDS = {
    "chair": "box",
    "airplane": "rod",
    "table": "slab",
    "sofa": "thick_slab",
    "lamp": "headed_rod",
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir")
    parser.add_argument("--per-category", type=int, default=8)
    parser.add_argument("--resolution", type=int, default=32)
    parser.add_argument("--seed", type=int, default=24)
    parser.add_argument("--categories", nargs="+", default=DEFAULT_CATEGORIES,
                        choices=sorted(SYNSETS))
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for cat in args.categories:
        synset = SYNSETS[cat]
        for i in range(args.per_category):
            grid = make_blob(rng, args.resolution, SHAPE_KINDS.get(cat, "ellipsoid"))
            name = f"shape_net_voxel_data_{synset}_{cat}_{i:04d}.dd"
            save_dd(os.path.join(args.out_dir, name), grid)
    print(f"wrote {args.per_category * len(args.categories)} files to {args.out_dir}")


if __name__ == "__main__":
    main()
