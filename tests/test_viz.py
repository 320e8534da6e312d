"""Visualization/export smoke tests (host-side, figure objects + files)."""

import numpy as np

from shapegen_tpu import utils


def test_plot_figures(rng):
    pc = rng.standard_normal((50, 3)).astype(np.float32)
    for fig in (
        utils.plot_point_cloud_3d(pc),
        utils.plot_point_cloud_2d(pc),
        utils.plot_comparison_point_clouds(pc, pc + 0.1, "t"),
        utils.plot_3d(pc, is_voxel=False),
        utils.plot_multiple_3d([pc, pc], is_voxel=False, rows=1, cols=2),
    ):
        assert fig is not None
    # Empty cloud must not crash (utils.py:302-303 behavior).
    assert utils.plot_point_cloud_3d(np.zeros((0, 3))) is not None


def test_voxel_plots_and_coords():
    coords = utils.get_coords(8)
    assert coords.shape == (3, 8, 8, 8)
    g = np.zeros((8, 8, 8), np.float32)
    g[2, 3, 4] = 1.0
    pts = utils.voxel_grid_to_point_cloud(g)
    assert pts.shape == (1, 3)
    assert np.abs(pts).max() <= 1.0
    assert utils.plot_voxels(g) is not None


def test_exports(tmp_path, rng):
    pc = rng.standard_normal((20, 3)).astype(np.float32)
    ply = str(tmp_path / "x.ply")
    utils.save_to_ply(ply, pc)
    assert open(ply, "rb").read(3) == b"ply"
    csv = str(tmp_path / "x.csv")
    utils.save_point_cloud(pc, csv)
    loaded = np.loadtxt(csv, delimiter=",")
    np.testing.assert_allclose(loaded, pc, rtol=1e-5)


def test_comparison_file_outputs(tmp_path, rng):
    pc = rng.standard_normal((30, 3)).astype(np.float32)
    p1 = str(tmp_path / "cmp.png")
    utils.save_point_cloud_comparison(pc, pc, p1, "t")
    assert (tmp_path / "cmp.png").exists()
    p2 = str(tmp_path / "three.png")
    utils.save_three_point_cloud_comparison(pc, pc, pc, p2, "t", 30, 30)
    assert (tmp_path / "three.png").exists()
