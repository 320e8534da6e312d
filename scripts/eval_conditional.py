#!/usr/bin/env python
"""Quantify category-conditional generation (extension over the reference,
which trains one unconditional model per category).

Loads a conditional point-DDPM checkpoint, samples N clouds per category
with classifier-free guidance, and reports:

  * a cross-class CD confusion matrix: mean Chamfer distance between the
    class-i generated set and the class-j reference set (diagonal should be
    the row minimum when the model has learned the class conditioning);
  * per-class MMD-CD (mean over class references of the min CD to any
    same-class generated cloud) for every (gen-class, ref-class) pair;
  * per-class COV-CD and 1-NNA against the own-class reference set;
  * the same confusion matrices under a SECOND statistic — device-resident
    Sinkhorn EMD (mean-EMD and MMD-EMD, point-subsampled) — to separate
    CD-metric artifacts from real conditioning failures (a diffuse rod
    CD-matches rod+head better than the clean rod; mass-balanced transport
    does not have that failure mode).

``--guidance`` takes a LIST of scales and the whole eval repeats per scale;
guidance 0.0 is the pure-conditional ablation (no unconditional pass mixed
in) — comparing it against guidance>0 rows shows what CFG buys.

All pairwise Chamfer matrices run through metrics.pairwise_chamfer_matrix —
on TPU that is the streaming Pallas kernel path.

Prints a markdown table and optionally writes a JSON evidence file.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from shapegen_tpu.data.dataset import PointCloudDataset  # noqa: E402
from shapegen_tpu.metrics import metrics  # noqa: E402
from shapegen_tpu.train.factory import load_task_checkpoint  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--categories", nargs="+",
                   default=["chair", "airplane", "table"])
    p.add_argument("--num-per-class", type=int, default=8)
    p.add_argument("--num-steps", type=int, default=1000)
    p.add_argument("--guidance", type=float, nargs="+", default=[0.0, 2.0, 4.0])
    p.add_argument("--sampler", default="ddim", choices=["ddim", "ddpm"])
    p.add_argument("--max-refs", type=int, default=64,
                   help="cap on reference clouds per class")
    p.add_argument("--seed", type=int, default=24)
    p.add_argument("--seeds", type=int, nargs="+", default=None,
                   help="run the whole sampling+scoring pass once per seed "
                        "IN ONE PROCESS (jit caches amortize across seeds — "
                        "a fresh process pays minutes of remote compile on "
                        "the tunnel). Overrides --seed; each result record "
                        "is tagged with its seed.")
    p.add_argument("--use-ema", action="store_true", default=False,
                   help="evaluate with the checkpoint's sibling EMA params "
                        "(<checkpoint>.ema, written when training ran with "
                        "--ema-decay; clearly-marked extension)")
    p.add_argument("--out", default=None, help="write JSON evidence here")
    p.add_argument("--no-emd", dest="emd", action="store_false", default=True,
                   help="skip the Sinkhorn-EMD second-statistic matrices")
    p.add_argument("--emd-points", type=int, default=512,
                   help="per-cloud point subsample for the EMD matrices "
                        "(Sinkhorn cost is O(N*M) per pair per iteration)")
    p.add_argument("--exact-emd", action="store_true", default=False,
                   help="ALSO score selected class blocks with the EXACT "
                        "EMD at full point count (reference "
                        "metrics.py:49-92 semantics — no Sinkhorn "
                        "regularization, no subsampling): all own-class "
                        "diagonals plus both directions of each "
                        "--confusable pair. Device auction solver on TPU "
                        "(certified within N*eps of optimal), host "
                        "Hungarian otherwise.")
    p.add_argument("--confusable", nargs="+", default=["airplane:lamp"],
                   help="gen:ref class pairs whose off-diagonal blocks the "
                        "exact-EMD pass scores in both directions")
    p.add_argument("--exact-emd-backend", default="auto",
                   choices=["auto", "device", "host"])
    p.add_argument("--exact-emd-block", type=int, default=32,
                   help="pairs per device batch for the auction solver")
    p.add_argument("--exact-emd-guidance", type=float, nargs="*", default=None,
                   help="restrict the exact-EMD pass to these guidance "
                        "values (default: all)")
    p.add_argument("--exact-emd-ref-ceiling", action="store_true",
                   default=False,
                   help="also compute the exact-EMD data ceiling (ref-vs-ref "
                        "LOO + cross blocks) for the confusable classes")
    return p.parse_args()


def subsample_points(clouds: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Seeded per-cloud random point subset, (B, k, 3) — bounds the
    Sinkhorn cost matrices while preserving each cloud's geometry."""
    if k >= clouds.shape[1]:
        return clouds
    rng = np.random.default_rng(seed)
    out = np.empty((clouds.shape[0], k, clouds.shape[2]), clouds.dtype)
    for i, c in enumerate(clouds):
        out[i] = c[rng.choice(c.shape[0], size=k, replace=False)]
    return out


def exact_block_set(cats, confusable):
    """(gen-idx, ref-idx) blocks the exact-EMD pass scores: every own-class
    diagonal plus both directions of each confusable pair."""
    blocks = {(i, i) for i in range(len(cats))}
    for pair in confusable:
        a, _, b = pair.partition(":")
        if a in cats and b in cats:
            ia, ib = cats.index(a), cats.index(b)
            blocks.add((ia, ib))
            blocks.add((ib, ia))
    return sorted(blocks)


def matrix_to_jsonable(m):
    """NaN-padded numpy matrix -> nested lists with None for unscored."""
    return [
        [None if np.isnan(v) else float(v) for v in row] for row in m
    ]


def scored_row_verdicts(m, cats):
    """Per gen-class: is the own-class entry the min over the SCORED entries
    of its row (rows with fewer than 2 scored entries return None)?"""
    verdicts = {}
    for i, c in enumerate(cats):
        row = m[i]
        scored = ~np.isnan(row)
        if scored.sum() < 2 or np.isnan(row[i]):
            verdicts[c] = None
        else:
            verdicts[c] = bool(row[i] == np.nanmin(row))
    return verdicts


def reference_set(data_dir, category, num_points, max_refs):
    ds = PointCloudDataset(
        data_dir,
        num_points=num_points,
        input_mode="voxels",
        output_mode="point_clouds",
        normalize=True,
        jitter=False,
        rotate=False,
        relevant_object_categories=[category],
        seed=24,
    )
    assert len(ds) > 0, (
        f"no .dd files for category {category!r} in {data_dir!r}"
    )
    n = min(len(ds), max_refs)
    clouds = np.stack([ds[i] for i in range(n)])
    return clouds, ds.label_for(0)


def main():
    args = parse_args()
    task, state, meta = load_task_checkpoint(args.checkpoint)
    if args.use_ema:
        from shapegen_tpu.train.checkpoints import load_checkpoint

        ema_path = args.checkpoint + ".ema"
        assert os.path.isdir(ema_path), (
            f"--use-ema: no EMA payload at {ema_path} (train with "
            "--ema-decay)"
        )
        ema_params, _ = load_checkpoint(
            ema_path, jax.device_get(state.params)
        )
        state = state.replace(params=jax.device_put(ema_params))
        print(f"[ema] evaluating with EMA params from {ema_path}")
    assert task.num_classes is not None, (
        "checkpoint is unconditional; train with --conditional"
    )
    num_points = task.num_points

    refs, labels = {}, {}
    for cat in args.categories:
        refs[cat], labels[cat] = reference_set(
            args.data_dir, cat, num_points, args.max_refs
        )
        print(f"[refs] {cat}: {refs[cat].shape[0]} clouds, label {labels[cat]}")

    # --- data separability baseline: are the classes CD-separable at all?
    # Leave-one-out per-class MMD between reference sets; if the diagonal
    # isn't the row-min here, no generator can show separation under CD.
    cats0 = args.categories
    ref_sep = np.zeros((len(cats0), len(cats0)))
    for i, ci in enumerate(cats0):
        for j in range(i, len(cats0)):  # CD is symmetric: d_ji = d_ij.T
            d = np.asarray(jax.device_get(
                metrics.pairwise_chamfer_matrix(refs[ci], refs[cats0[j]])
            ))
            if i == j:
                d = d + np.diag(np.full(d.shape[0], np.inf))  # exclude self
            ref_sep[i, j] = float(np.min(d, axis=1).mean())
            if i != j:
                ref_sep[j, i] = float(np.min(d.T, axis=1).mean())
    print("\nReference-vs-reference separability "
          "(mean over class-i refs of min CD to class-j refs; diag=LOO):")
    for i, ci in enumerate(cats0):
        row = " ".join(f"{ref_sep[i, j]:.4f}" for j in range(len(cats0)))
        print(f"  {ci}: {row}  (diag is row-min: {ref_sep[i, i] == ref_sep[i].min()})")

    # Same data ceiling under the second statistic (Sinkhorn EMD): if a
    # class pair is not EMD-separable on real data, a generator can't be
    # blamed for missing it under EMD either.
    refs_emd, ref_sep_emd = {}, None
    if args.emd:
        for cat in cats0:
            refs_emd[cat] = subsample_points(refs[cat], args.emd_points, args.seed)
        ref_sep_emd = np.zeros((len(cats0), len(cats0)))
        for i, ci in enumerate(cats0):
            # Sinkhorn EMD is symmetric (uniform marginals, symmetric cost):
            # d(ci, cj) = d(cj, ci).T, so only the upper triangle hits the
            # device — same trick as the CD loop above.
            for j, cj in enumerate(cats0[i:], start=i):
                d = np.asarray(jax.device_get(
                    metrics.pairwise_emd_matrix(refs_emd[ci], refs_emd[cj])
                ))
                if i == j:
                    d = d + np.diag(np.full(d.shape[0], np.inf))
                ref_sep_emd[i, j] = float(np.min(d, axis=1).mean())
                if i != j:
                    ref_sep_emd[j, i] = float(np.min(d.T, axis=1).mean())
        print("\nReference-vs-reference separability under Sinkhorn EMD "
              f"({args.emd_points} pts; diag=LOO):")
        for i, ci in enumerate(cats0):
            row = " ".join(f"{ref_sep_emd[i, j]:.4f}" for j in range(len(cats0)))
            print(f"  {ci}: {row}  (diag is row-min: "
                  f"{ref_sep_emd[i, i] == ref_sep_emd[i].min()})")

    # Exact-EMD data ceiling over the confusable classes (the statistic's
    # own separability bound before judging the generator).
    ref_ceiling_exact = None
    if args.exact_emd and args.exact_emd_ref_ceiling:
        # Per confusable pair, the 2x2 block (own-class LOO diagonals +
        # both cross directions) — the statistic's own separability bound
        # on the pair being judged.
        blocks = set()
        conf_idx = set()
        for pair in args.confusable:
            a, _, b = pair.partition(":")
            if a in cats0 and b in cats0:
                ia, ib = cats0.index(a), cats0.index(b)
                conf_idx.update({ia, ib})
                blocks.update({(ia, ia), (ia, ib), (ib, ia), (ib, ib)})
        ref_ceiling_exact = np.full((len(cats0), len(cats0)), np.nan)
        for (i, j) in sorted(blocks):
            d = metrics.pairwise_exact_emd_matrix(
                refs[cats0[i]], refs[cats0[j]],
                backend=args.exact_emd_backend,
                block=args.exact_emd_block, progress=True,
            )
            if i == j:
                d = d + np.diag(np.full(d.shape[0], np.inf))
            ref_ceiling_exact[i, j] = float(np.min(d, axis=1).mean())
        print("\nReference-vs-reference separability under EXACT EMD "
              "(full points; diag=LOO; confusable pair blocks only):")
        for i in sorted(conf_idx):
            row = " ".join(
                "-" if np.isnan(ref_ceiling_exact[i, j])
                else f"{ref_ceiling_exact[i, j]:.4f}"
                for j in range(len(cats0))
            )
            print(f"  {cats0[i]}: {row}")

    # --- label probe: does the model's eps-prediction use the label?
    # Fixed noise/t on real clouds: loss with TRUE labels should beat loss
    # with mismatched labels if conditioning is learned.
    import jax.numpy as jnp

    from shapegen_tpu.core import diffusion as diff

    probe_key = jax.random.PRNGKey(args.seed + 1)
    probe_losses = {}
    for name, lab_of in [
        ("true", lambda c: labels[c]),
        ("wrong", lambda c: labels[cats0[(cats0.index(c) + 1) % len(cats0)]]),
    ]:
        tot = []
        for c in cats0:
            pts = jnp.asarray(refs[c][:8])
            t = jnp.full((pts.shape[0],), 0.4)
            x_t, noise, _, _ = diff.add_noise(probe_key, pts, t, task.schedule)
            y = jnp.full((pts.shape[0],), lab_of(c), jnp.int32)
            pred = task.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x_t, t, y=y, train=False,
            )
            tot.append(float(jnp.mean(jnp.abs(noise - pred))))
        probe_losses[name] = float(np.mean(tot))
    print(f"\nlabel probe (t=0.4 eps-loss): true={probe_losses['true']:.4f} "
          f"wrong={probe_losses['wrong']:.4f} "
          f"(conditioning used: {probe_losses['wrong'] > probe_losses['true']})")

    cats = args.categories

    def table(m, title):
        lines = [f"\n{title} (rows: generated class, cols: reference class)",
                 "| gen \\ ref | " + " | ".join(cats) + " |",
                 "|---|" + "---|" * len(cats)]
        for i, gc in enumerate(cats):
            cells = []
            for j in range(len(cats)):
                mark = "**" if m[i, j] == m[i].min() else ""
                cells.append(f"{mark}{m[i, j]:.4f}{mark}")
            lines.append(f"| {gc} | " + " | ".join(cells) + " |")
        return "\n".join(lines)

    seeds = args.seeds or [args.seed]
    results = []
    for seed, (g_idx, guidance) in (
        (s, ge) for s in seeds for ge in enumerate(args.guidance)
    ):
        key = jax.random.PRNGKey(seed)
        print(f"\n========= seed {seed} | guidance {guidance} =========")
        gens = {}
        for i, cat in enumerate(cats):
            lab = np.full((args.num_per_class,), labels[cat], np.int32)
            out = task.sample_conditional(
                state, jax.random.fold_in(key, 1000 * g_idx + i), lab,
                num_steps=args.num_steps, guidance_scale=guidance,
                sampler=args.sampler,
            )
            gens[cat] = np.asarray(jax.device_get(out))
            print(f"[gen g={guidance}] {cat}: {gens[cat].shape}")

        mean_cd = np.zeros((len(cats), len(cats)))
        mmd_cd = np.zeros((len(cats), len(cats)))
        cov_own, nna_own = {}, {}
        for i, gc in enumerate(cats):
            for j, rc in enumerate(cats):
                d = np.asarray(
                    jax.device_get(
                        metrics.pairwise_chamfer_matrix(gens[gc], refs[rc])
                    )
                )
                mean_cd[i, j] = float(d.mean())
                mmd_cd[i, j] = float(d.min(axis=0).mean())
                if i == j:
                    covered = np.zeros(d.shape[1], bool)
                    covered[np.argmin(d, axis=1)] = True
                    cov_own[gc] = float(covered.mean())
                    nna_own[gc] = float(
                        jax.device_get(metrics.one_nna(gens[gc], refs[rc]))
                    )

        mean_emd = mmd_emd = None
        if args.emd:
            mean_emd = np.zeros((len(cats), len(cats)))
            mmd_emd = np.zeros((len(cats), len(cats)))
            for i, gc in enumerate(cats):
                g_sub = subsample_points(gens[gc], args.emd_points, args.seed)
                for j, rc in enumerate(cats):
                    d = np.asarray(jax.device_get(
                        metrics.pairwise_emd_matrix(g_sub, refs_emd[rc])
                    ))
                    mean_emd[i, j] = float(d.mean())
                    mmd_emd[i, j] = float(d.min(axis=0).mean())

        mean_exact = mmd_exact = None
        run_exact = args.exact_emd and (
            args.exact_emd_guidance is None
            or guidance in args.exact_emd_guidance
        )
        if run_exact:
            blocks = exact_block_set(cats, args.confusable)
            mean_exact = np.full((len(cats), len(cats)), np.nan)
            mmd_exact = np.full((len(cats), len(cats)), np.nan)
            for (i, j) in blocks:
                d = metrics.pairwise_exact_emd_matrix(
                    gens[cats[i]], refs[cats[j]],
                    backend=args.exact_emd_backend,
                    block=args.exact_emd_block, progress=True,
                )
                mean_exact[i, j] = float(d.mean())
                mmd_exact[i, j] = float(d.min(axis=0).mean())
                print(f"[exact-emd g={guidance}] {cats[i]} vs {cats[j]}: "
                      f"mean {mean_exact[i, j]:.4f} "
                      f"mmd {mmd_exact[i, j]:.4f}")

        print(table(mean_cd, f"Mean pairwise CD (guidance {guidance})"))
        print(table(mmd_cd, f"MMD-CD (guidance {guidance})"))
        if args.emd:
            print(table(mean_emd, f"Mean pairwise Sinkhorn EMD "
                                  f"(guidance {guidance})"))
            print(table(mmd_emd, f"MMD-EMD (guidance {guidance})"))
        print("\nCOV-CD own-class:",
              {c: round(v, 3) for c, v in cov_own.items()})
        print("1-NNA own-class (0.5 ideal, 1.0 = fully distinguishable):",
              {c: round(v, 3) for c, v in nna_own.items()})
        sep = [bool(mean_cd[i, i] == mean_cd[i].min()) for i in range(len(cats))]
        sep_mmd = [
            bool(mmd_cd[i, i] == mmd_cd[i].min()) for i in range(len(cats))
        ]
        print(f"guidance {guidance}: own-class mean-CD row-min "
              f"{sum(sep)}/{len(cats)}; MMD-CD row-min {sum(sep_mmd)}/{len(cats)}")
        rec = {
            "seed": seed,
            "guidance": guidance,
            "mean_cd": mean_cd.tolist(),
            "mmd_cd": mmd_cd.tolist(),
            "cov_own": cov_own,
            "one_nna_own": nna_own,
            "own_class_separates_mean": sep,
            "own_class_separates_mmd": sep_mmd,
        }
        if args.emd:
            sep_emd = [
                bool(mean_emd[i, i] == mean_emd[i].min())
                for i in range(len(cats))
            ]
            sep_mmd_emd = [
                bool(mmd_emd[i, i] == mmd_emd[i].min())
                for i in range(len(cats))
            ]
            print(f"guidance {guidance}: own-class mean-EMD row-min "
                  f"{sum(sep_emd)}/{len(cats)}; MMD-EMD row-min "
                  f"{sum(sep_mmd_emd)}/{len(cats)}")
            rec.update({
                "mean_emd": mean_emd.tolist(),
                "mmd_emd": mmd_emd.tolist(),
                "emd_points": args.emd_points,
                "own_class_separates_mean_emd": sep_emd,
                "own_class_separates_mmd_emd": sep_mmd_emd,
            })
        if mean_exact is not None:
            v_mean = scored_row_verdicts(mean_exact, cats)
            v_mmd = scored_row_verdicts(mmd_exact, cats)
            print(f"\nEXACT EMD verdicts (guidance {guidance}; scored "
                  f"blocks only): mean {v_mean}")
            print(f"EXACT EMD verdicts (guidance {guidance}): MMD {v_mmd}")
            # Margins for the confusable pairs: (cross - own) / own; > 0
            # means the generated class wins its own row.
            for pair in args.confusable:
                a, _, b = pair.partition(":")
                if a not in cats or b not in cats:
                    continue
                ia, ib = cats.index(a), cats.index(b)
                for m, nm in ((mean_exact, "mean"), (mmd_exact, "mmd")):
                    if not np.isnan(m[ia, ib]):
                        marg = (m[ia, ib] - m[ia, ia]) / m[ia, ia]
                        print(f"[exact-emd g={guidance}] {a}->{b} {nm} "
                              f"margin {marg * 100:+.2f}% (own "
                              f"{m[ia, ia]:.4f} vs cross {m[ia, ib]:.4f})")
            rec.update({
                "mean_emd_exact": matrix_to_jsonable(mean_exact),
                "mmd_emd_exact": matrix_to_jsonable(mmd_exact),
                "exact_emd_backend": args.exact_emd_backend,
                "own_class_separates_mean_emd_exact": v_mean,
                "own_class_separates_mmd_emd_exact": v_mmd,
            })
        results.append(rec)
        # Crash-safe partial: a full multi-seed eval holds the tunnel for
        # tens of minutes — persist after every (seed, guidance) record.
        if args.out:
            _write_out(args, cats, ref_sep, ref_sep_emd, ref_ceiling_exact,
                       probe_losses, results)

    if args.out:
        _write_out(args, cats, ref_sep, ref_sep_emd, ref_ceiling_exact,
                   probe_losses, results)
        print(f"\nwrote {args.out}")


def _write_out(args, cats, ref_sep, ref_sep_emd, ref_ceiling_exact,
               probe_losses, results):
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
                {
                    "checkpoint": args.checkpoint,
                    "categories": cats,
                    "num_per_class": args.num_per_class,
                    "num_steps": args.num_steps,
                    "sampler": args.sampler,
                    "ref_separability": ref_sep.tolist(),
                    "ref_separability_emd": (
                        ref_sep_emd.tolist() if ref_sep_emd is not None else None
                    ),
                    "ref_separability_emd_exact": (
                        matrix_to_jsonable(
                            np.where(
                                np.isinf(ref_ceiling_exact), np.nan,
                                ref_ceiling_exact,
                            )
                        ) if ref_ceiling_exact is not None else None
                    ),
                    "use_ema": args.use_ema,
                    "label_probe": probe_losses,
                    "per_guidance": results,
                },
                f, indent=1,
        )
    os.replace(tmp, args.out)


if __name__ == "__main__":
    main()
