"""Evaluation metrics: Chamfer, EMD (exact host Hungarian + device Sinkhorn),
voxel-BCE, focal loss, plus new coverage/MMD/1-NNA extensions.

Parity targets (reference file:line):
  * normalize_to_cube:       metrics.py:7-21   (in ops.geometry; reused here).
  * chamfer_distance:        metrics.py:23-47  — cube-normalize both clouds,
                             full pairwise *Euclidean* (not squared) dists,
                             min both ways, mean of each, x1e3 scaling.
  * earth_mover_distance_cpu metrics.py:49-92  — exact EMD via scipy's
                             Hungarian solver, O(n^3) host-side; sum of
                             assigned dists / max(n, m), batch mean.
  * earth_mover_distance_gpu metrics.py:94-158 — entropic Sinkhorn
                             (eps=1e-2, <=100 iters, logsumexp updates,
                             convergence 1e-5, cost normalized by its
                             *global* max) — here a lax.while_loop, fully
                             device-resident.
  * compute_metrics:         metrics.py:160-183 — (CD, EMD, voxel-BCE).
  * voxel_focal_loss:        metrics.py:185-212.

Extensions beyond the reference (BASELINE.md names coverage as a target):
coverage (COV-CD), minimum matching distance (MMD-CD) and 1-NNA over a
generated-vs-reference set, computed from one batched pairwise Chamfer
matrix.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shapegen_tpu.ops.geometry import (
    normalize_to_cube,
    square_distance,
    voxelize,
)


def _as_batched(x: jnp.ndarray) -> jnp.ndarray:
    return x[None] if x.ndim == 2 else x


_PALLAS_OVERRIDE: Optional[bool] = None  # test hook: force on/off


def pallas_available() -> bool:
    """True when the streaming Pallas chamfer kernel should drive the CD
    (TPU backend) — eval and training alike: the kernel carries a custom
    VJP (ops.pallas_kernels.min_dists_vjp), so differentiated call sites
    (VAE reconstruction losses) use it too. The XLA formulation stays the
    fallback everywhere else."""
    if _PALLAS_OVERRIDE is not None:
        return _PALLAS_OVERRIDE
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _nn_exact_dists(
    x: jnp.ndarray, y: jnp.ndarray, d2: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact nearest-neighbor distances both ways given approx squared dists.

    The matmul-form distance matrix suffers catastrophic cancellation for
    near-coincident points (error ~1e-6 absolute on squared values), which the
    x1e3 CD scaling would amplify. We use the fast matrix only to *select*
    each nearest neighbor, then recompute that one pair's distance exactly.
    """
    idx_xy = jnp.argmin(d2, axis=2)  # (B, N)
    idx_yx = jnp.argmin(d2, axis=1)  # (B, M)
    y_match = jnp.take_along_axis(y, idx_xy[..., None], axis=1)
    x_match = jnp.take_along_axis(x, idx_yx[..., None], axis=1)
    min_xy = jnp.linalg.norm(x - y_match, axis=-1)
    min_yx = jnp.linalg.norm(y - x_match, axis=-1)
    return min_xy, min_yx


def chamfer_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    scaling_factor: float = 1e3,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Chamfer distance with the reference's x1e3 scaling (metrics.py:23-47).

    Handles N != M (the reference's unit test deliberately uses unequal point
    counts, units.py:7-10). On TPU this routes through the streaming Pallas
    kernel (ops.pallas_kernels) — same semantics, never materializes the
    (N, M) matrix in HBM — and is differentiable there too (the kernel has
    a custom VJP that scatters gradients to the matched pairs).
    """
    if use_pallas is None:
        use_pallas = pallas_available()
    if use_pallas:
        from shapegen_tpu.ops.pallas_kernels import chamfer_distance_pallas

        return chamfer_distance_pallas(x, y, scaling_factor)
    x = _as_batched(x)
    y = _as_batched(y)
    x = normalize_to_cube(x)
    y = normalize_to_cube(y)
    d2 = square_distance(x, y)
    min_xy, min_yx = _nn_exact_dists(x, y, d2)
    cd = jnp.mean(min_xy) + jnp.mean(min_yx)
    return cd * scaling_factor


def chamfer_distance_masked(
    x: jnp.ndarray,
    x_mask: jnp.ndarray,
    y: jnp.ndarray,
    y_mask: jnp.ndarray,
    scaling_factor: float = 1e3,
) -> jnp.ndarray:
    """Chamfer over padded clouds: invalid rows excluded from mins and means.

    Needed for voxel-derived clouds, whose sizes are ragged in the reference
    (utils.py:511-538) and padded here. Clouds are cube-normalized over valid
    points only.
    """
    x = _as_batched(x)
    y = _as_batched(y)
    if x_mask.ndim == 1:
        x_mask = x_mask[None]
    if y_mask.ndim == 1:
        y_mask = y_mask[None]

    def _masked_cube(p, m):
        big = jnp.where(m[..., None], p, -jnp.inf)
        small = jnp.where(m[..., None], p, jnp.inf)
        center = (jnp.max(big, axis=-2, keepdims=True) + jnp.min(small, axis=-2, keepdims=True)) / 2.0
        centered = (p - center) * m[..., None]
        scale = jnp.max(jnp.abs(centered), axis=(-2, -1), keepdims=True)
        return centered / jnp.maximum(scale, 1e-12)

    x = _masked_cube(x, x_mask)
    y = _masked_cube(y, y_mask)
    d2 = square_distance(x, y)
    inf = jnp.float32(jnp.inf)
    d2_xy = jnp.where(y_mask[:, None, :], d2, inf)
    d2_yx = jnp.where(x_mask[:, :, None], d2, inf)
    idx_xy = jnp.argmin(d2_xy, axis=2)
    idx_yx = jnp.argmin(d2_yx, axis=1)
    y_match = jnp.take_along_axis(y, idx_xy[..., None], axis=1)
    x_match = jnp.take_along_axis(x, idx_yx[..., None], axis=1)
    min_xy = jnp.linalg.norm(x - y_match, axis=-1)  # (B, N)
    min_yx = jnp.linalg.norm(y - x_match, axis=-1)  # (B, M)
    xm = x_mask.astype(jnp.float32)
    ym = y_mask.astype(jnp.float32)
    mean_xy = jnp.sum(jnp.where(x_mask, min_xy, 0.0)) / jnp.maximum(jnp.sum(xm), 1.0)
    mean_yx = jnp.sum(jnp.where(y_mask, min_yx, 0.0)) / jnp.maximum(jnp.sum(ym), 1.0)
    return (mean_xy + mean_yx) * scaling_factor


def _per_pair_chamfer(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-pair CD (clouds assumed pre-normalized), (B,) output."""
    d2 = square_distance(x, y)
    min_xy, min_yx = _nn_exact_dists(x, y, d2)
    return jnp.mean(min_xy, axis=1) + jnp.mean(min_yx, axis=1)


def pairwise_chamfer_matrix(
    gen: jnp.ndarray,
    ref: jnp.ndarray,
    block: int = 8,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """All-pairs CD matrix between two cloud sets, (G, R).

    Drives the coverage/MMD/1-NNA extensions. Blocked over the gen axis to
    bound the distance intermediate; on TPU the inner min-distance pass is
    the streaming Pallas kernel (O(N+M) HBM per pair instead of O(N*M)).
    """
    if use_pallas is None:
        use_pallas = pallas_available()
    gen = normalize_to_cube(gen)
    ref = normalize_to_cube(ref)
    G, R = gen.shape[0], ref.shape[0]

    if use_pallas:
        from shapegen_tpu.ops.pallas_kernels import min_dists_pallas

        n_blocks = -(-G // block)
        pad = n_blocks * block - G
        gen_p = (
            jnp.concatenate([gen, jnp.zeros((pad,) + gen.shape[1:], gen.dtype)])
            if pad else gen
        )
        gen_blocks = gen_p.reshape(n_blocks, block, *gen.shape[1:])

        def body(_, gblk):
            x_all = jnp.broadcast_to(
                gblk[:, None], (block, R) + gblk.shape[1:]
            ).reshape(block * R, *gblk.shape[1:])
            y_all = jnp.broadcast_to(
                ref[None], (block,) + ref.shape
            ).reshape(block * R, *ref.shape[1:])
            d_xy, d_yx = min_dists_pallas(x_all, y_all)
            cd = jnp.mean(jnp.sqrt(d_xy), axis=1) + jnp.mean(jnp.sqrt(d_yx), axis=1)
            return None, cd.reshape(block, R)

        _, rows = jax.lax.scan(body, None, gen_blocks)
        return rows.reshape(n_blocks * block, R)[:G]

    def one_gen(g):
        # g: (N, 3) vs all refs (R, M, 3)
        return _per_pair_chamfer(jnp.broadcast_to(g[None], (R,) + g.shape), ref)

    return jax.lax.map(one_gen, gen, batch_size=block)


def _sinkhorn_ot_pairs(
    x: jnp.ndarray,
    y: jnp.ndarray,
    epsilon: float = 1e-2,
    max_iter: int = 200,
) -> jnp.ndarray:
    """Per-pair entropic OT cost via textbook log-domain Sinkhorn, (B,).

    Unlike the reference-parity ``sinkhorn_emd`` (whose duals are scaled
    inconsistently and whose early-exit criterion fires before the plan is
    a coupling — preserved there as a quirk, metrics.py:94-158), this
    iterates the standard updates
        f = eps*log(mu) - eps*LSE((g - C)/eps, axis=j)
        g = eps*log(nu) - eps*LSE((f - C)/eps, axis=i)
    to an actual doubly-stochastic plan (row/col marginal error ~1e-4 at
    eps=1e-2, 200 iters) and returns sum(P*C). Costs are normalized by the
    CONSTANT cube diagonal 2*sqrt(3) (both clouds are cube-normalized, so
    no pairwise distance can exceed it): every entry is the same fixed
    rescale of the raw transport cost, so values are directly comparable
    across pairs/classes — a per-pair max would rescale each entry by its
    own geometry-dependent factor and could invert confusion-matrix
    row-min comparisons.
    """
    x = normalize_to_cube(_as_batched(x))
    y = normalize_to_cube(_as_batched(y))
    B, n, _ = x.shape
    m = y.shape[1]
    C = jnp.sqrt(square_distance(x, y) + 1e-12)
    C = C / (2.0 * jnp.sqrt(3.0))

    log_mu = jnp.log(jnp.full((B, n, 1), 1.0 / n))
    log_nu = jnp.log(jnp.full((B, 1, m), 1.0 / m))

    def body(_, fg):
        f, g = fg
        f = epsilon * log_mu - epsilon * jax.scipy.special.logsumexp(
            (g - C) / epsilon, axis=2, keepdims=True
        )
        g = epsilon * log_nu - epsilon * jax.scipy.special.logsumexp(
            (f - C) / epsilon, axis=1, keepdims=True
        )
        return f, g

    f, g = jax.lax.fori_loop(
        0, max_iter, body,
        (jnp.zeros((B, n, 1)), jnp.zeros((B, 1, m))),
    )
    P = jnp.exp((f + g - C) / epsilon)
    return jnp.sum(P * C, axis=(1, 2))


def pairwise_emd_matrix(
    gen: jnp.ndarray,
    ref: jnp.ndarray,
    block: int = 1,
    epsilon: float = 1e-2,
    max_iter: int = 200,
) -> jnp.ndarray:
    """All-pairs Sinkhorn-EMD matrix between two cloud sets, (G, R).

    Device-resident second statistic for the conditional confusion
    matrices (the CD has a known failure mode there: a diffuse rod
    CD-matches rod+head better than the clean rod; EMD's mass-balanced
    transport does not). Blocked over the gen axis: each row materializes
    an (R, N, M) cost tensor, so keep block * R * N * M bounded
    (subsample points for large sets).
    """
    R = ref.shape[0]

    def one_gen(g):
        return _sinkhorn_ot_pairs(
            jnp.broadcast_to(g[None], (R,) + g.shape), ref,
            epsilon=epsilon, max_iter=max_iter,
        )

    return jax.lax.map(one_gen, gen, batch_size=block)


def _hungarian_emd_pair(x_pc: np.ndarray, y_pc: np.ndarray) -> float:
    """One exact-EMD pair: sum of optimally-assigned Euclidean distances /
    max(n, m) (metrics.py:49-92 inner loop). Prefers the native C++ solver
    (fused direct-form cost build + f32 shortest-augmenting-path assignment,
    native/shapegen_native.cpp — several times faster than the
    numpy-cost + scipy path and exact for the same f32 costs); falls back
    to scipy when no native library/toolchain is available."""
    from shapegen_tpu import native

    emd = native.emd_pair(x_pc, y_pc)
    if emd is not None:
        return emd
    from scipy.optimize import linear_sum_assignment

    distances = np.linalg.norm(x_pc[:, None] - y_pc[None, :], axis=-1)
    row_ind, col_ind = linear_sum_assignment(distances)
    return distances[row_ind, col_ind].sum() / max(x_pc.shape[0], y_pc.shape[0])


def earth_mover_distance_hungarian(
    x, y, scaling_factor: float = 1.0
) -> float:
    """Exact EMD via the Hungarian algorithm — host-side oracle
    (metrics.py:49-92). x, y: (B, N, 3)/(B, M, 3) or unbatched arrays."""
    x = np.asarray(jax.device_get(_as_batched(jnp.asarray(x, jnp.float32))))
    y = np.asarray(jax.device_get(_as_batched(jnp.asarray(y, jnp.float32))))
    assert x.shape[0] == y.shape[0], "Batch sizes must be the same"
    assert x.shape[2] == y.shape[2], "Point clouds must have the same dimensionality"

    x = np.asarray(jax.device_get(normalize_to_cube(jnp.asarray(x))))
    y = np.asarray(jax.device_get(normalize_to_cube(jnp.asarray(y))))

    emds = [_hungarian_emd_pair(x_pc, y_pc) for x_pc, y_pc in zip(x, y)]
    return float(np.mean(emds) * scaling_factor)


def sinkhorn_emd(
    x: jnp.ndarray,
    y: jnp.ndarray,
    epsilon: float = 1e-2,
    thresh: float = 1e-5,
    max_iter: int = 100,
    scaling_factor: float = 1.0,
) -> jnp.ndarray:
    """Entropic-regularized EMD, device-resident (metrics.py:94-158).

    The early-exit Python break becomes a lax.while_loop condition, so
    convergence still short-circuits on device without host syncs.
    """
    return (
        jnp.mean(_sinkhorn_emd_pairs(x, y, epsilon, thresh, max_iter))
        * scaling_factor
    )


def _sinkhorn_emd_pairs(
    x: jnp.ndarray,
    y: jnp.ndarray,
    epsilon: float = 1e-2,
    thresh: float = 1e-5,
    max_iter: int = 100,
    cost_norm: str = "global",
) -> jnp.ndarray:
    """Per-pair Sinkhorn EMD, (B,) output.

    ``cost_norm='global'`` divides the cost by the max over the whole batch
    (metrics.py:123 — what the reference computes for whatever batch it is
    handed); ``'per_pair'`` uses each pair's own max, which is what a
    sequential pair-by-pair eval loop effectively does and what the batched
    eval path must use to reproduce it.
    """
    x = _as_batched(x)
    y = _as_batched(y)
    x = normalize_to_cube(x)
    y = normalize_to_cube(y)
    B, n, _ = x.shape
    m = y.shape[1]

    C = jnp.sqrt(square_distance(x, y) + 1e-12)
    if cost_norm == "per_pair":
        C = C / jnp.max(C, axis=(1, 2), keepdims=True)
    else:
        C = C / jnp.max(C)  # global max, as in metrics.py:123
    lam = 1.0 / epsilon

    log_mu = jnp.log(jnp.full((B, n, 1), 1.0 / n) + 1e-10)
    log_nu = jnp.log(jnp.full((B, m, 1), 1.0 / m) + 1e-10)

    def cond(state):
        i, _, _, err_a, err_b = state
        return jnp.logical_and(
            i < max_iter, jnp.logical_or(err_a >= thresh, err_b >= thresh)
        )

    def body(state):
        i, alpha, beta, _, _ = state
        new_alpha = epsilon * (
            log_mu
            - jax.scipy.special.logsumexp(
                -lam * C + jnp.swapaxes(beta, 1, 2), axis=2, keepdims=True
            )
        )
        new_beta = epsilon * (
            log_nu
            - jax.scipy.special.logsumexp(
                -lam * jnp.swapaxes(C, 1, 2) + jnp.swapaxes(new_alpha, 1, 2),
                axis=2,
                keepdims=True,
            )
        )
        err_a = jnp.max(jnp.abs(new_alpha - alpha))
        err_b = jnp.max(jnp.abs(new_beta - beta))
        return i + 1, new_alpha, new_beta, err_a, err_b

    alpha0 = jnp.zeros((B, n, 1))
    beta0 = jnp.zeros((B, m, 1))
    _, alpha, beta, _, _ = jax.lax.while_loop(
        cond, body, (0, alpha0, beta0, jnp.inf, jnp.inf)
    )

    P = jnp.exp(-lam * C + alpha + jnp.swapaxes(beta, 1, 2))
    return jnp.sum(P * C, axis=(1, 2))


def pairwise_exact_emd_matrix(
    gen: np.ndarray,
    ref: np.ndarray,
    backend: str = "auto",
    block: int = 32,
    eps_final: float = 1e-5,
    progress: bool = False,
) -> np.ndarray:
    """All-pairs EXACT EMD matrix between two cloud sets, (G, R).

    The canonical statistic for the conditional confusion matrices: the
    reference's exact Hungarian EMD (metrics.py:49-92) at full point count —
    no Sinkhorn regularization, no point subsampling. Two backends:

      * ``'device'`` — the batched ε-scaling auction solver on TPU
        (ops/auction.py), certified within N * eps_final of the true optimum
        per pair (≪ 0.1% of typical EMD values);
      * ``'host'`` — the native C++ / scipy Hungarian per pair (exact,
        single-threaded floor on this host);
      * ``'auto'`` — device when a non-CPU backend is live, else host.

    Both cube-normalize per cloud first, like every EMD path here.
    """
    gen = np.asarray(gen, np.float32)
    ref = np.asarray(ref, np.float32)
    G, R = gen.shape[0], ref.shape[0]
    if backend == "auto":
        # The batched auction wins at small point counts, but at the
        # flagship N=2048 its (block, N, N) cost tensor + bidding-round
        # count overwhelm the accelerator (measured round 5: the remote
        # TPU worker crashed on the first 32-pair batch), while the
        # threaded native Hungarian solves ~all-cores pairs/s on the host.
        # Auto therefore only picks the device for small problems.
        n_pts = max(gen.shape[1], ref.shape[1])
        backend = (
            "device"
            if jax.default_backend() not in ("cpu",) and n_pts <= 512
            else "host"
        )

    def cube_np(p):
        c = (p.max(axis=-2, keepdims=True) + p.min(axis=-2, keepdims=True)) / 2.0
        p = p - c
        return p / np.abs(p).max(axis=(-2, -1), keepdims=True)

    gen = cube_np(gen)
    ref = cube_np(ref)

    out = np.empty((G, R), np.float64)
    if backend == "host":
        # Fan the independent pair solves over every host core: the native
        # ctypes call and scipy's linear_sum_assignment both release the
        # GIL, so the O(n^3) per-pair floor divides by the core count
        # (measured saturation: benchmarks/bench_emd.py --threads).
        import os as _os
        from concurrent.futures import ThreadPoolExecutor

        workers = max(1, min(_os.cpu_count() or 1, R))
        with ThreadPoolExecutor(workers) as ex:
            for i in range(G):
                out[i] = np.fromiter(
                    ex.map(
                        lambda y, x=gen[i]: _hungarian_emd_pair(x, y), ref
                    ),
                    np.float64,
                    count=R,
                )
                if progress:
                    print(
                        f"[exact-emd host] row {i + 1}/{G} "
                        f"({workers} threads)", flush=True,
                    )
        return out

    from shapegen_tpu.ops.auction import auction_emd_pairs

    pairs_i, pairs_j = np.meshgrid(
        np.arange(G), np.arange(R), indexing="ij"
    )
    pairs_i, pairs_j = pairs_i.ravel(), pairs_j.ravel()
    vals = np.empty(G * R, np.float64)
    for s in range(0, G * R, block):
        sl = slice(s, min(s + block, G * R))
        x = gen[pairs_i[sl]]
        y = ref[pairs_j[sl]]
        k = x.shape[0]
        if k < block:  # pad the tail block: one compiled shape only
            x = np.concatenate([x, np.repeat(x[-1:], block - k, 0)])
            y = np.concatenate([y, np.repeat(y[-1:], block - k, 0)])
        vals[sl] = np.asarray(
            jax.device_get(auction_emd_pairs(x, y, eps_final=eps_final))
        )[:k]
        if progress:
            print(
                f"[exact-emd device] {sl.stop}/{G * R} pairs", flush=True
            )
    out[pairs_i, pairs_j] = vals
    return out


def voxel_bce_recon_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """BCE between the voxelizations of two clouds (metrics.py:181)."""
    from shapegen_tpu.models.vae3d import binary_cross_entropy

    return binary_cross_entropy(voxelize(_as_batched(x)), voxelize(_as_batched(y)))


def compute_metrics(
    generated: jnp.ndarray,
    reference: jnp.ndarray,
    use_approximate_gpu_emd: bool = False,
) -> Tuple[jnp.ndarray, float, jnp.ndarray]:
    """(CD, EMD, voxel-BCE recon loss) — metrics.py:160-183.

    Default EMD is the exact host Hungarian solver, like the reference; pass
    use_approximate_gpu_emd=True for the device Sinkhorn approximation.
    """
    avg_cd = chamfer_distance(generated, reference)
    if use_approximate_gpu_emd:
        avg_emd = sinkhorn_emd(generated, reference)
    else:
        avg_emd = earth_mover_distance_hungarian(generated, reference)
    recon_loss = voxel_bce_recon_loss(generated, reference)
    return avg_cd, avg_emd, recon_loss


def _per_pair_chamfer_scaled(gen, ref, use_pallas, scaling_factor=1e3):
    """Per-pair CD (x1e3) on unnormalized inputs, (B,) output."""
    gen = normalize_to_cube(gen)
    ref = normalize_to_cube(ref)
    if use_pallas:
        from shapegen_tpu.ops.pallas_kernels import min_dists_pallas

        d_xy, d_yx = min_dists_pallas(gen, ref)
        cd = jnp.mean(jnp.sqrt(d_xy), axis=1) + jnp.mean(jnp.sqrt(d_yx), axis=1)
        return cd * scaling_factor
    return _per_pair_chamfer(gen, ref) * scaling_factor


def _per_pair_voxel_bce(gen, ref):
    from shapegen_tpu.models.vae3d import binary_cross_entropy

    bce = binary_cross_entropy(voxelize(gen), voxelize(ref), reduction="none")
    return jnp.mean(bce, axis=tuple(range(1, bce.ndim)))


@partial(jax.jit, static_argnames=("use_sinkhorn", "use_pallas"))
def _pair_metrics_device(gen, ref, use_sinkhorn: bool, use_pallas: bool):
    out = {
        "cd": _per_pair_chamfer_scaled(gen, ref, use_pallas),
        "recon": _per_pair_voxel_bce(gen, ref),
    }
    if use_sinkhorn:
        out["emd"] = _sinkhorn_emd_pairs(gen, ref, cost_norm="per_pair")
    return out


def _hungarian_pairs_host(
    x: np.ndarray, y: np.ndarray, workers: Optional[int] = None
) -> np.ndarray:
    """Exact per-pair Hungarian EMD, pure host (native C++ solver or
    numpy+scipy — deliberately no device dispatch, so it can run WHILE a
    device program computes).

    Pairs are independent and both solvers release the GIL (ctypes foreign
    calls do; so does scipy's linear_sum_assignment), so they additionally
    fan out over `workers` threads (default: cpu_count, capped at the pair
    count) — on a multi-core eval host the O(n^3) assignment floor divides
    by the core count."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    def cube(p):
        center = (p.max(axis=-2, keepdims=True) + p.min(axis=-2, keepdims=True)) / 2.0
        p = p - center
        return p / np.abs(p).max(axis=(-2, -1), keepdims=True)

    x = cube(np.asarray(x, np.float32))
    y = cube(np.asarray(y, np.float32))

    def one_pair(pair):
        return _hungarian_emd_pair(*pair)

    pairs = list(zip(x, y))
    n_workers = min(workers or os.cpu_count() or 1, len(pairs))
    if n_workers <= 1:
        return np.asarray([one_pair(p) for p in pairs])
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        return np.asarray(list(pool.map(one_pair, pairs)))


def compute_metrics_batched(
    generated: jnp.ndarray,
    reference: jnp.ndarray,
    use_approximate_gpu_emd: bool = False,
    use_pallas: Optional[bool] = None,
    exact_emd_backend: str = "host",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All-pairs eval metrics with device/host overlap (SURVEY hard part #4).

    ONE jitted program computes per-pair CD + voxel-BCE (+ Sinkhorn EMD when
    requested) for the whole batch and is dispatched asynchronously; the
    exact EMD (the expensive part) then runs either pair-by-pair on the host
    WHILE the device work completes (``exact_emd_backend='host'`` — native
    C++/scipy Hungarian), or batched ON DEVICE via the ε-scaling auction
    solver (``'device'``, ops/auction.py — certified within n·ε of the
    Hungarian optimum). Per-pair values match a sequential
    ``compute_metrics`` loop
    (/root/reference/test_point_ddpm.py:85-97, metrics.py:160-183).

    Returns (cds, emds, recon_losses), each a (B,) numpy array.
    """
    gen = _as_batched(jnp.asarray(generated, jnp.float32))
    ref = _as_batched(jnp.asarray(reference, jnp.float32))
    if use_pallas is None:
        use_pallas = pallas_available()
    out = _pair_metrics_device(gen, ref, bool(use_approximate_gpu_emd), bool(use_pallas))
    if use_approximate_gpu_emd:
        emds = np.asarray(jax.device_get(out["emd"]))
    elif exact_emd_backend == "device":
        from shapegen_tpu.ops.auction import auction_emd_pairs

        emds = np.asarray(jax.device_get(
            auction_emd_pairs(normalize_to_cube(gen), normalize_to_cube(ref))
        ))
    else:
        # Inputs are already materialized, so fetching them does not wait on
        # the batched program dispatched above — the Hungarian loop below
        # overlaps with it.
        emds = _hungarian_pairs_host(
            np.asarray(jax.device_get(gen)), np.asarray(jax.device_get(ref))
        )
    cds = np.asarray(jax.device_get(out["cd"]))
    recons = np.asarray(jax.device_get(out["recon"]))
    return cds, emds, recons


def voxel_focal_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> jnp.ndarray:
    """Alpha/gamma focal BCE on voxel occupancy (metrics.py:185-212)."""
    pred = jnp.clip(pred, 1e-7, 1.0 - 1e-7)
    bce = -target * jnp.log(pred) - (1.0 - target) * jnp.log(1.0 - pred)
    pt = jnp.where(target == 1, pred, 1.0 - pred)
    focal = (1.0 - pt) ** focal_gamma * bce
    alpha_factor = jnp.where(target == 1, focal_alpha, 1.0 - focal_alpha)
    return jnp.mean(alpha_factor * focal)


def coverage_and_mmd(
    gen: jnp.ndarray, ref: jnp.ndarray, block: int = 8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """COV-CD and MMD-CD over generated vs reference sets (extension).

    COV: fraction of reference clouds that are the nearest neighbor of at
    least one generated cloud. MMD: mean over reference clouds of the minimum
    CD to any generated cloud.
    """
    d = pairwise_chamfer_matrix(gen, ref, block)  # (G, R)
    nearest_ref = jnp.argmin(d, axis=1)  # (G,)
    covered = jnp.zeros((ref.shape[0],), bool).at[nearest_ref].set(True)
    cov = jnp.mean(covered.astype(jnp.float32))
    mmd = jnp.mean(jnp.min(d, axis=0))
    return cov, mmd


def one_nna(gen: jnp.ndarray, ref: jnp.ndarray, block: int = 8) -> jnp.ndarray:
    """1-NN accuracy two-sample test (extension). 0.5 is ideal."""
    all_clouds = jnp.concatenate([gen, ref], axis=0)
    labels = jnp.concatenate(
        [jnp.ones((gen.shape[0],), bool), jnp.zeros((ref.shape[0],), bool)]
    )
    d = pairwise_chamfer_matrix(all_clouds, all_clouds, block)
    d = jnp.where(jnp.eye(d.shape[0], dtype=bool), jnp.inf, d)  # exclude self
    nn = jnp.argmin(d, axis=1)
    pred = labels[nn]
    return jnp.mean((pred == labels).astype(jnp.float32))
