"""Device-resident batched assignment solver (Bertsekas auction, ε-scaling).

The reference's exact EMD is a host-side Hungarian solve per cloud pair
(/root/reference/metrics.py:49-92, scipy.optimize.linear_sum_assignment) —
O(n³) serial CPU work that floors the whole eval pipeline (BASELINE.md:
16 pairs ≈ 18.5 s even with the native C++ solver, because this host has a
single core). This module replaces that floor with a TPU-native solver: the
forward auction algorithm (Bertsekas 1988) with ε-scaling, batched over
pairs, expressed as ONE `lax.while_loop` of fully-vectorized bidding
rounds.

Accuracy contract: an assignment produced under ε-complementary-slackness
has total cost within ``n * eps_final`` of the true optimum (Bertsekas,
"Auction algorithms for network flow problems", Prop. 1). With the default
``eps_final`` the certified bound is far below f32 cost noise;
``tests/test_auction.py`` pins totals against scipy's Hungarian and the
native C++ solver on cloud-shaped pairs.

Design notes (all on-device, static shapes):
  * Jacobi (all-at-once) bidding: every unassigned person bids each round;
    per object only the best bid wins.
  * Active-set gathering: each round at most ``active`` unassigned persons
    (static size) compute bids — late rounds have few unassigned persons,
    so the per-round cost is O(active·m), not O(n·m), with no dynamic
    shapes.
  * Per-element ε-scaling INSIDE the single while_loop: each batch element
    carries its own ε; when its assignment completes at ε > eps_final it
    resets its assignment (prices persist) and divides ε, independently of
    the other elements. A fully-finished element produces no bids, so the
    shared loop is a fixed point for it — no masking needed.
  * n < m problems reduce to square via zero-cost dummy rows (ε-scaling
    with persistent prices is only dual-feasible when every object can be
    assigned each phase).

Used by metrics.pairwise_exact_emd_matrix (exact-EMD confusion matrices on
chip) and the eval benchmarks.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG = jnp.float32(-3.4e38)  # finite sentinel: behaves like -inf in max-reductions
# without tripping TPU scatter edge cases on the experimental axon platform


@partial(
    jax.jit,
    static_argnames=(
        "eps_final", "eps_start", "active", "scale", "max_rounds",
    ),
)
def auction_assignment(
    cost: jnp.ndarray,
    eps_final: float = 1e-5,
    eps_start: Optional[float] = None,
    active: int = 128,
    scale: float = 8.0,
    max_rounds: int = 500_000,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched minimum-cost assignment via ε-scaling forward auction.

    cost: (B, n, m) float32 with n <= m (every row gets a distinct column).
    Returns (col4row (B, n) int32, total (B,) f32, rounds () int32).

    Certificate: each ``total`` is within ``n * eps_final`` of the optimal
    assignment cost for the given f32 costs.
    """
    cost = jnp.asarray(cost, jnp.float32)
    assert cost.ndim == 3, cost.shape
    B, n, m = cost.shape
    assert n <= m, f"auction needs n <= m, got {(n, m)}"
    n_real = n
    if n < m:
        # Zero-cost dummy rows absorb the surplus objects; the optimal total
        # over the real rows is unchanged.
        cost = jnp.concatenate(
            [cost, jnp.zeros((B, m - n, m), jnp.float32)], axis=1
        )
        n = m
    active = min(active, n)
    K = active

    a = -cost  # maximize benefits
    e0 = float(eps_start) if eps_start is not None else 3.5 / 4.0
    e0 = max(e0, eps_final)

    col4row0 = jnp.full((B, n), -1, jnp.int32)
    owner0 = jnp.full((B, m), -1, jnp.int32)
    prices0 = jnp.zeros((B, m), jnp.float32)
    eps0 = jnp.full((B,), e0, jnp.float32)

    b_idx = jnp.arange(B)[:, None]

    def cond(state):
        col4row, _, _, eps, rounds = state
        unfinished = jnp.any(col4row < 0, axis=1) | (eps > eps_final)
        return jnp.logical_and(jnp.any(unfinished), rounds < max_rounds)

    def body(state):
        col4row, owner, prices, eps, rounds = state

        # --- per-element ε phase advance: assignment complete at ε above
        # the target -> reset the assignment (prices persist), shrink ε.
        complete = jnp.all(col4row >= 0, axis=1)          # (B,)
        advance = complete & (eps > eps_final)
        eps = jnp.where(advance, jnp.maximum(eps / scale, eps_final), eps)
        col4row = jnp.where(advance[:, None], -1, col4row)
        owner = jnp.where(advance[:, None], -1, owner)

        # --- pick up to K unassigned persons per element.
        unassigned = col4row < 0                          # (B, n)
        score = jnp.where(unassigned, 1.0, 0.0) * (n - jnp.arange(n))
        _, idx = jax.lax.top_k(score, K)                  # (B, K)
        is_real = jnp.take_along_axis(unassigned, idx, axis=1)

        # --- bids over the gathered rows, (B, K, m).
        a_rows = jnp.take_along_axis(a, idx[:, :, None], axis=1)
        v = a_rows - prices[:, None, :]
        best_j = jnp.argmax(v, axis=2)                    # (B, K)
        w1 = jnp.take_along_axis(v, best_j[:, :, None], axis=2)[..., 0]
        v2 = v.at[b_idx, jnp.arange(K)[None, :], best_j].set(_NEG)
        w2 = jnp.max(v2, axis=2)
        w2 = jnp.where(w2 > _NEG / 2, w2, w1 - 1.0)       # m == 1 corner
        bid = (
            jnp.take_along_axis(prices, best_j, axis=1)
            + (w1 - w2) + eps[:, None]
        )
        bid = jnp.where(is_real, bid, _NEG)

        # --- resolve: per object, the highest bid wins; winner slot found
        # with a second scatter-max (no (B, K, m) intermediate).
        new_price = prices.at[b_idx, best_j].max(bid)
        got_bid = new_price > prices                      # (B, m)
        at_price = (
            bid == jnp.take_along_axis(new_price, best_j, axis=1)
        ) & is_real
        slot_won = jnp.full((B, m), -1, jnp.int32).at[b_idx, best_j].max(
            jnp.where(at_price, jnp.arange(K, dtype=jnp.int32)[None, :], -1)
        )
        winner = jnp.where(
            (slot_won >= 0) & got_bid,
            jnp.take_along_axis(idx, jnp.maximum(slot_won, 0), axis=1),
            -1,
        )                                                 # (B, m)

        # --- reassign: evict previous owners of re-bid objects, set winners.
        evicted = jnp.where(winner >= 0, owner, -1)       # (B, m)
        clear = jnp.zeros((B, n), bool).at[
            b_idx, jnp.maximum(evicted, 0)
        ].max(evicted >= 0)
        col4row = jnp.where(clear, -1, col4row)
        col4row = col4row.at[b_idx, jnp.maximum(winner, 0)].max(
            jnp.where(winner >= 0, jnp.arange(m, dtype=jnp.int32)[None, :], -1)
        )
        owner = jnp.where(winner >= 0, winner, owner)
        return col4row, owner, new_price, eps, rounds + 1

    col4row, _, _, _, rounds = jax.lax.while_loop(
        cond, body, (col4row0, owner0, prices0, eps0, jnp.int32(0))
    )

    col4row = col4row[:, :n_real]
    total = jnp.sum(
        jnp.take_along_axis(
            cost[:, :n_real], col4row[:, :, None], axis=2
        )[..., 0],
        axis=1,
    )
    return col4row, total, rounds


def auction_emd_pairs(
    x: jnp.ndarray,
    y: jnp.ndarray,
    eps_final: float = 1e-5,
    active: int = 128,
) -> jnp.ndarray:
    """Exact(±n·ε) EMD per cloud pair, fully on device.

    x: (B, n, 3), y: (B, m, 3), n <= m; clouds are expected already
    cube-normalized (the caller applies metrics.normalize_to_cube, same as
    the host Hungarian path). Returns (B,) EMD = total / max(n, m) —
    reference metrics.py:49-92 semantics.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    d2 = (
        jnp.sum(x * x, axis=2)[:, :, None]
        + jnp.sum(y * y, axis=2)[:, None, :]
        - 2.0 * jnp.einsum("bnd,bmd->bnm", x, y)
    )
    cost = jnp.sqrt(jnp.maximum(d2, 0.0))
    _, total, _ = auction_assignment(
        cost, eps_final=eps_final, active=active
    )
    return total / max(x.shape[1], y.shape[1])
