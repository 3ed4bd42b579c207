"""Batched graph traversal: BEST_FIRST (and legacy BEAM) frontier expansion.

TPU re-design of the reference's priority-queue expansion
(fdb/FdbVectorIndex.java:911-968 BEST_FIRST, :841-903 BEAM): the per-query
priority queue becomes a fixed-size, distance-sorted candidate pool kept as
dense arrays; each iteration

  1. selects the best `beam` unexpanded candidates (masked top_k),
  2. gathers their adjacency rows,
  3. reads the neighbors' ADC distances from the precomputed full-scan matrix
     (the seed scan already scored every row; a per-row gather from
     approx[Q, N] is ~16x cheaper than re-running per-candidate LUT lookups),
  4. dedups them (within the step by sorting, against the pool by comparison),
  5. merges them into the pool with one top_k.

**No visited bitmask.** The reference keeps a per-query visited set; a [Q, N]
mask on TPU costs a scatter + gather per step (XLA lowers 2D-index scatters to
near-serial updates — measured ~2 ms per step even at Q=256, N=512). Instead
we exploit a pool invariant: the pool's contents improve monotonically, so a
node evicted from the pool was worse than everything in it and can never
re-enter or be re-expanded. Pool-membership dedup therefore preserves the
search semantics exactly; a revisited-but-evicted node merely costs one
redundant ADC lookup. Every irregular memory op is gone and the loop cost is
independent of N.

The `expanded` flags are marked with a broadcast-compare mask (never scatter)
and travel through the merge with gathers.

Everything runs under `jax.lax.while_loop` with static buffer shapes, batched
over Q queries at once — the throughput lever the reference's one-query async
chains can't express.

The legacy BEAM mode maps onto the same kernel: `refine_frontier=False`
restricts expansion to candidates discovered in the previous step, and
`min_steps` implements the reference's minHops floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.float32(jnp.inf)
_BIG = jnp.int32(2**30)


def _dedup_within_step(ids: jax.Array, new: jax.Array) -> jax.Array:
    """Keeps only the first occurrence of each id among `new` entries per row.

    ids i32[Q, C], new bool[Q, C] -> bool[Q, C]. Two frontier nodes expanded in
    the same step may share a neighbor; a sort + neighbor-compare marks unique
    entries without any scatter (the inverse permutation is applied by a
    second sort over the original positions).
    """
    q, c = ids.shape
    keyed = jnp.where(new, ids, _BIG)
    order = jnp.argsort(keyed, axis=1)
    sorted_ids = jnp.take_along_axis(keyed, order, axis=1)
    first = jnp.concatenate(
        [
            jnp.ones_like(sorted_ids[:, :1], dtype=bool),
            sorted_ids[:, 1:] != sorted_ids[:, :-1],
        ],
        axis=1,
    ) & (sorted_ids < _BIG)
    # un-permute `first` back to original positions: sort (order, first) by order
    inv = jnp.argsort(order, axis=1)
    out = jnp.take_along_axis(first, inv, axis=1)
    return out & new


@functools.partial(
    jax.jit,
    static_argnames=("ef_buf", "beam_buf", "max_steps", "min_steps", "refine_frontier"),
)
def graph_expand(
    approx: jax.Array,  # f32[Q, N] full ADC scan (inf at invalid rows)
    adjacency: jax.Array,  # i32[N, R] (-1 padded)
    row_valid: jax.Array,  # bool[N] rows that exist (tombstones included)
    seed_idx: jax.Array,  # i32[Q, S] (-1 padded)
    seed_dist: jax.Array,  # f32[Q, S] ADC dists of seeds (inf padded)
    ef_dyn: jax.Array,  # i32 scalar or [Q]: effective ef per query row
    beam_dyn: jax.Array,  # i32 scalar or [Q]: effective beam width per row
    adj_row_offset: jax.Array | None = None,  # i32[Q]: offset added to node
    #   ids when gathering adjacency — lets stacked (query, segment) rows
    #   share one flattened [S*N, R] adjacency while keeping local ids
    *,
    ef_buf: int,  # static candidate-pool size >= ef_dyn
    beam_buf: int,  # static max frontier width >= beam_dyn
    max_steps: int,
    min_steps: int = 0,
    refine_frontier: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Expands the graph frontier; returns (cand_idx i32[Q, ef_buf],
    cand_dist f32[Q, ef_buf]) sorted ascending by approximate distance."""
    q, s = seed_idx.shape
    n_adj, r = adjacency.shape
    n = approx.shape[1]
    c = beam_buf * r  # neighbors gathered per step
    ef_vec = jnp.broadcast_to(jnp.asarray(ef_dyn, jnp.int32), (q,))
    beam_vec = jnp.broadcast_to(jnp.asarray(beam_dyn, jnp.int32), (q,))

    # ---- init candidate pool from seeds (dedup among seeds first) ----
    seed_ok = _dedup_within_step(seed_idx, seed_idx >= 0)
    seed_d = jnp.where(seed_ok, seed_dist, INF)
    seed_i = jnp.where(seed_ok, seed_idx, -1)
    pool = min(s, ef_buf)
    if s > ef_buf:  # keep the best seeds if oversupplied
        neg, keep = jax.lax.top_k(-seed_d, ef_buf)
        seed_d = -neg
        seed_i = jnp.take_along_axis(seed_i, keep, axis=1)
        pool = ef_buf
    cand_idx = jnp.full((q, ef_buf), -1, jnp.int32).at[:, :pool].set(seed_i[:, :pool])
    cand_d = jnp.full((q, ef_buf), INF).at[:, :pool].set(seed_d[:, :pool])
    cand_d = jnp.where(cand_idx >= 0, cand_d, INF)
    expanded = jnp.zeros((q, ef_buf), bool)
    fresh = cand_idx >= 0  # seeds count as freshly discovered
    explored = jnp.sum(cand_idx >= 0, axis=1).astype(jnp.int32)

    beam_iota = jax.lax.broadcasted_iota(jnp.int32, (q, beam_buf), 1)
    ef_iota = jax.lax.broadcasted_iota(jnp.int32, (q, ef_buf), 1)

    def selectable(state):
        cand_idx, cand_d, expanded, fresh, explored, step = state
        sel = (~expanded) & (cand_idx >= 0)
        if not refine_frontier:
            sel = sel & fresh
        return sel

    def cond(state):
        cand_idx, cand_d, expanded, fresh, explored, step = state
        active_q = explored < ef_vec
        has_work = jnp.any(selectable(state) & active_q[:, None])
        forced = (step < min_steps) & jnp.any(selectable(state))
        return (step < max_steps) & (has_work | forced)

    def body(state):
        cand_idx, cand_d, expanded, fresh, explored, step = state
        active_q = (explored < ef_vec) | (step < min_steps)

        sel = selectable(state)
        sel_score = jnp.where(sel, -cand_d, -INF)
        top_score, pos = jax.lax.top_k(sel_score, beam_buf)  # [Q, beam_buf]
        valid_sel = (
            (top_score > -INF) & (beam_iota < beam_vec[:, None]) & active_q[:, None]
        )

        # mark expanded via broadcast compare (scatter-free)
        hit = jnp.any(
            (pos[:, None, :] == ef_iota[:, :, None]) & valid_sel[:, None, :], axis=2
        )
        expanded = expanded | hit

        node = jnp.take_along_axis(cand_idx, pos, axis=1)  # [Q, beam_buf]
        safe_node = jnp.maximum(node, 0)
        if adj_row_offset is not None:
            safe_node = safe_node + adj_row_offset[:, None]
        nbrs = adjacency[safe_node].reshape(q, c)  # [Q, C]
        # Sort the gathered neighbor ids ONCE; dedup, the pool check, the
        # distance gather, and the merge all operate in sorted order — order
        # is irrelevant to the merge top_k, so the argsort+inverse-argsort
        # pair of positional dedup collapses to a single value sort
        # (exact within-step dedup is load-bearing: skipping it overcounts
        # `explored` on shared neighbors and cost recall .99 -> .91).
        keyed = jnp.where(
            (nbrs >= 0) & jnp.repeat(valid_sel, r, axis=1), nbrs, _BIG
        )
        sorted_ids = jnp.sort(keyed, axis=1)
        first = jnp.concatenate(
            [jnp.ones((q, 1), bool), sorted_ids[:, 1:] != sorted_ids[:, :-1]],
            axis=1,
        )
        new = first & (sorted_ids < _BIG)
        # dedup against the pool: a node present in the pool was already
        # visited; one evicted from the pool was worse than the whole pool and
        # will fall out of the merge again (see module docstring).
        pool_ids = jnp.where(cand_idx >= 0, cand_idx, -2)
        if ef_buf * c <= (1 << 22):
            in_pool = jnp.any(
                sorted_ids[:, :, None] == pool_ids[:, None, :], axis=2
            )
        else:
            # large pools: sorted pool + batched binary search,
            # O(C log EF) instead of O(C * EF)
            sorted_pool = jnp.sort(pool_ids, axis=1)
            spos = jax.vmap(jnp.searchsorted)(sorted_pool, sorted_ids)
            spos = jnp.minimum(spos, ef_buf - 1)
            in_pool = jnp.take_along_axis(sorted_pool, spos, axis=1) == sorted_ids
        new = new & ~in_pool

        # row validity rides in `approx` (invalid rows are +inf) — no
        # separate row_valid gather
        safe_sorted = jnp.minimum(sorted_ids, n - 1)
        nbr_dist = jnp.take_along_axis(approx, safe_sorted, axis=1)
        new = new & jnp.isfinite(nbr_dist)
        new_d = jnp.where(new, nbr_dist, INF)
        new_ids = jnp.where(new, sorted_ids, -1)

        # explored counts every newly visited node, exactly like the
        # reference's `chosen` list (:948-963) — the within-step and pool
        # dedups make `new` first-visits (evicted-node revisits, the only
        # over-count, are rare and only shorten exploration slightly).
        explored = explored + jnp.sum(new, axis=1).astype(jnp.int32)

        all_idx = jnp.concatenate([cand_idx, new_ids], axis=1)
        all_d = jnp.concatenate([cand_d, new_d], axis=1)
        all_exp = jnp.concatenate([expanded, jnp.zeros((q, c), bool)], axis=1)
        all_fresh = jnp.concatenate([jnp.zeros((q, ef_buf), bool), new], axis=1)

        neg_top, keep = jax.lax.top_k(-all_d, ef_buf)
        cand_d = -neg_top
        cand_idx = jnp.take_along_axis(all_idx, keep, axis=1)
        expanded = jnp.take_along_axis(all_exp, keep, axis=1)
        fresh = jnp.take_along_axis(all_fresh, keep, axis=1)
        cand_idx = jnp.where(jnp.isfinite(cand_d), cand_idx, -1)

        return cand_idx, cand_d, expanded, fresh, explored, step + 1

    state = (cand_idx, cand_d, expanded, fresh, explored, jnp.int32(0))
    cand_idx, cand_d, *_ = jax.lax.while_loop(cond, body, state)
    return cand_idx, cand_d


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def exact_rerank(
    q: jax.Array,  # f32[Q, D] queries
    vectors: jax.Array,  # f32[N, D] raw vectors
    alive: jax.Array,  # bool[N] non-tombstoned rows
    cand_idx: jax.Array,  # i32[Q, C] candidates (-1 padded)
    k: int,
    metric: str = "L2",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact re-rank of traversal candidates
    (reference: fdb/FdbVectorIndex.java:970-1046).

    Gathers raw vectors for the candidates, scores them exactly (L2 ->
    score=-dist; cosine -> score=sim, distance=1-sim; deleted rows dropped),
    and returns (scores f32[Q, k], distances f32[Q, k], indices i32[Q, k]).

    `normalizeOnRead` needs no separate path here: the reference's normalized
    and raw cosine formulas are algebraically identical (both divide the dot
    product by the two norms; zero norms yield similarity 0).
    """
    qf = q.astype(jnp.float32)
    if qf.shape[1] < vectors.shape[1]:
        # segments allocate lane-padded vector planes (segment.pad_lane);
        # zero pads change neither dots nor norms
        qf = jnp.pad(qf, ((0, 0), (0, vectors.shape[1] - qf.shape[1])))
    safe = jnp.maximum(cand_idx, 0)
    vecs = vectors[safe].astype(jnp.float32)  # [Q, C, D]
    ok = (cand_idx >= 0) & alive[safe]

    if metric == "COSINE":
        dots = jnp.einsum("qd,qcd->qc", qf, vecs, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1))[:, None]
        vn = jnp.sqrt(jnp.sum(vecs * vecs, axis=-1))
        denom = qn * vn
        sim = jnp.where(denom == 0.0, 0.0, dots / jnp.where(denom == 0.0, 1.0, denom))
        score = sim
        dist = 1.0 - sim
    else:
        diff = vecs - qf[:, None, :]
        d = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
        score = -d
        dist = d

    score = jnp.where(ok, score, -INF)
    kk = min(k, cand_idx.shape[1])
    top_score, pos = jax.lax.top_k(score, kk)
    top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    top_dist = jnp.take_along_axis(dist, pos, axis=1)
    keep = top_score > -INF
    return (
        jnp.where(keep, top_score, -INF),
        jnp.where(keep, top_dist, INF),
        jnp.where(keep, top_idx, -1),
    )


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def exact_finalize(
    q: jax.Array,  # f32[Q, D] queries
    pool_scores: jax.Array,  # f32[Q, C] rank scores of the candidates
    pool_idx: jax.Array,  # i32[Q, C] candidate row ids (-1 padded)
    k: int,
    metric: str = "L2",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Final top-k from a SCORED exact pool — the gather-free replacement for
    exact_rerank on the exact sealed path (reference re-rank contract:
    fdb/FdbVectorIndex.java:970-1046).

    exact_rerank exists to turn approximate candidate rankings (ADC / graph)
    into exact ones, which needs the raw rows — a [Q, C, D] gather that runs
    at ~15 ns/element on TPU and dominated the exact path. But exact mode's
    pool scores ALREADY rank by (near-)exact distance: the scan computes
    2 q.x - ||x||^2 (L2) / (q.x)/||x|| (COSINE) in split-bf16/f32 (see
    ops/pallas/exact._pool_kernel and ops/distance.pairwise_rank_scores).
    Both are strictly monotone in true distance per query, so the final
    ordering equals exact_rerank's, and true distances follow algebraically
    from per-QUERY terms alone:
      L2     -> dist^2 = ||q||^2 - s      (clamped at 0)
      COSINE -> sim    = s / ||q||        (0 when ||q|| = 0, the reference's
                                           zero-norm convention)
    Tombstoned rows never enter the pool (callers mask with `alive`), which
    the invariants file records as equivalent to dropping them at re-rank.
    Returns (scores f32[Q, k], distances f32[Q, k], indices i32[Q, k]) with
    exact_rerank's exact output contract (-inf / +inf / -1 padding).
    """
    qf = q.astype(jnp.float32)
    s = jnp.where(pool_idx >= 0, pool_scores, -INF)
    kk = min(k, pool_idx.shape[1])
    top_s, pos = jax.lax.top_k(s, kk)
    top_idx = jnp.take_along_axis(pool_idx, pos, axis=1)
    if metric == "COSINE":
        qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1))[:, None]
        sim = jnp.where(qn == 0.0, 0.0, top_s / jnp.where(qn == 0.0, 1.0, qn))
        score = sim
        dist = 1.0 - sim
    else:
        q2 = jnp.sum(qf * qf, axis=-1)[:, None]
        d = jnp.sqrt(jnp.maximum(q2 - top_s, 0.0))
        score = -d
        dist = d
    keep = top_s > -INF
    return (
        jnp.where(keep, score, -INF),
        jnp.where(keep, dist, INF),
        jnp.where(keep, top_idx, -1),
    )
