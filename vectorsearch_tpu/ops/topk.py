"""Top-k helpers: masked brute-force kNN and score-ordered merge.

The brute-force path is the TPU counterpart of the reference's ACTIVE/PENDING
segment scan (fdb/FdbVectorIndex.java:660-725): one pairwise-distance matmul
plus `lax.top_k`, batched over queries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vectorsearch_tpu.ops import distance as dist_ops

NEG_INF = jnp.float32(-jnp.inf)


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def brute_force_topk(
    q: jax.Array,  # f32[Q, D]
    x: jax.Array,  # f32[N, D]
    valid: jax.Array,  # bool[N] — live (non-tombstoned, in-range) rows
    k: int,
    metric: str = "L2",
    xn2: jax.Array | None = None,  # f32[N] cached squared norms (stacks)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """kNN over a masked vector table. Exact (full sort) below ~16k rows;
    larger TPU tables route through the fused binned-pool kernel with a 4x
    oversampled pool — near-exact (see the routing comment below); fused-path
    distances are reconstructed from hi/lo-split scores (~1e-3 absolute).

    Returns (scores f32[Q, k], distances f32[Q, k], indices i32[Q, k]);
    invalid/padding slots get score=-inf and index=-1.
    """
    n = x.shape[0]
    if k > n:  # fewer rows than requested: return them all, pad the rest
        s, d, i = brute_force_topk(q, x, valid, n, metric, xn2)
        pad = ((0, 0), (0, k - n))
        return (
            jnp.pad(s, pad, constant_values=-jnp.inf),
            jnp.pad(d, pad, constant_values=jnp.inf),
            jnp.pad(i, pad, constant_values=-1),
        )
    # Large tables on TPU: `lax.top_k` over [Q, N] is a full per-row sort
    # (the measured ACTIVE-segment cost at 1M-row caps); route through the
    # fused scan + binned-pool kernel and finalize distances algebraically —
    # the same machinery as sealed exact mode (the ACTIVE scan IS an exact
    # scan; reference: fdb/FdbVectorIndex.java:660-725). The pool stage is
    # APPROXIMATE (binned max + approx_max_k stage 2), so the pool is
    # oversampled 4x past k — exactly the sealed exact path's ef sizing —
    # and exact_finalize truncates back to k: a true top-k row is lost only
    # if >4k of the true neighbors collide into losing bins, measured
    # recall 1.0 at k=10 (tests/test_exact_pallas.py fused-brute gate).
    ef_buf = 32
    while ef_buf < min(max(4 * k, 32), n):
        ef_buf *= 2
    from vectorsearch_tpu.ops.pallas import exact as pallas_exact

    if pallas_exact.use_fused_exact_pool(n, x.shape[1], ef_buf):
        from vectorsearch_tpu.ops import traversal as traversal_ops

        ps, pi = pallas_exact.exact_pool_scored_pallas(
            q, x, valid, ef_buf=ef_buf, metric=metric, xn2=xn2
        )
        return traversal_ops.exact_finalize(q, ps, pi, k, metric)
    scores, distances = dist_ops.scores_from_distances(metric, q, x)
    masked = jnp.where(valid[None, :], scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(masked, k)
    keep = top_scores > NEG_INF
    # Re-derive exact distances for the winners with the direct (a-b)^2 form:
    # the matmul expansion used for the scan carries ~1e-6 absolute error from
    # cancellation; the k gathered rows are cheap to score exactly.
    top_vecs = x[jnp.maximum(top_idx, 0)].astype(jnp.float32)  # [Q, k, D]
    if metric == "COSINE":
        top_dist = jnp.take_along_axis(distances, top_idx, axis=1)
        top_scores = jnp.where(keep, top_scores, NEG_INF)
    else:
        diff = top_vecs - q.astype(jnp.float32)[:, None, :]
        top_dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
        top_scores = jnp.where(keep, -top_dist, NEG_INF)
    return (
        top_scores,
        jnp.where(keep, top_dist, jnp.float32(jnp.inf)),
        jnp.where(keep, top_idx, -1),
    )


def merge_topk(
    scores_list: list[jax.Array],  # each f32[Q, k_i]
    payload_idx_list: list[jax.Array],  # each i32[Q, k_i] (opaque ids, -1 = empty)
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merges per-segment top-k result sets by score descending, truncating to k.

    The analogue of the reference's cross-segment merge
    (fdb/FdbVectorIndex.java:432-469). Inputs may have differing widths.
    """
    scores = jnp.concatenate(scores_list, axis=1)
    ids = jnp.concatenate(payload_idx_list, axis=1)
    kk = min(k, scores.shape[1])
    top_scores, pos = jax.lax.top_k(scores, kk)
    top_ids = jnp.take_along_axis(ids, pos, axis=1)
    return top_scores, top_ids
