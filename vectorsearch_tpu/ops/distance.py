"""Distance kernels (reference: util/Distances.java:13-154).

The reference's Java SIMD loops become MXU matmuls here: the hot shape is
*pairwise* distance between a batch of queries and a table of vectors,
computed via the ||q||^2 + ||x||^2 - 2 q.x expansion so the O(Q*N*D) work is
one `jnp.dot` that XLA tiles onto the systolic array.

All functions are jit-compatible and accept/return jax arrays. Scalar
(vector-vector) variants exist for parity testing against the reference math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_squared(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared L2 between two vectors (reference: Distances.l2Squared :48-64)."""
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.sum(d * d, axis=-1)


def l2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Euclidean distance (reference: Distances.l2 :31-33)."""
    return jnp.sqrt(l2_squared(a, b))


def dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Dot product (reference: Distances.dot :103-118)."""
    return jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32), axis=-1)


def norm(a: jax.Array) -> jax.Array:
    """L2 norm (reference: Distances.norm :126-140)."""
    return jnp.sqrt(jnp.sum(jnp.square(a.astype(jnp.float32)), axis=-1))


def cosine(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cosine similarity; 0.0 when either norm is zero (reference: Distances.cosine :149-153)."""
    na = norm(a)
    nb = norm(b)
    denom = na * nb
    return jnp.where(denom == 0.0, 0.0, dot(a, b) / jnp.where(denom == 0.0, 1.0, denom))


def pairwise_l2_squared(q: jax.Array, x: jax.Array) -> jax.Array:
    """Pairwise squared L2: q f32[Q, D], x f32[N, D] -> f32[Q, N].

    Uses the matmul expansion so the dominant cost is a (Q, D) x (D, N) matmul on
    the MXU. Clamped at zero against catastrophic cancellation.
    """
    q = q.astype(jnp.float32)
    x = x.astype(jnp.float32)
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)  # [Q, 1]
    x_sq = jnp.sum(x * x, axis=-1)[None, :]  # [1, N]
    cross = jnp.dot(q, x.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # [Q, N]
    return jnp.maximum(q_sq + x_sq - 2.0 * cross, 0.0)


def pairwise_cosine(q: jax.Array, x: jax.Array) -> jax.Array:
    """Pairwise cosine similarity: q f32[Q, D], x f32[N, D] -> f32[Q, N].

    Zero-norm rows (on either side) yield similarity 0.0, matching the
    reference's zero-norm convention.
    """
    q = q.astype(jnp.float32)
    x = x.astype(jnp.float32)
    qn = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))  # [Q, 1]
    xn = jnp.sqrt(jnp.sum(x * x, axis=-1))[None, :]  # [1, N]
    cross = jnp.dot(q, x.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    denom = qn * xn
    return jnp.where(denom == 0.0, 0.0, cross / jnp.where(denom == 0.0, 1.0, denom))


def pairwise_rank_scores(
    q: jax.Array,  # f32[Q, D]
    x: jax.Array,  # f32[N, D]
    valid: jax.Array,  # bool[N]
    metric: str = "L2",
    precision=None,
) -> jax.Array:
    """Masked, higher-is-better RANKING scores for the exact sealed scan
    (config.sealed_search_mode="exact"): ONE MXU matmul (default precision:
    bf16 multiplies, f32 accumulation) with no [Q, N] epilogue beyond the
    validity mask.

    Per-query-constant terms are dropped and no sqrt is taken:
      L2     -> 2 q.x - ||x||^2   (= ||q||^2 - dist^2 up to a per-query shift)
      COSINE -> (q.x) / ||x||     (the per-query 1/||q|| > 0 factor dropped;
                zero-norm rows score 0.0, the reference's convention)
    Invalid rows -> -inf.

    `precision`: pass jax.lax.Precision.HIGHEST when the scores feed
    ops/traversal.exact_finalize (the gather-free re-rank reconstructs TRUE
    distances from these values, so bf16 rounding would reach the results);
    leave None when a downstream exact_rerank re-scores the pool anyway.
    """
    q = q.astype(jnp.float32)
    x = x.astype(jnp.float32)
    cross = jnp.dot(
        q, x.T, preferred_element_type=jnp.float32, precision=precision
    )  # [Q, N]
    if metric == "COSINE":
        xn = jnp.sqrt(jnp.sum(x * x, axis=-1))[None, :]  # [1, N]
        s = jnp.where(xn == 0.0, 0.0, cross / jnp.where(xn == 0.0, 1.0, xn))
    else:
        x_sq = jnp.sum(x * x, axis=-1)[None, :]  # [1, N]
        s = 2.0 * cross - x_sq
    return jnp.where(valid[None, :], s, -jnp.inf)


def scores_from_distances(
    metric: str, q: jax.Array, x: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Computes (score, distance) matrices for a batch of queries.

    Score is higher-is-better (reference: api/SearchResult.java:5-18):
      L2     -> score = -sqrt(l2sq), distance = sqrt(l2sq)
      COSINE -> score = similarity,  distance = 1 - similarity
    Returns (scores f32[Q, N], distances f32[Q, N]).
    """
    if metric == "COSINE":
        sim = pairwise_cosine(q, x)
        return sim, 1.0 - sim
    d = jnp.sqrt(pairwise_l2_squared(q, x))
    return -d, d
