"""Fused exact-scan top-pool kernel: raw-vector MXU scan + in-VMEM binned
reduction, never materializing the [Q, N] score matrix in HBM.

The XLA exact pool (core/index._sealed_exact_pool) is HBM-bound on the score
matrix: the matmul writes f32[Q, N] (2 GB at Q=512, N=1M) and approx_max_k
reads it straight back — ~4 GB of pure intermediate traffic against the
512 MB of actual input. This kernel keeps each [Q, TILE_N] score tile in
VMEM and reduces it to per-bin (max, argmax) pairs before anything leaves
the chip's core: with 128 lanes of bins per tile the pool written to HBM is
N/(TILE_N/128) entries wide — 16-32x smaller than the score matrix — and the
x tile's squared norms are computed from the VMEM-resident tile itself, so
HBM traffic collapses to (read x once) + (tiny pool out).

The binned pool is the same estimator jax.lax.approx_max_k uses (per-bucket
max; see the TPU-KNN paper, PAPERS.md): a true top-k row is lost only when
two of them collide in one bin of TILE_N/128 consecutive rows. A second
exact/approx top-k over the [Q, N/bin] pool (stage 2, plain XLA — it is tiny)
yields the final candidate indices.

Replaces the scan+pool stage of the reference's sealed query
(fdb/FdbVectorIndex.java:730-837) for sealed_search_mode="exact".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vectorsearch_tpu.ops.pallas.adc import is_tpu_backend

_BINS = 128  # one lane row of bins per tile

# Below this row count the XLA pool's intermediate is small enough that the
# kernel's fixed costs (grid setup, second top-k stage) don't pay for
# themselves — and tiny segments divide into too few bins for a useful pool.
MIN_ROWS = 16_384


def _auto_tile(qp: int, d: int, requested: int | None) -> int:
    """Largest N-tile whose per-step VMEM footprint fits: the [Qp, T] f32
    score tile (plus one temp) dominates; x tiles are double-buffered."""
    budget = 11 * 1024 * 1024
    for t in (4096, 2048, 1024, 512):
        if requested is not None and t != requested:
            continue
        need = 2 * (qp * t * 4) + 2 * t * d * 6 + qp * d * 2
        if need <= budget:
            return t
    return 512


def _pool_kernel(
    q_ref, x_ref, valid_ref, outs_ref, outi_ref, *, tile_n, n_total, metric
):
    """One grid step: scores of a [Qp, TILE_N] tile -> per-bin (max, argmax).

    q_ref:     bf16[Qp, D]   (whole batch, VMEM-resident across steps)
    x_ref:     f32[TILE_N, D]
    valid_ref: i32[1, TILE_N] (1 = alive)
    outs_ref:  bf16[Qp, BINS] per-bin max RANKING score (higher = closer)
    outi_ref:  i32[Qp, BINS]  global row id of each bin max
    """
    nt = pl.program_id(0)
    xf = x_ref[:]
    # bf16 multiplies, f32 accumulation — same rank precision as the XLA
    # path's default-precision matmul (ops/distance.pairwise_rank_scores)
    cross = jax.lax.dot_general(
        q_ref[:], xf.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Qp, T]
    # the column term comes from the VMEM-resident tile: zero extra HBM reads
    if metric == "COSINE":
        xn2 = jnp.sum(xf * xf, axis=1)[None, :]  # [1, T]
        inv = jnp.where(
            xn2 == 0.0, 0.0, jax.lax.rsqrt(jnp.where(xn2 == 0.0, 1.0, xn2))
        )
        s = cross * inv
    else:
        s = 2.0 * cross - jnp.sum(xf * xf, axis=1)[None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + nt * tile_n
    # col >= n_total also kills the garbage tail of a non-divisible last
    # tile (Pallas pads boundary block loads with undefined values)
    s = jnp.where((valid_ref[:] != 0) & (col < n_total), s, -jnp.inf)

    # Running (max, arg) over static lane-aligned [Qp, BINS] column slices:
    # bin b = columns {t*BINS + b}. Pure elementwise VPU work — a
    # [Qp, T/BINS, BINS] reshape + axis-1 reduce compiles to cross-lane
    # shuffles in Mosaic and measured ~2.5x slower end-to-end.
    tb = tile_n // _BINS
    m = s[:, :_BINS]
    a = jnp.zeros_like(m, dtype=jnp.int32)
    for t in range(1, tb):
        st = s[:, t * _BINS : (t + 1) * _BINS]
        better = st > m
        m = jnp.where(better, st, m)
        a = jnp.where(better, t, a)
    lane = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    outs_ref[:] = m.astype(jnp.bfloat16)
    outi_ref[:] = nt * tile_n + a * _BINS + lane


@functools.partial(
    jax.jit, static_argnames=("metric", "tile_n", "interpret")
)
def exact_bin_pool(
    q: jax.Array,  # f32[Q, D]
    x: jax.Array,  # f32[N, D]
    valid: jax.Array,  # bool[N]
    metric: str = "L2",
    tile_n: int | None = None,
    interpret: bool = False,
):
    """Stage 1: fused scan + binned reduction -> (scores bf16[Q, W],
    row ids i32[Q, W]) with W = ceil(N/tile)*128 bins. Invalid rows and the
    padded tail can never win a bin unless the whole bin is dead (-inf)."""
    qn, d = q.shape
    n = x.shape[0]
    qp = max(8, -(-qn // 8) * 8)
    tile = _auto_tile(qp, d, tile_n)
    if qp != qn:
        q = jnp.pad(q, ((0, qp - qn), (0, 0)))
    nn = -(-n // tile)
    w = nn * _BINS
    valid_i = valid.astype(jnp.int32)[None, :]
    outs, outi = pl.pallas_call(
        functools.partial(
            _pool_kernel, tile_n=tile, n_total=n, metric=metric
        ),
        grid=(nn,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qp, _BINS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, _BINS), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp, w), jnp.bfloat16),
            jax.ShapeDtypeStruct((qp, w), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * nn * tile * d,
            bytes_accessed=n * d * 4 + qp * d * 2 + qp * w * 6,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q.astype(jnp.bfloat16), x, valid_i)
    return outs[:qn], outi[:qn]


@functools.partial(
    jax.jit, static_argnames=("ef_buf", "metric", "tile_n", "interpret")
)
def exact_pool_topk_pallas(
    q: jax.Array,  # f32[Q, D]
    x: jax.Array,  # f32[N, D]
    valid: jax.Array,  # bool[N]
    *,
    ef_buf: int,
    metric: str = "L2",
    tile_n: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused exact candidate pool -> i32[Q, ef_buf] row ids (-1 = empty).
    Drop-in for the XLA pairwise_rank_scores + approx_max_k pool."""
    outs, outi = exact_bin_pool(
        q, x, valid, metric=metric, tile_n=tile_n, interpret=interpret
    )
    w = outs.shape[1]
    if w <= 2 * ef_buf:
        # few bins: full sort of the tiny pool is cheaper + exact
        neg, pos = jax.lax.top_k(outs, min(ef_buf, w))
        if pos.shape[1] < ef_buf:
            pad = ef_buf - pos.shape[1]
            neg = jnp.pad(neg, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            pos = jnp.pad(pos, ((0, 0), (0, pad)))
    else:
        # stage 2 over the 16-32x-smaller pool: the stricter reduction that
        # was 18x too expensive over N rows (core/index._sealed_exact_pool)
        # is cheap here, so stage 1's bin collisions stay the only loss
        neg, pos = jax.lax.approx_max_k(outs, ef_buf, recall_target=0.999)
    rows = jnp.take_along_axis(outi, pos, axis=1)
    return jnp.where(neg > -jnp.inf, rows, -1)


def use_fused_exact_pool(n: int, d: int, ef_buf: int) -> bool:
    """Whether the fused kernel should replace the XLA pool: TPU backend,
    enough rows to amortize, and enough bins to cover the pool width."""
    if not is_tpu_backend():
        return False
    if n < MIN_ROWS:
        return False
    return (-(-n // 4096)) * _BINS >= ef_buf
