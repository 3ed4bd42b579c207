"""Fused exact-scan top-pool kernel: raw-vector MXU scan + in-VMEM binned
reduction, never materializing the [Q, N] score matrix in HBM.

The XLA exact pool (core/index._sealed_exact_pool_scored) is HBM-bound on the score
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

import os

# Packed score|slot kernel policy (r5): packed=None resolves by ROW COUNT.
# Measured on chip with per-call-unique serving windows (probe_packed_window
# + probe_deep_idle A/B): at 1M rows the two-plane kernel serves ~5-10%
# higher (34.7-35.9k vs 30.6-33.8k QPS — the packed tail saving is real
# chained but the serving path at <=1M is host/tunnel-bound and the packed
# program pipelines slightly worse), while at 10M packed wins (13.6k vs
# 13.1k median idle; its halved pool write and gather-free stage 2 scale
# with N). VSTPU_EXACT_PACKED=0/1 forces either kernel globally.
_PACKED_ENV = os.environ.get("VSTPU_EXACT_PACKED")
_PACKED_MIN_ROWS = 2_000_000


def _packed_default(n_rows: int) -> bool:
    if _PACKED_ENV is not None:
        return _PACKED_ENV != "0"
    return n_rows >= _PACKED_MIN_ROWS

_BINS = 128  # one lane row of bins per tile

# Below this row count the XLA pool's intermediate is small enough that the
# kernel's fixed costs (grid setup, second top-k stage) don't pay for
# themselves — and tiny segments divide into too few bins for a useful pool.
# Recall is path-equivalent at this boundary: a 60k cosine corpus measured
# 0.9984 recall@10 through BOTH the fused kernel and the XLA pool (the one
# lost hit is an approx-stage/near-tie effect, not bin collisions; r4).
MIN_ROWS = 16_384


def _auto_tile(qp: int, d: int, requested: int | None) -> tuple[int, int]:
    """(tile, chunk): the N-rows per grid step and the score sub-chunk the
    kernel loops over inside a step. The [Qp, CHUNK] f32 score block (plus
    one temp) caps chunk; the double-buffered f32 x tile (plus one chunk's
    bf16 hi/lo split) caps tile. Bigger tiles amortize the ~5 us fixed cost
    of a grid step (977 steps at tile=1024 measured 6 ms for ~1.3 ms of
    VPU+MXU work); the in-kernel chunk loop keeps VMEM flat while doing it."""
    if requested is not None:
        # explicit tiles bypass the budget: a VMEM overflow is a visible
        # compile error, and sweeps need to probe past the conservative cap.
        # Same invariants as adc._auto_pool_tile: chunk % bins == 0 and
        # tile % chunk == 0, or the kernel skips columns / emits wrong ids.
        bins = _BINS * max(1, requested // 1024)
        if requested % bins:
            raise ValueError(
                f"tile_n={requested} must be a multiple of bins={bins}"
            )
        chunk = (min(requested, 1024) // bins) * bins
        while chunk > bins and requested % chunk:
            chunk -= bins
        return requested, max(chunk, bins)
    budget = 11 * 1024 * 1024
    # Auto tiles cap at 2048: Mosaic's scoped-vmem estimate for this kernel
    # is COMPOSITION-dependent — t=4096 compiled standalone and in the
    # sift1m sealed program, then hit the 16 MB scoped limit at d=96/N=1M
    # (25.7 MB claimed) and again composed under _stacked_brute_query at
    # Q=256/d=128 (16.77 MB), each failing the whole program's compile.
    # t<=2048 has compiled in every composition probed. Chunk == bins (one
    # lane-slice per chunk): the r4 chunk sweep measured chunk=256 at
    # 1.64 ms vs chunk=1024 at 2.61 at the sift1m shape (fold 8) — the
    # single-slice reduce and the smaller [Qp, chunk] score block pipeline
    # better than fewer, wider matmul+reduce rounds
    # (benchmarks/probe_exact_chunk.py). Explicit tile_n still probes other
    # shapes for sweeps, where a compile failure is visible and recoverable.
    for t in (2048, 1024, 512):
        c = _BINS * max(1, t // 1024)
        need = 2 * (qp * c * 4) + 2 * t * d * 4 + c * d * 4 + qp * d * 8
        if need <= budget:
            return t, c
    return 512, 128


def _pool_kernel(
    q_ref, x_ref, aux_ref, outs_ref, outi_ref,
    *, tile_n, chunk, bins, metric, fold,
):
    """One grid step: scores of a [Qp, TILE_N] tile -> per-bin (max, argmax),
    looping over CHUNK-column sub-blocks so the score block stays small.

    q_ref:     f32[Qp, D]   (whole batch, VMEM-resident across steps;
               PRE-DOUBLED by the wrapper for L2 so the epilogue is one sub)
    x_ref:     f32[TILE_N, D]
    aux_ref:   f32[1|2, TILE_N] precomputed per-row column terms with
               validity folded in (see exact_bin_pool) — replaces both the
               in-kernel ||x||^2 reduce and the valid-mask select, the two
               VPU passes that dominated the per-chunk epilogue
    outs_ref:  f32[Qp, BINS_T] per-bin max RANKING score (higher = closer)
    outi_ref:  i32[Qp, BINS_T] global row id of each bin max

    ``fold`` merges FOLD consecutive tiles into one output block via output
    revisiting (index_map i -> i // fold): the [Q, W] pool written to HBM —
    which at Q=512, N=1M was 512 MB of (score, id) pairs, as large as the
    input itself — shrinks fold-x, and stage 2 reads fold-x less. The
    estimator degrades exactly like wider bins (collision of two true top-k
    rows within a merged bin group).

    Precision: q and each x chunk are split hi/lo into bf16 and crossed in
    three MXU passes (hi*hi + hi*lo + lo*hi, f32 accumulation) — ~2^-16
    relative error on the scores vs bf16's 2^-8. The scores leave the kernel
    and ARE the final ranking + reconstructed distances (exact_finalize):
    there is no re-rank gather behind them to absorb rounding.
    """
    nt = pl.program_id(0)
    qf = q_ref[:]
    qhi = qf.astype(jnp.bfloat16)
    qlo = (qf - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))

    m = jnp.full((qf.shape[0], bins), -jnp.inf, dtype=jnp.float32)
    a = jnp.zeros(m.shape, dtype=jnp.int32)
    g = 0  # linear index of the [Qp, BINS_T] column slice within the tile
    for c in range(tile_n // chunk):
        xf = x_ref[c * chunk : (c + 1) * chunk, :]
        xhi = xf.astype(jnp.bfloat16)
        xlo = (xf - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
        cross = jax.lax.dot_general(
            qhi, xhi, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        cross += jax.lax.dot_general(
            qhi, xlo, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        cross += jax.lax.dot_general(
            qlo, xhi, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )  # [Qp, CHUNK]
        if metric == "COSINE":
            # s = (q.x) * 1/||x|| + bias  (bias = -inf kills invalid rows)
            s = (
                cross * aux_ref[0, c * chunk : (c + 1) * chunk][None, :]
                + aux_ref[1, c * chunk : (c + 1) * chunk][None, :]
            )
        else:
            # q pre-doubled: s = 2 q.x - xadj, xadj = ||x||^2 (+inf invalid)
            s = cross - aux_ref[0, c * chunk : (c + 1) * chunk][None, :]

        # Running (max, arg) over static lane-aligned [Qp, BINS_T] column
        # slices: bin b = columns {g*BINS_T + b}. Pure elementwise VPU work —
        # a reshape + axis reduce compiles to cross-lane shuffles in Mosaic
        # and measured ~2.5x slower end-to-end.
        for t in range(chunk // bins):
            st = s[:, t * bins : (t + 1) * bins]
            better = st > m
            m = jnp.where(better, st, m)
            a = jnp.where(better, g, a)
            g += 1
    lane = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    ids = nt * tile_n + a * bins + lane
    if fold == 1:
        outs_ref[:] = m
        outi_ref[:] = ids
    else:
        # output revisiting: fold consecutive tiles merge in VMEM; the block
        # flushes to HBM only when the output index advances
        @pl.when(nt % fold == 0)
        def _():
            outs_ref[:] = m
            outi_ref[:] = ids

        @pl.when(nt % fold != 0)
        def _():
            prev = outs_ref[:]
            better = m > prev
            outs_ref[:] = jnp.where(better, m, prev)
            outi_ref[:] = jnp.where(better, ids, outi_ref[:])


def _packed_pool_kernel(
    q_ref, x_ref, aux_ref, invs_ref, out_ref,
    *, tile_n, chunk, bins, metric, fold, slot_f,
):
    """Packed single-output variant of _pool_kernel (VERDICT r4 #2): per-bin
    (max score, winning slot) VALUE-packed into ONE f32 as

        p = rint(v * mult) * F + local_slot,   F = fold * tile_n/bins

    with |rint(..)| <= SQ = 2^23/F so |p| < 2^24: every packed value is an
    EXACT f32 integer — a value cast, never a bitcast (TPU flushes denormal
    bit patterns, CLAUDE.md). Ordering by p equals ordering by quantized
    score (ties broken toward the higher slot — deterministic), so the
    running max needs no argmax plane, the output-revisit fold merge is one
    elementwise max, and stage 2 recovers (score, global row id) from the
    packed value + its column index alone — deleting the i32 id plane (half
    the pool HBM) AND the stage-2 take_along_axis id gather
    (benchmarks/probe_stage2_composed.py).

    Quantized value v and per-query factor `mult` (wrapper-precomputed,
    invs_ref block 0; block 1 carries ||q||^2 for L2):
      L2     -> v = -sqrt(||q||^2 - s) = -dist, mult = SQ/(||q||+mx). The
                SQRT COMPRESSION is load-bearing for recall: quantizing the
                rank score s (= -dist^2 up to a shift) spends its 2^17 steps
                over a range ~maxd^2, resolving near-ties only to
                ~maxd^2*2^-17 of dist^2 — measured recall 0.9984 vs the
                0.999 gate at the sift1m shape. Quantizing dist itself
                resolves to maxd*2^-17 ABSOLUTE distance (~8x finer at
                typical top-k distances), restoring parity.
      COSINE -> v = s = (q.x)/||x|| in [-||q||, ||q||], mult = SQ/||q||
                (relative sim precision 2^-17 — far below near-tie gaps)."""
    nt = pl.program_id(0)
    qf = q_ref[:]
    qhi = qf.astype(jnp.bfloat16)
    qlo = (qf - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))
    mult = invs_ref[:, 0:1]  # [Qp, 1] per-query quantization factor
    if metric != "COSINE":
        qn2 = invs_ref[:, 128:129]  # [Qp, 1] ||q||^2 (L2 sqrt compression)
    slot_base = (nt % fold) * (tile_n // bins)

    # Inner loop tracks RAW (max score, slot) registers exactly like the
    # two-plane kernel — 3 VPU ops per element. Compression to the packed
    # value runs ONCE PER TILE on the [Qp, BINS_T] block (bins/tile_n = 1/8
    # of the elements): an in-loop per-element sqrt variant measured
    # 5.0 ms vs 3.2 linear at the sift1m shape — the sqrt is only
    # affordable at the tile epilogue, where it costs N/8 elements.
    m = jnp.full((qf.shape[0], bins), -jnp.inf, dtype=jnp.float32)
    a = jnp.zeros(m.shape, dtype=jnp.int32)
    g = 0
    for c in range(tile_n // chunk):
        xf = x_ref[c * chunk : (c + 1) * chunk, :]
        xhi = xf.astype(jnp.bfloat16)
        xlo = (xf - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
        cross = jax.lax.dot_general(
            qhi, xhi, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        cross += jax.lax.dot_general(
            qhi, xlo, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        cross += jax.lax.dot_general(
            qlo, xhi, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )  # [Qp, CHUNK]
        if metric == "COSINE":
            s = (
                cross * aux_ref[0, c * chunk : (c + 1) * chunk][None, :]
                + aux_ref[1, c * chunk : (c + 1) * chunk][None, :]
            )
        else:
            s = cross - aux_ref[0, c * chunk : (c + 1) * chunk][None, :]
        for t in range(chunk // bins):
            st = s[:, t * bins : (t + 1) * bins]
            # comparison update (never jnp.maximum): the grid tile past n
            # reads undefined memory whose scores can be NaN, and
            # (NaN > m) = False keeps m clean
            better = st > m
            m = jnp.where(better, st, m)
            a = jnp.where(better, g, a)
            g += 1
    # tile epilogue: compress (score, slot) into the single packed value
    if metric == "COSINE":
        v = m
    else:
        # v = -dist (sqrt compression; dead bin: m=-inf -> v=-inf)
        v = -jnp.sqrt(jnp.maximum(qn2 - m, 0.0))
    p = jnp.rint(v * mult) * slot_f + (slot_base + a).astype(jnp.float32)
    if fold == 1:
        out_ref[:] = p
    else:
        @pl.when(nt % fold == 0)
        def _():
            out_ref[:] = p

        @pl.when(nt % fold != 0)
        def _():
            prev = out_ref[:]
            out_ref[:] = jnp.where(p > prev, p, prev)  # p is never NaN here


def _auto_fold(w_raw: int, requested: int | None,
               min_w: int = 16384) -> int:
    """Fold factor for output revisiting: merge tiles until the pool is
    ~16k bins wide. Measured on chip (benchmarks/probe_exact_v3.py, r4):
    the (score, id) pool write was ~1.2 ms of the 2.76 ms stage-1 time at
    Q=512/N=1M (fold8 -> 1.51 ms), and at W<=16k stage 2 can afford an
    EXACT lax.top_k (2.0 ms — the same cost approx_max_k rt=0.99 charges at
    any width), removing stage-2 recall loss entirely. Collision loss of
    the wider bins measured 0 on the sift1m gate (expected ~45/W per query
    uniform). Capped at 8: per-group VMEM residency stops paying past that."""
    if requested is not None:
        return requested
    f = 1
    while f < 8 and w_raw // f > min_w:
        f *= 2
    return f


def _stage1_params(qn: int, d: int, n: int, tile_n: int | None,
                   fold: int | None, min_w: int):
    """Static stage-1 geometry shared by the two-plane and packed kernels —
    and by the packed DECODE, which must reproduce exactly the (tile, bins,
    fold) the kernel used to reconstruct global row ids."""
    qp = max(8, -(-qn // 8) * 8)
    tile, chunk = _auto_tile(qp, d, tile_n)
    bins = _BINS * max(1, tile // 1024)
    nn = -(-n // tile)
    f = _auto_fold(nn * bins, fold, min_w)
    ng = -(-nn // f)
    return qp, tile, chunk, bins, nn, f, ng * bins


@functools.partial(
    jax.jit,
    static_argnames=("metric", "tile_n", "interpret", "fold", "min_w"),
)
def exact_bin_pool(
    q: jax.Array,  # f32[Q, D]
    x: jax.Array,  # f32[N, D]
    valid: jax.Array,  # bool[N]
    metric: str = "L2",
    tile_n: int | None = None,
    interpret: bool = False,
    xn2: jax.Array | None = None,  # f32[N] precomputed squared norms
    fold: int | None = None,
    min_w: int = 16384,
):
    """Stage 1: fused scan + binned reduction -> (scores f32[Q, W],
    row ids i32[Q, W]) with W = ceil(ceil(N/tile)/fold) * bins. Invalid rows
    and the padded tail can never win a bin unless the whole bin is dead
    (-inf).

    ``xn2``: optional precomputed sum(x*x, axis=1). Segment stacks cache it
    (core/stack.py) so the wrapper's column-term precompute costs one [N]
    elementwise pass instead of re-reading the [N, D] table; when absent it
    is computed here (one extra HBM pass over x)."""
    qn, d = q.shape
    n = x.shape[0]
    # One [Qp, 128*(tile/1024)] bin row per tile. 128 bins/tile at tile=4096
    # would quarter the pool width but that kernel variant reliably WEDGES
    # the Mosaic compile server-side (>9 min, twice); pool-width reduction
    # happens via output-revisit folding instead (same VMEM shape).
    qp, tile, chunk, bins, nn, f, w = _stage1_params(
        qn, d, n, tile_n, fold, min_w
    )
    if qp != qn:
        q = jnp.pad(q, ((0, qp - qn), (0, 0)))
    # column terms precomputed OUTSIDE the kernel (one [N]-sized pass) with
    # validity folded in: the kernel epilogue is a single VPU op per chunk
    # instead of the norm-reduce + mul + sub + mask select it replaced
    if xn2 is None:
        xf32 = x.astype(jnp.float32)
        xn2 = jnp.sum(xf32 * xf32, axis=1)
    pad_n = nn * tile - n
    if metric == "COSINE":
        nz = valid & (xn2 > 0.0)
        inv = jnp.where(nz, jax.lax.rsqrt(jnp.where(nz, xn2, 1.0)), 0.0)
        bias = jnp.where(valid, 0.0, -jnp.inf)
        aux = jnp.stack([
            jnp.pad(inv, (0, pad_n)),
            jnp.pad(bias, (0, pad_n), constant_values=-jnp.inf),
        ])
        q_in = q.astype(jnp.float32)
    else:
        xadj = jnp.where(valid, xn2, jnp.inf)
        aux = jnp.pad(xadj, (0, pad_n), constant_values=jnp.inf)[None, :]
        q_in = q.astype(jnp.float32) * 2.0  # folds the 2x into the matmul
    outs, outi = pl.pallas_call(
        functools.partial(
            _pool_kernel, tile_n=tile, chunk=chunk, bins=bins, metric=metric,
            fold=f,
        ),
        grid=(nn,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (aux.shape[0], tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (qp, bins), lambda i: (0, i // f), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (qp, bins), lambda i: (0, i // f), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp, w), jnp.float32),
            jax.ShapeDtypeStruct((qp, w), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * qp * nn * tile * d,
            bytes_accessed=n * d * 4 + n * 4 + qp * d * 4 + qp * w * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_in, x, aux.astype(jnp.float32))
    return outs[:qn], outi[:qn]


@functools.partial(
    jax.jit,
    static_argnames=("metric", "tile_n", "interpret", "fold", "min_w"),
)
def exact_bin_pool_packed(
    q: jax.Array,  # f32[Q, D]
    x: jax.Array,  # f32[N, D]
    valid: jax.Array,  # bool[N]
    metric: str = "L2",
    tile_n: int | None = None,
    interpret: bool = False,
    xn2: jax.Array | None = None,
    fold: int | None = None,
    min_w: int = 16384,
):
    """Packed stage 1 (see _packed_pool_kernel): ONE f32[Q, W] plane whose
    values order by quantized score and carry the winning slot; plus the
    per-query dequantization scale f32[Q]. Decode with decode_packed_pool
    (same static args — the geometry must match)."""
    qn, d = q.shape
    n = x.shape[0]
    qp, tile, chunk, bins, nn, f, w = _stage1_params(
        qn, d, n, tile_n, fold, min_w
    )
    slot_f = float(f * (tile // bins))
    sq_steps = float(1 << 23) / slot_f  # |rint| <= SQ keeps |p| < 2^24
    if qp != qn:
        q = jnp.pad(q, ((0, qp - qn), (0, 0)))
    if xn2 is None:
        xf32 = x.astype(jnp.float32)
        xn2 = jnp.sum(xf32 * xf32, axis=1)
    pad_n = nn * tile - n
    qf = q.astype(jnp.float32)
    qnorm = jnp.sqrt(jnp.sum(qf * qf, axis=1))  # [Qp]
    if metric == "COSINE":
        nz = valid & (xn2 > 0.0)
        inv = jnp.where(nz, jax.lax.rsqrt(jnp.where(nz, xn2, 1.0)), 0.0)
        bias = jnp.where(valid, 0.0, -jnp.inf)
        aux = jnp.stack([
            jnp.pad(inv, (0, pad_n)),
            jnp.pad(bias, (0, pad_n), constant_values=-jnp.inf),
        ])
        q_in = qf
        # |s| = |q.x| / ||x|| <= ||q||: a true bound on every valid score
        scale = jnp.maximum(qnorm, 1e-30)
        qn2_plane = jnp.zeros_like(scale)
    else:
        xadj = jnp.where(valid, xn2, jnp.inf)
        aux = jnp.pad(xadj, (0, pad_n), constant_values=jnp.inf)[None, :]
        q_in = qf * 2.0
        # dist = ||q - x|| <= ||q|| + mx over valid rows (sqrt compression:
        # the kernel quantizes -dist, see _packed_pool_kernel)
        mx2 = jnp.max(jnp.where(valid, xn2, 0.0))
        scale = jnp.maximum(qnorm + jnp.sqrt(mx2), 1e-30)
        qn2_plane = qnorm * qnorm
    # per-query [mult | ||q||^2] planes, each lane-replicated to a 128-wide
    # block so the kernel reads clean VMEM slices (a width-1 trailing dim
    # fights the lane layout)
    invs = jnp.concatenate([
        jnp.broadcast_to((sq_steps / scale)[:, None], (qp, 128)),
        jnp.broadcast_to(qn2_plane[:, None], (qp, 128)),
    ], axis=1)
    packed = pl.pallas_call(
        functools.partial(
            _packed_pool_kernel, tile_n=tile, chunk=chunk, bins=bins,
            metric=metric, fold=f, slot_f=slot_f,
        ),
        grid=(nn,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (aux.shape[0], tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((qp, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (qp, bins), lambda i: (0, i // f), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((qp, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=6 * qp * nn * tile * d,
            bytes_accessed=n * d * 4 + n * 4 + qp * d * 4 + qp * w * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_in, x, aux.astype(jnp.float32), invs.astype(jnp.float32))
    return packed[:qn], scale[:qn] / sq_steps


def decode_packed_pool(
    pvals: jax.Array,  # f32[Q, E] selected packed values
    pos: jax.Array,  # i32[Q, E] their column indices in the [Q, W] pool
    step: jax.Array,  # f32[Q] dequantization step (scale/SQ)
    q: jax.Array,  # f32[Q, D] queries (||q||^2 for the L2 dequant)
    metric: str,
    *, d: int, n: int, qn: int, tile_n: int | None, fold: int | None,
    min_w: int,
):
    """(packed value, pool column) -> (rank score f32, global row id i32),
    pure per-element algebra — the id gather this replaces cost ~0.6 ms
    composed at the sift1m shape. Static args MUST match the
    exact_bin_pool_packed call that produced the pool.

    Dequantization inverts the kernel's packing (see _packed_pool_kernel):
      L2     -> dist = -s_q*step, score = ||q||^2 - dist^2 (the
                pairwise_rank_scores convention exact_finalize expects)
      COSINE -> score = s_q*step."""
    _qp, tile, _chunk, bins, _nn, f, _w = _stage1_params(
        qn, d, n, tile_n, fold, min_w
    )
    slot_f = float(f * (tile // bins))
    ok = pvals > -jnp.inf
    pv = jnp.where(ok, pvals, 0.0)  # keep the int algebra NaN-free
    sq = jnp.floor(pv / slot_f)  # exact: slot_f is a power of two
    slot = (pv - sq * slot_f).astype(jnp.int32)  # [0, F)
    if metric == "COSINE":
        scores = sq * step[:, None]
    else:
        qf = q.astype(jnp.float32)
        qn2 = jnp.sum(qf * qf, axis=1)[:, None]
        dist = -sq * step[:, None]
        scores = qn2 - dist * dist
    scores = jnp.where(ok, scores, -jnp.inf)
    group = pos // bins
    lane = pos % bins
    nt = group * f + slot // (tile // bins)
    a = slot % (tile // bins)
    rows = nt * tile + a * bins + lane
    return scores, jnp.where(ok, rows, -1)


def _halve_pool(outs: jax.Array, outi: jax.Array, times: int):
    """Paired elementwise max over adjacent bins: [Q, W] -> [Q, W/2] per
    halving. Equivalent to having run stage 1 with double-size bins (the
    collision estimator degrades the same way), but as a cheap XLA
    elementwise pass instead of the narrow-bins kernel variant that wedges
    the Mosaic compiler (see exact_bin_pool's bins note) — shrinking the
    stage-2 top-k input, which is the measured exact-path bottleneck."""
    for _ in range(times):
        w = outs.shape[1] // 2 * 2
        s = outs[:, :w].reshape(outs.shape[0], -1, 2)
        i = outi[:, :w].reshape(outi.shape[0], -1, 2)
        left = s[:, :, 0] >= s[:, :, 1]
        outs = jnp.where(left, s[:, :, 0], s[:, :, 1])
        outi = jnp.where(left, i[:, :, 0], i[:, :, 1])
    return outs, outi


def exact_pool_scored_pallas(
    q: jax.Array,
    x: jax.Array,
    valid: jax.Array,
    *,
    ef_buf: int,
    metric: str = "L2",
    tile_n: int | None = None,
    interpret: bool = False,
    stage2_rt: float = 0.99,
    stage2_halve: int = 0,
    xn2: jax.Array | None = None,
    fold: int | None = None,
    packed: bool | None = None,
    stage2_agg: bool = True,
):
    """Resolves packed=None -> _packed_default(N) OUTSIDE the jit: a static
    arg resolved inside the traced body would bake the first-seen default
    into the cached trace for the key packed=None."""
    return _exact_pool_scored_impl(
        q, x, valid, ef_buf=ef_buf, metric=metric, tile_n=tile_n,
        interpret=interpret, stage2_rt=stage2_rt, stage2_halve=stage2_halve,
        xn2=xn2, fold=fold,
        packed=_packed_default(x.shape[0]) if packed is None else packed,
        stage2_agg=stage2_agg,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "ef_buf", "metric", "tile_n", "interpret", "stage2_rt", "stage2_halve",
        "fold", "packed", "stage2_agg",
    ),
)
def _exact_pool_scored_impl(
    q: jax.Array,  # f32[Q, D]
    x: jax.Array,  # f32[N, D]
    valid: jax.Array,  # bool[N]
    *,
    ef_buf: int,
    metric: str = "L2",
    tile_n: int | None = None,
    interpret: bool = False,
    stage2_rt: float = 0.99,
    stage2_halve: int = 0,
    xn2: jax.Array | None = None,
    fold: int | None = None,
    packed: bool = True,
    stage2_agg: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Fused exact candidate pool WITH its rank scores:
    (scores f32[Q, ef_buf], row ids i32[Q, ef_buf]) — -inf/-1 = empty slot.
    The scores are near-f32 rank scores (see _pool_kernel's precision note):
    L2 -> 2 q.x - ||x||^2, COSINE -> (q.x)/||x|| — exactly the
    ops/distance.pairwise_rank_scores conventions, so
    ops/traversal.exact_finalize can reconstruct true distances from them
    with no candidate-row gather.

    ``packed`` (default, r5): stage 1 emits the single packed score|slot
    plane and stage 2 decodes ids algebraically — no i32 id plane, no
    take_along_axis gather (see _packed_pool_kernel). Scores carry the
    ~2^-17-of-bound quantization of the packing; pass packed=False for the
    two-plane kernel (full split-bf16 score precision, used by sweeps and
    by stage2_halve which reduces (score, id) pairs)."""
    min_w = max(16384, 4 * ef_buf)
    if packed and not stage2_halve:
        pool, step = exact_bin_pool_packed(
            q, x, valid, metric=metric, tile_n=tile_n, interpret=interpret,
            xn2=xn2, fold=fold, min_w=min_w,
        )
        w = pool.shape[1]
        if w <= 2 * ef_buf:
            pv, pos = jax.lax.top_k(pool, min(ef_buf, w))
            if pos.shape[1] < ef_buf:
                pad = ef_buf - pos.shape[1]
                pv = jnp.pad(pv, ((0, 0), (0, pad)), constant_values=-jnp.inf)
                pos = jnp.pad(pos, ((0, 0), (0, pad)))
        else:
            # stage2_agg=False (the serving path): skip approx_max_k's final
            # aggregation sort and return the UNAGGREGATED per-bin maxima —
            # the caller's exact_finalize top_k eats the wider pool directly.
            # Measured chained at Q=512/N=1M (probe_stage2_variants):
            # 3.01 ms vs 3.34 aggregated AND recall 1.0 vs 0.99922 (the
            # aggregation was stage 2's only approximation). Decode is
            # per-element algebra, so the wider output costs ~nothing; keep
            # aggregation for pool consumers that GATHER per candidate
            # (ops/graph knn: a 124x wider pool would explode its
            # [B, ef, D] vector gather).
            pv, pos = jax.lax.approx_max_k(
                pool, ef_buf, recall_target=stage2_rt,
                aggregate_to_topk=stage2_agg,
            )
        return decode_packed_pool(
            pv, pos.astype(jnp.int32), step, q, metric,
            d=q.shape[1], n=x.shape[0], qn=q.shape[0], tile_n=tile_n,
            fold=fold, min_w=min_w,
        )
    outs, outi = exact_bin_pool(
        q, x, valid, metric=metric, tile_n=tile_n, interpret=interpret,
        xn2=xn2, fold=fold, min_w=min_w,
    )
    if stage2_halve:
        outs, outi = _halve_pool(outs, outi, stage2_halve)
    w = outs.shape[1]
    if w <= 2 * ef_buf:
        # few bins: full sort of the tiny pool is cheaper + exact
        neg, pos = jax.lax.top_k(outs, min(ef_buf, w))
        if pos.shape[1] < ef_buf:
            pad = ef_buf - pos.shape[1]
            neg = jnp.pad(neg, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            pos = jnp.pad(pos, ((0, 0), (0, pad)))
    else:
        # stage 2 over the FOLDED pool (W ~16k after _auto_fold). Measured
        # composed at the sift1m shape (benchmarks/probe_exact_v2.py, r4):
        # an exact lax.top_k here costs ~4.3 ms IN COMPOSITION (its 2.0 ms
        # standalone reading misleads — CLAUDE.md: trust composed deltas),
        # while approx_max_k rt=0.99 composes at ~1.9 ms; bin-collision
        # loss at W=15.6k measured ZERO (fold8+top_k read recall 1.00000),
        # so stage-2's rt is the only recall knob left. rt=0.99 holds the
        # path at recall 0.9996 ("1.00" headline); rt=0.95 saves ~1 ms more
        # at 0.9986 for callers that opt in via stage2_rt.
        neg, pos = jax.lax.approx_max_k(outs, ef_buf, recall_target=stage2_rt)
    rows = jnp.take_along_axis(outi, pos, axis=1)
    ok = neg > -jnp.inf
    return jnp.where(ok, neg, -jnp.inf), jnp.where(ok, rows, -1)


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
    xn2: jax.Array | None = None,
) -> jax.Array:
    """Fused exact candidate pool -> i32[Q, ef_buf] row ids (-1 = empty).
    Drop-in for the XLA pairwise_rank_scores + approx_max_k pool."""
    return exact_pool_scored_pallas(
        q, x, valid, ef_buf=ef_buf, metric=metric, tile_n=tile_n,
        interpret=interpret, xn2=xn2,
    )[1]


def use_fused_exact_pool(n: int, d: int, ef_buf: int) -> bool:
    """Whether the fused kernel should replace the XLA pool: TPU backend,
    enough rows to amortize, and enough bins to cover the pool width."""
    if not is_tpu_backend():
        return False
    if n < MIN_ROWS:
        return False
    return (-(-n // 4096)) * _BINS >= ef_buf
