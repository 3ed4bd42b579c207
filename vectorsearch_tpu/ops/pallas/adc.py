"""Pallas ADC-scan kernel: LUT x one-hot(codes) matmul with the one-hot built
in VMEM.

The XLA formulation (ops/pq.py adc_scan) materializes the one-hot expansion
of the PQ codes in HBM — ~2 * M*K bytes of HBM traffic per vector per scan
(16 KB/vector at M=16, K=256) against 16 B/vector of actual payload. This
kernel streams only the codes: each grid step loads a [TILE_N, M] u8 tile
into VMEM, expands it to a [TILE_N, M*K] bf16 one-hot *in VMEM*, and runs the
[Q, M*K] x [M*K, TILE_N] matmul on the MXU. HBM traffic drops to
codes-in + results-out, putting the scan at memory speed-of-light.

Falls back to the XLA path automatically off-TPU (Pallas TPU kernels don't
run on the CPU backend without interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_N = 512


def _make_onehot(codes_ref, kidx_ref):
    """Flattened one-hot built directly in 2D (Mosaic can't shape-cast
    [T, M, K] -> [T, M*K] when K is narrower than a lane). pltpu.repeat
    TILES along the lane axis (codes_rep[t, j] = codes[t, j % M]), so the
    flattened layout is k-major: column j = k_idx*M + m_idx, and the caller
    flattens the LUT as lut.transpose(0, 2, 1) to match:
      onehot[t, j] = (codes[t, j % M] == j // M)

    The k-index row (j // M) is a grid-invariant constant, so it arrives as
    a tiny i32[1, M*K] operand broadcast over sublanes instead of being
    rebuilt via iota + integer-div on the VPU every grid step — the scan is
    onehot-construction-bound, and the div was the expensive part.
    """
    m = codes_ref.shape[1]
    k = kidx_ref.shape[1] // m
    codes = codes_ref[:].astype(jnp.int32)  # [T, M]
    codes_rep = pltpu.repeat(codes, k, axis=1)  # [T, M*K] tiled
    return (codes_rep == kidx_ref[:]).astype(jnp.bfloat16)


_DN = (((1,), (1,)), ((), ()))


def _adc_kernel(hi_ref, lo_ref, kidx_ref, codes_ref, out_ref):
    """One grid step: out[:, tile] = (hi + lo) @ onehot(codes[tile]).T.

    hi_ref/lo_ref: bf16[Q, M*K] — two-pass bf16 split of the f32 LUT,
                   precomputed by the wrapper (VMEM, ~1 MB each at Q=128)
    codes_ref:     u8[TILE_N, M] (VMEM)
    out_ref:       f32[Q, TILE_N]
    """
    onehot = _make_onehot(codes_ref, kidx_ref)
    # two matmul passes (hi + lo) -> near-f32 accuracy; one-hot is exact bf16
    out_ref[:] = jax.lax.dot_general(
        hi_ref[:], onehot, dimension_numbers=_DN, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        lo_ref[:], onehot, dimension_numbers=_DN, preferred_element_type=jnp.float32
    )


def _adc_kernel_fast(lut_ref, kidx_ref, codes_ref, out_ref):
    """Single-pass variant: one bf16 matmul on the rounded LUT. The scan only
    ranks candidates for an exact re-rank, and bf16's 8-bit mantissa moves
    the pool boundary imperceptibly (recall unchanged at 4 decimal places on
    the sift100k gate) for HALF the MXU work of the two-pass kernel."""
    onehot = _make_onehot(codes_ref, kidx_ref)
    out_ref[:] = jax.lax.dot_general(
        lut_ref[:], onehot, dimension_numbers=_DN, preferred_element_type=jnp.float32
    )


def _adc_kernel_scores(lut_ref, kidx_ref, valid_ref, codes_ref, out_ref):
    """Flat-path variant: emits NEGATED bf16 scores with the validity mask
    applied in-kernel. The wrapper folds the negation into the LUT, so
    out[:, tile] = (-lut) @ onehot(codes[tile]).T, and invalid columns are
    written as -inf. The consumer (jax.lax.approx_max_k for the global
    top-ef pool) reads this output directly — no slice/where/negate passes
    over the [Q, N] matrix in HBM, and bf16 halves the write+read traffic.
    """
    onehot = _make_onehot(codes_ref, kidx_ref)
    mm = jax.lax.dot_general(
        lut_ref[:], onehot, dimension_numbers=_DN, preferred_element_type=jnp.float32
    )
    out_ref[:] = jnp.where(
        valid_ref[:] != 0, mm, -jnp.inf
    ).astype(out_ref.dtype)


def _auto_tile(qn: int, mk: int, requested: int | None) -> int:
    """Largest tile that fits the ~16MB VMEM scope: resident hi/lo LUTs
    (2*Q*MK bf16) + double-buffered onehot/out tiles."""
    budget = 10 * 1024 * 1024
    fixed = 2 * qn * mk * 2  # hi + lo
    for t in (2048, 1024, 512, 256, 128):
        if requested is not None and t > requested:
            continue
        # onehot bf16 + codes_rep/col int32 temps + out tile, double-buffered
        need = fixed + 2 * (t * mk * 2 + 2 * t * mk * 4 + qn * t * 4)
        if need <= budget:
            return t
    return 128


@functools.partial(
    jax.jit, static_argnames=("tile_n", "precise", "interpret")
)
def adc_scan_pallas(
    lut: jax.Array,  # f32[Q, M, K]
    codes: jax.Array,  # u8[N, M] (N must be a multiple of tile_n; pad first)
    valid: jax.Array,  # bool[N]
    tile_n: int | None = None,
    precise: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Full ADC scan -> approx dists f32[Q, N]; invalid rows = +inf.

    Default is the single-pass bf16 kernel (_adc_kernel_fast); pass
    ``precise=True`` for the near-f32 two-pass hi/lo split."""
    qn, m, k = lut.shape
    n = codes.shape[0]
    tile_n = _auto_tile(qn, m * k, tile_n)
    pad_n = (-n) % tile_n
    if pad_n:
        codes = jnp.pad(codes, ((0, pad_n), (0, 0)))
    n_pad = codes.shape[0]
    # k-major flattening to match the kernel's tiled one-hot layout
    lut_flat = lut.transpose(0, 2, 1).reshape(qn, m * k)
    kidx = (jnp.arange(m * k, dtype=jnp.int32) // m)[None, :]

    lut_spec = pl.BlockSpec((qn, m * k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kidx_spec = pl.BlockSpec((1, m * k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    common = dict(
        grid=(n_pad // tile_n,),
        out_specs=pl.BlockSpec(
            (qn, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((qn, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(2 if precise else 1) * 2 * qn * n_pad * m * k,
            bytes_accessed=n_pad * m + qn * m * k * 4 + qn * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    codes_spec = pl.BlockSpec((tile_n, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if precise:
        # hi/lo split via bit masking: a plain bf16 round-trip gets elided
        # under --xla_allow_excess_precision (lo would fold to zero).
        # Truncating the low 16 mantissa bits yields an exactly-bf16 hi.
        bits = jax.lax.bitcast_convert_type(lut_flat, jnp.uint32)
        hi_f32 = jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32
        )
        hi = hi_f32.astype(jnp.bfloat16)
        lo = (lut_flat - hi_f32).astype(jnp.bfloat16)
        out = pl.pallas_call(
            _adc_kernel,
            in_specs=[lut_spec, lut_spec, kidx_spec, codes_spec],
            **common,
        )(hi, lo, kidx, codes)
    else:
        out = pl.pallas_call(
            _adc_kernel_fast,
            in_specs=[lut_spec, kidx_spec, codes_spec],
            **common,
        )(lut_flat.astype(jnp.bfloat16), kidx, codes)
    out = out[:, :n]
    return jnp.where(valid[None, :], out, jnp.inf)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def adc_scan_scores_pallas(
    lut: jax.Array,  # f32[Q, M, K]
    codes: jax.Array,  # u8[N, M]
    valid: jax.Array,  # bool[N]
    tile_n: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused flat-path ADC scan -> NEGATED scores bf16[Q, N_pad] (higher =
    closer); invalid rows AND tile-padding columns are -inf, so the output
    feeds jax.lax.approx_max_k directly. N_pad >= N is the tile-rounded
    width — padded columns can never be selected (they are -inf), so callers
    need no slice (the slice would itself be a full [Q, N] copy).

    bf16 scores only rank candidates for the exact re-rank (see
    _adc_kernel_fast's accuracy note); the halved output width is ~200 MB
    less HBM traffic per 512x100k scan."""
    qn, m, k = lut.shape
    n = codes.shape[0]
    tile_n = _auto_tile(qn, m * k, tile_n)
    pad_n = (-n) % tile_n
    if pad_n:
        codes = jnp.pad(codes, ((0, pad_n), (0, 0)))
    valid_i = jnp.pad(valid.astype(jnp.int32), (0, pad_n))[None, :]
    n_pad = codes.shape[0]
    # negation folded into the (k-major flattened) LUT
    lut_flat = (-lut.transpose(0, 2, 1).reshape(qn, m * k)).astype(jnp.bfloat16)
    kidx = (jnp.arange(m * k, dtype=jnp.int32) // m)[None, :]
    return pl.pallas_call(
        _adc_kernel_scores,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((qn, m * k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m * k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (qn, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((qn, n_pad), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n_pad * m * k,
            bytes_accessed=n_pad * m + qn * m * k * 2 + qn * n_pad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lut_flat, kidx, valid_i, codes)


_BINS = 128  # one lane row of bins per 1024 rows of tile

# Below this the [Q, N] scores intermediate is small enough that the plain
# scores scan + approx_max_k wins on fixed costs (and tiny segments divide
# into too few bins for a useful pool).
MIN_ROWS_POOL = 16_384


def _auto_pool_tile(
    qp: int, mk: int, requested: int | None
) -> tuple[int, int] | None:
    """(tile, chunk) for the fused ADC pool kernel, or None when only
    step-overhead-bound tiny tiles would fit (callers fall back to the
    scores scan). The in-kernel chunk loop bounds the big temporaries
    (codes_rep i32[chunk, MK] + onehot bf16) while the tile amortizes the
    fixed cost of a grid step; bins = 128*(tile/1024) must divide chunk.

    The budget is calibrated against a measured-good config, not a paper
    sum of every temp: (tile=2048, chunk=256) at qp=512, mk=4096 compiles
    and runs ~13 MB by this accounting (Mosaic reuses the compare/select
    temps it would double-count)."""
    if requested is not None:
        # the kernel's id arithmetic (g*bins+lane) and its chunk loop assume
        # chunk % bins == 0 and tile % chunk == 0; a tile like 2560 would
        # otherwise silently skip columns and emit WRONG row ids (ADVICE r3)
        bins = _BINS * max(1, requested // 1024)
        if requested % bins:
            raise ValueError(
                f"tile_n={requested} must be a multiple of bins={bins}"
            )
        chunk = (max(requested // 8, min(requested, 256)) // bins) * bins
        while chunk > bins and requested % chunk:
            chunk -= bins
        return requested, max(chunk, bins)
    budget = 14 * 1024 * 1024
    fixed = qp * mk * 2 + mk * 4  # resident bf16 LUT + kidx row
    for t, c in ((2048, 256), (1024, 128)):
        # codes_rep i32 + onehot bf16 chunk temps + score block + the
        # double-buffered output bins
        need = fixed + c * mk * 6 + qp * c * 4
        need += 2 * qp * (_BINS * max(1, t // 1024)) * 8
        if need <= budget:
            return t, c
    return None


def _adc_pool_kernel(
    lut_ref, kidx_ref, valid_ref, codes_ref, outs_ref, outi_ref,
    *, tile_n, chunk, bins, fold,
):
    """One grid step: negated ADC scores of a [Qp, TILE_N] code tile reduced
    to per-bin (max, argmax) pairs — the exact.py binned-pool estimator
    applied to the one-hot ADC matmul, so the [Q, N] score matrix never
    exists anywhere (not even in HBM as bf16).

    lut_ref:   bf16[Qp, M*K] pre-negated, k-major flattened (VMEM-resident)
    kidx_ref:  i32[1, M*K] grid-invariant k-index row (see _make_onehot)
    valid_ref: i32[1, TILE_N] (wrapper zero-pads the tail tile)
    codes_ref: u8[TILE_N, M]
    outs_ref:  f32[Qp, BINS_T] per-bin max negated-ADC score
    outi_ref:  i32[Qp, BINS_T] global row id of each bin max

    ``fold`` merges FOLD consecutive tiles into one output block via output
    revisiting (same mechanism and rationale as exact._pool_kernel: the
    [Q, W] (score, id) pool written to HBM is the dominant non-matmul
    traffic at large N, and stage 2 reads fold-x less).

    Precision matches the scores scan (_adc_kernel_scores): one bf16 matmul
    pass — the pool only ranks candidates for an exact downstream re-rank.
    """
    nt = pl.program_id(0)
    qp = lut_ref.shape[0]
    m = codes_ref.shape[1]
    lut = lut_ref[:]
    m_run = jnp.full((qp, bins), -jnp.inf, dtype=jnp.float32)
    a_run = jnp.zeros(m_run.shape, dtype=jnp.int32)
    g = 0
    for c in range(tile_n // chunk):
        codes = codes_ref[c * chunk : (c + 1) * chunk, :].astype(jnp.int32)
        codes_rep = pltpu.repeat(codes, kidx_ref.shape[1] // m, axis=1)
        onehot = (codes_rep == kidx_ref[:]).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            lut, onehot, dimension_numbers=_DN,
            preferred_element_type=jnp.float32,
        )  # [Qp, CHUNK] negated scores (LUT pre-negated by the wrapper)
        vc = valid_ref[0, c * chunk : (c + 1) * chunk]
        s = jnp.where(vc[None, :] != 0, s, -jnp.inf)
        for t in range(chunk // bins):
            st = s[:, t * bins : (t + 1) * bins]
            better = st > m_run
            m_run = jnp.where(better, st, m_run)
            a_run = jnp.where(better, g, a_run)
            g += 1
    lane = jax.lax.broadcasted_iota(jnp.int32, m_run.shape, 1)
    ids = nt * tile_n + a_run * bins + lane
    if fold == 1:
        outs_ref[:] = m_run
        outi_ref[:] = ids
    else:
        @pl.when(nt % fold == 0)
        def _():
            outs_ref[:] = m_run
            outi_ref[:] = ids

        @pl.when(nt % fold != 0)
        def _():
            prev = outs_ref[:]
            better = m_run > prev
            outs_ref[:] = jnp.where(better, m_run, prev)
            outi_ref[:] = jnp.where(better, ids, outi_ref[:])


@functools.partial(
    jax.jit, static_argnames=("tile_n", "interpret", "fold", "min_w")
)
def adc_bin_pool(
    lut: jax.Array,  # f32[Q, M, K]
    codes: jax.Array,  # u8[N, M]
    valid: jax.Array,  # bool[N]
    tile_n: int | None = None,
    interpret: bool = False,
    fold: int | None = None,
    min_w: int = 16384,
):
    """Stage 1: fused ADC scan + binned reduction -> (neg scores f32[Q, W],
    row ids i32[Q, W]) with W = ceil(N/tile) * bins. Same estimator as
    jax.lax.approx_max_k's per-bucket max (see ops/pallas/exact.py): a true
    top-k row is lost only when two of them collide in one bin (rows
    congruent mod bins within a tile)."""
    qn, m, k = lut.shape
    n = codes.shape[0]
    qp = max(8, -(-qn // 8) * 8)
    tc = _auto_pool_tile(qp, m * k, tile_n)
    if tc is None:  # callers gate via use_fused_adc_pool; belt and braces
        tc = (1024, 128)
    tile, chunk = tc
    bins = _BINS * max(1, tile // 1024)
    lut_flat = (-lut.transpose(0, 2, 1).reshape(qn, m * k)).astype(jnp.bfloat16)
    if qp != qn:
        lut_flat = jnp.pad(lut_flat, ((0, qp - qn), (0, 0)))
    nn = -(-n // tile)
    # same auto-fold policy as the exact kernel (W ~16k): the pool write is
    # the dominant non-matmul HBM traffic at large N and stage 2 shrinks
    from vectorsearch_tpu.ops.pallas.exact import _auto_fold

    f = _auto_fold(nn * bins, fold, min_w)
    ng = -(-nn // f)
    w = ng * bins
    codes = jnp.pad(codes, ((0, nn * tile - n), (0, 0)))
    valid_i = jnp.pad(valid.astype(jnp.int32), (0, nn * tile - n))[None, :]
    kidx = (jnp.arange(m * k, dtype=jnp.int32) // m)[None, :]
    outs, outi = pl.pallas_call(
        functools.partial(
            _adc_pool_kernel, tile_n=tile, chunk=chunk, bins=bins, fold=f
        ),
        grid=(nn,),
        in_specs=[
            pl.BlockSpec((qp, m * k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m * k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
            flops=2 * qp * nn * tile * m * k,
            bytes_accessed=nn * tile * m + qp * m * k * 2 + qp * w * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lut_flat, kidx, valid_i, codes)
    return outs[:qn], outi[:qn]


@functools.partial(
    jax.jit,
    static_argnames=("ef_buf", "tile_n", "interpret", "stage2_rt", "fold"),
)
def adc_pool_pallas(
    lut: jax.Array,  # f32[Q, M, K]
    codes: jax.Array,  # u8[N, M]
    valid: jax.Array,  # bool[N]
    *,
    ef_buf: int,
    tile_n: int | None = None,
    interpret: bool = False,
    stage2_rt: float = 0.95,
    fold: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused flat-path candidate pool: (neg scores f32[Q, ef_buf],
    row ids i32[Q, ef_buf]) — -inf/-1 = empty slot. Replaces the scores
    scan + [Q, N] approx_max_k: stage 2 runs over the ~8x smaller bin pool.
    stage2_rt mirrors the scan path's approx_max_k recall_target (0.95)."""
    outs, outi = adc_bin_pool(
        lut, codes, valid, tile_n=tile_n, interpret=interpret, fold=fold,
        min_w=max(16384, 4 * ef_buf),
    )
    w = outs.shape[1]
    if w <= 2 * ef_buf:
        neg, pos = jax.lax.top_k(outs, min(ef_buf, w))
        if pos.shape[1] < ef_buf:
            pad = ef_buf - pos.shape[1]
            neg = jnp.pad(neg, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            pos = jnp.pad(pos, ((0, 0), (0, pad)))
    else:
        neg, pos = jax.lax.approx_max_k(outs, ef_buf, recall_target=stage2_rt)
    rows = jnp.take_along_axis(outi, pos, axis=1)
    ok = neg > -jnp.inf
    return jnp.where(ok, neg, -jnp.inf), jnp.where(ok, rows, -1)


def use_fused_adc_pool(n: int, m: int, k: int, ef_buf: int, qn: int) -> bool:
    """Whether the fused pool kernel should replace scores-scan +
    approx_max_k: TPU backend, production PQ shape (see adc_scan_auto's
    sublane note), enough rows to amortize, enough bins to cover ef_buf,
    and a large-enough auto tile that grid-step overhead doesn't dominate
    (wide LUTs at big Q can shrink the feasible tile below usefulness)."""
    if not is_tpu_backend():
        return False
    if m < 8 or m * k < 1024 or n < MIN_ROWS_POOL:
        return False
    qp = max(8, -(-qn // 8) * 8)
    if _auto_pool_tile(qp, m * k, None) is None:
        return False
    return (-(-n // 2048)) * 2 * _BINS >= ef_buf


def is_tpu_backend() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
