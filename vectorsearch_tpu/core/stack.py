"""Segment stacking: batch same-shape segments into one device call.

The reference fans out one async search per segment and merges on the way
back (fdb/FdbVectorIndex.java:417-470). On TPU, per-dispatch latency makes
that shape hostile; instead, segments with identical static shapes
(cap_pad, dim, M, K, R) stack into leading-axis-batched arrays:

  vectors  f32[S, N, D]   codes u8[S, N, M]   codebooks f32[S, M, K, sub]
  adjacency i32[S, N, R]  exists/alive bool[S, N]

so ALL sealed segments are searched by ONE vmapped XLA program and ALL
brute-force segments by one flattened matmul — 2-3 dispatches per query batch
regardless of segment count.

Stacks are cached keyed by the (seg_id, version) tuple of their members,
where version covers DATA mutations (appends, artifacts, compaction).
Tombstone/vacuum flips bump a separate flags_version, absorbed by
re-stacking only the [S, N] bool planes (refresh_flags) — a delete during
serving costs MBs, not a multi-GB vector restack.
Stacked arrays are snapshots (stacking copies), so in-flight queries keep
consistent data while segments mutate — the same snapshot-isolation story as
the per-segment device mirrors.
"""

from __future__ import annotations

import threading
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from vectorsearch_tpu.core.segment import Segment


def _pad_dim(a: jax.Array) -> jax.Array:
    """Zero-pads the trailing (feature) dim to a 128-lane multiple. Zero pads
    change neither dot products nor norms, so L2/cosine scores are exact —
    and the Pallas exact kernel runs its full-tile configs instead of the
    crippled non-lane-multiple fallback (d=96 measured ~10x slower)."""
    d = a.shape[-1]
    pad = (-d) % 128
    if pad == 0:
        return a
    widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
    return jnp.pad(a, widths)


class SealedStack:
    def __init__(self, segments: Sequence[Segment], lean: bool = False):
        """``lean=True`` (exact-mode stacks): only the row planes the raw-
        vector scan reads are stacked; PQ/graph planes become tiny dummies
        (never read, DCEd from the program — some segments may not even have
        them, pq_build_mode="skip_for_exact"). Lean stacks also lane-pad the
        vector dim (consumers pad q to match; see _pad_dim)."""
        self.segments = list(segments)
        self._lock = threading.Lock()
        self._flag_versions = [s.flags_version for s in segments]
        vecs = jnp.stack([s.vectors_dev for s in segments])
        self.vectors = _pad_dim(vecs) if lean else vecs
        self.exists = jnp.stack([s.exists_dev for s in segments])
        self.alive = jnp.stack([s.alive_dev for s in segments])
        s_count = len(segments)
        self._xn2 = None
        if lean:
            self.codes = jnp.zeros((s_count, 1, 1), jnp.uint8)
            self.codebooks = jnp.zeros((s_count, 1, 1, 1), jnp.float32)
            self.adjacency = jnp.full((s_count, 1, 1), -1, jnp.int32)
            self._adjacency_global = jnp.full((1, 1), -1, jnp.int32)
        else:
            self.codes = jnp.stack([s.codes_dev for s in segments])
            self.codebooks = jnp.stack([s.codebook_dev for s in segments])
            self.adjacency = jnp.stack([s.adjacency_dev for s in segments])
            self._adjacency_global = None

    def refresh_flags(self) -> None:
        """Re-stacks ONLY the bool flag planes when members' tombstone state
        moved (flags_version). Data planes are keyed by the data version in
        the cache key, so a delete/vacuum during serving costs a [S, N] bool
        restack (~MBs) instead of the multi-GB vector restack. Swaps are
        atomic attribute assignments: in-flight programs keep their
        snapshot."""
        current = [s.flags_version for s in self.segments]
        if current == self._flag_versions:
            return
        with self._lock:
            if current == self._flag_versions:
                return
            self.exists = jnp.stack([s.exists_dev for s in self.segments])
            self.alive = jnp.stack([s.alive_dev for s in self.segments])
            self._flag_versions = current

    @property
    def xn2(self):
        """Cached f32[S, N] squared norms: stacked from the members'
        per-segment cached planes (Segment.xn2_dev, themselves cached per
        device snapshot) — an [S, N] stack instead of the [S, N, D] reduce
        this used to pay per stack snapshot. Zero pad columns don't change
        norms, so the values are identical either way."""
        if self._xn2 is None:
            self._xn2 = jnp.stack([s.xn2_dev for s in self.segments])
        return self._xn2

    @property
    def adjacency_global(self):
        """Flattened adjacency with GLOBAL ids (row s*N+v): the union of the
        per-segment graphs as one disconnected graph, for unified search."""
        if self._adjacency_global is None:
            s_count, n, r = self.adjacency.shape
            offs = (jnp.arange(s_count, dtype=jnp.int32) * n)[:, None, None]
            self._adjacency_global = jnp.where(
                self.adjacency >= 0, self.adjacency + offs, -1
            ).reshape(s_count * n, r)
        return self._adjacency_global


class BruteStack:
    def __init__(self, segments: Sequence[Segment]):
        self.segments = list(segments)
        self.cap_pad = segments[0].cap_pad
        self._lock = threading.Lock()
        self._flag_versions = [s.flags_version for s in segments]
        # flattened: one pairwise matmul covers every row of every segment.
        # The SEGMENT-COUNT axis is padded to a power of two: every distinct
        # flattened length is its own XLA program, and under churn (rotations
        # adding PENDING segments) unpadded lengths forced a fresh ~5-40s
        # compile per rotation. Padded rows are alive=False -> idx -1 ->
        # filtered at the merge. The feature dim is lane-padded (_pad_dim) so
        # non-multiple dims keep the fused scan kernel fast.
        self._n_pad = 1
        while self._n_pad < len(segments):
            self._n_pad *= 2
        # segments allocate lane-padded [cap_pad, d_pad] planes
        # (segment.pad_lane), so _pad_dim is an identity here and the
        # single-segment case — every writer batch under churn rebuilds the
        # ACTIVE BruteStack — is ZERO-copy: the stack IS the device mirror.
        vecs = [_pad_dim(s.vectors_dev) for s in segments]
        if self._n_pad == 1:
            self.vectors = vecs[0]
            self.alive = segments[0].alive_dev
            self._xn2 = segments[0].xn2_dev
            return
        if self._n_pad > len(segments):
            cap, dim = vecs[0].shape
            extra = self._n_pad - len(segments)
            vecs.append(jnp.zeros((extra * cap, dim), vecs[0].dtype))
        self.vectors = jnp.concatenate(vecs, axis=0)
        self.alive = self._stack_alive()
        self._xn2 = None

    def _stack_alive(self) -> jax.Array:
        if self._n_pad == 1:
            return self.segments[0].alive_dev
        alive = [s.alive_dev for s in self.segments]
        if self._n_pad > len(self.segments):
            extra = self._n_pad - len(self.segments)
            alive.append(jnp.zeros(extra * self.cap_pad, bool))
        return jnp.concatenate(alive, axis=0)

    @property
    def xn2(self):
        """Cached f32[S_pad * cap] squared norms, concatenated from the
        members' cached planes (see SealedStack.xn2)."""
        if self._xn2 is None:
            parts = [s.xn2_dev for s in self.segments]
            if self._n_pad > len(self.segments):
                extra = self._n_pad - len(self.segments)
                parts.append(jnp.zeros(extra * self.cap_pad, jnp.float32))
            self._xn2 = jnp.concatenate(parts, axis=0)
        return self._xn2

    def refresh_flags(self) -> None:
        """Tombstone-only restack of the alive plane (see
        SealedStack.refresh_flags)."""
        current = [s.flags_version for s in self.segments]
        if current == self._flag_versions:
            return
        with self._lock:
            if current == self._flag_versions:
                return
            self.alive = self._stack_alive()
            self._flag_versions = current


class StackCache:
    """Caches stacks keyed by ((seg_id, version), ...)."""

    def __init__(self, max_entries: int = 8):
        self._lock = threading.Lock()
        self._sealed: dict[tuple, SealedStack] = {}
        self._brute: dict[tuple, BruteStack] = {}
        self._max = max_entries

    @staticmethod
    def _key(segments: Sequence[Segment]) -> tuple:
        return tuple((s.seg_id, s.version) for s in segments)

    def sealed(
        self, segments: Sequence[Segment], lean: bool = False
    ) -> SealedStack:
        key = ("sealed-lean" if lean else "sealed", self._key(segments))
        with self._lock:
            st = self._sealed.get(key)
        if st is not None:
            st.refresh_flags()
            return st
        st = SealedStack(segments, lean=lean)
        with self._lock:
            if len(self._sealed) >= self._max:
                self._sealed.clear()  # stacks rebuild cheaply from device arrays
            self._sealed[key] = st
        return st

    def brute(self, segments: Sequence[Segment]) -> BruteStack:
        key = ("brute", self._key(segments))
        with self._lock:
            st = self._brute.get(key)
        if st is not None:
            st.refresh_flags()
            return st
        st = BruteStack(segments)
        with self._lock:
            if len(self._brute) >= self._max:
                self._brute.clear()
            self._brute[key] = st
        return st
