"""SegmentBuildService: the sealer (reference: tasks/SegmentBuildService.java:51-393).

Builds a PENDING/WRITING segment into SEALED form:
  1. guard: only PENDING/WRITING are built; any other state is a no-op
     (idempotence — re-running build on a SEALED segment is safe, :85-103)
  2. read all written rows (tombstoned rows included, like the reference which
     encodes every VectorRecord in the range, :159-172)
  3. train the PQ codebook (k-means, 5 iters, seed from config; a training
     failure raises so the task queue retries, :174-185)
  4. encode PQ codes + build the neighbor graph (alpha<=1 -> kNN edges,
     else batch Vamana; degree clamped to n-1, :204-209)
  5. attach artifacts to the device bundle + persist via storage in one shot
     (the chunked-txn persist loop of the reference collapses to an atomic
     array write here, :217-323)
  6. seal: state -> SEALED; empty segments get a zero codebook (:143-157)

All heavy compute (k-means, encode, graph build) runs as batched XLA programs
on the accelerator; only bookkeeping happens on host.
"""

from __future__ import annotations

import logging
import threading
import time

import jax
import numpy as np

from vectorsearch_tpu.config import VectorIndexConfig
from vectorsearch_tpu.core.store import VectorStore
from vectorsearch_tpu.ops import graph as graph_ops
from vectorsearch_tpu.ops import pq as pq_ops
from vectorsearch_tpu.types import SegmentState
from vectorsearch_tpu.utils.metrics import get_registry
from vectorsearch_tpu.utils.metrics import span as metrics_span

LOG = logging.getLogger("vectorsearch_tpu.build")


class SegmentBuildService:
    # One device executes one build's kernels at a time anyway; serializing
    # device-heavy builds PER DEVICE avoids N threads racing to compile the
    # same kernels (first-compile is ~40s) and blowing task leases, while
    # letting builds of segments placed on DIFFERENT chips (round_robin
    # placement) overlap. Worker threads still overlap claim/IO/host work.
    _device_locks: dict = {}
    _locks_guard = threading.Lock()

    @classmethod
    def _compute_lock_for(cls, device) -> threading.Lock:
        key = "default" if device is None else repr(device)
        with cls._locks_guard:
            return cls._device_locks.setdefault(key, threading.Lock())

    def __init__(self, config: VectorIndexConfig, store: VectorStore):
        self.config = config
        self.store = store

    def build(self, seg_id: int) -> None:
        t0 = time.monotonic()
        metrics = get_registry(self.config.metric_attributes)
        with self.store.lock:
            seg = self.store.segments.get(seg_id)
            device = seg.device if seg is not None else None
        try:
            # OTel span parity: vectorsearch.build (SegmentBuildService.java:75)
            with metrics_span("vectorsearch.build", {"segment": seg_id}):
                with SegmentBuildService._compute_lock_for(device):
                    self._build_inner(seg_id)
            metrics.inc("vectorsearch.build.count")
        finally:
            metrics.record(
                "vectorsearch.build.duration_ms", (time.monotonic() - t0) * 1000.0
            )

    def _build_inner(self, seg_id: int) -> None:
        cfg = self.config
        with self.store.lock:
            seg = self.store.segments.get(seg_id)
            if seg is None:
                LOG.debug("build(%d): segment missing; skip", seg_id)
                return
            if seg.state not in (SegmentState.PENDING, SegmentState.WRITING):
                LOG.debug("build(%d): state %s not buildable; skip", seg_id, seg.state)
                return
            n_rows = seg.next_row

        m, k, sub = cfg.pq_m, cfg.pq_k, cfg.sub_dim

        if n_rows == 0:
            # empty-segment build: zero codebook + SEALED (reference :116-120,143-157)
            codes = np.zeros((seg.cap_pad, m), np.uint8)
            codebook = np.zeros((m, k, sub), np.float32)
            adjacency = np.full((seg.cap_pad, cfg.graph_degree), -1, np.int32)
            self._seal(seg_id, codes, codebook, adjacency)
            return

        if cfg.pq_build_mode == "skip_for_exact":
            # Exact mode never reads codes/codebook/adjacency on the query
            # path: sealing is a metadata flip + checkpoint. Zero-column
            # codes + adjacency planes mark the segment PQ-less/graph-less
            # (a PQ-scanning process falls back to the exact pool — see
            # index._pqless; config validated the mode combination).
            self._seal(
                seg_id,
                np.zeros((seg.cap_pad, 0), np.uint8),
                np.zeros((0, 0, 0), np.float32),
                np.zeros((seg.cap_pad, 0), np.int32),
            )
            return

        # Snapshot row data (tombstones included — parity with reference which
        # builds artifacts for every stored VectorRecord).
        with self.store.lock:
            # logical dim: PQ subspace splits (m x sub = dim) must see the
            # unpadded width; the graph build is distance-exact either way
            vectors = np.array(seg.vectors_np[:, : seg.dim])  # [cap_pad, D]
            exists = np.array(seg.exists_np)

        key = jax.random.PRNGKey(cfg.pq_train_seed)
        if cfg.mesh is not None:
            # Distributed build: k-means assign local / update psum-reduced,
            # encode row-sharded (parallel/mesh.py; reference analogue: the
            # chunked single-process trainer, tasks/SegmentBuildService.java).
            from vectorsearch_tpu.parallel import mesh as mesh_ops

            xs = mesh_ops.shard_rows(cfg.mesh, jax.numpy.asarray(vectors))
            ex = mesh_ops.shard_rows(cfg.mesh, jax.numpy.asarray(exists))
            codebook = mesh_ops.sharded_pq_train(
                cfg.mesh, m, k, cfg.pq_train_iters
            )(xs, ex, key)
            if not bool(np.all(np.isfinite(np.asarray(codebook)))):
                raise RuntimeError(
                    f"PQ training failed for segment {seg_id} (m={m}, k={k})"
                )
            codes = mesh_ops.sharded_pq_encode(cfg.mesh)(xs, codebook, ex)
            # graph build stays single-program (adjacency is only used by the
            # graph search mode, which mesh excludes; kept for artifact parity)
            xs = jax.numpy.asarray(vectors)
            ex = jax.numpy.asarray(exists)
        else:
            dev = cfg.device
            xs = jax.device_put(vectors, dev) if dev else jax.numpy.asarray(vectors)
            ex = jax.device_put(exists, dev) if dev else jax.numpy.asarray(exists)
            codebook = pq_ops.pq_train(
                xs, ex, m=m, k=k, iters=cfg.pq_train_iters, key=key
            )
            if not bool(np.all(np.isfinite(np.asarray(codebook)))):
                # fail the build so the queue retries (reference :174-185)
                raise RuntimeError(
                    f"PQ training failed for segment {seg_id} (m={m}, k={k})"
                )
            codes = pq_ops.pq_encode(xs, codebook, ex)

        if (
            cfg.graph_build_mode == "skip_for_flat"
            and cfg.sealed_search_mode in ("flat", "exact")
        ):
            # Flat/exact search never reads adjacency: a zero-column plane
            # marks the segment as graph-less (queries requesting traversal
            # modes fall back to the pool; see index._query_batch).
            self._seal(
                seg_id, np.array(codes), np.array(codebook),
                np.zeros((seg.cap_pad, 0), np.int32),
            )
            return

        degree = max(0, min(cfg.graph_degree, max(0, n_rows - 1)))
        l_build = max(degree, cfg.graph_build_breadth)
        if degree == 0:
            adjacency = np.full((seg.cap_pad, cfg.graph_degree), -1, np.int32)
        else:
            adj = graph_ops.build_graph(
                xs, ex, degree=degree, l_build=l_build, alpha=cfg.graph_alpha
            )
            adjacency = np.asarray(adj)
            if degree < cfg.graph_degree:
                adjacency = np.pad(
                    adjacency,
                    ((0, 0), (0, cfg.graph_degree - degree)),
                    constant_values=-1,
                )

        # np.array copies: np.asarray of a jax Array is a read-only view,
        # and vacuum mutates these host arrays in place
        self._seal(seg_id, np.array(codes), np.array(codebook), np.array(adjacency))

    def _seal(self, seg_id: int, codes, codebook, adjacency) -> None:
        with self.store.lock:
            seg = self.store.segments.get(seg_id)
            if seg is None:
                return
            if seg.state not in (SegmentState.PENDING, SegmentState.WRITING):
                return  # raced with another builder; builds are idempotent
            seg.attach_build_artifacts(codes, codebook, adjacency)
            seg.meta.state = SegmentState.SEALED
            self.store.checkpoint_segment(seg_id)
            self.store.checkpoint_state()
        LOG.debug("sealed segment %d", seg_id)
