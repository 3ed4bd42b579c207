"""VectorIndex: the public entry point + query engine
(reference: api/VectorIndex.java:32-200, fdb/FdbVectorIndex.java:62-1080).

Query path (parity with fdb/FdbVectorIndex.java:351-479):
- snapshot the segment registry
- prefetch codebooks for SEALED segments (sync in test mode)
- per segment, dispatch by state: ACTIVE/PENDING -> brute force;
  SEALED/COMPACTING -> PQ-ADC seed scan + graph traversal + exact re-rank;
  WRITING -> invisible
- per-segment fan-in cap = max(k, k*oversample); merge all segments by score
  descending, truncate to k

Queries are batched (Q at once) end to end — `query_batch` is the engine and
`query` the Q=1 wrapper; batching across concurrent callers is the TPU
throughput lever the reference's per-query async chains can't express.

Auto-tune (ported verbatim from fdb/FdbVectorIndex.java:772-784):
  baseEf    = max(efSearch, k*max(1, perSegmentLimitMultiplier))
  scale     = max(1, round(sqrt(max(1, nCodes)/1000)))
  tunedEf   = min(maxExplore, max(baseEf, min(nCodes, baseEf*scale)))
  tunedBeam = max(1, min(nCodes, max(beamWidth, min(64, ceil(sqrt(nCodes))))))
"""

from __future__ import annotations

import logging
import math
import threading
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vectorsearch_tpu.config import VectorIndexConfig
from vectorsearch_tpu.core.build import SegmentBuildService
from vectorsearch_tpu.core.caches import SegmentCaches
from vectorsearch_tpu.core.maintenance import MaintenanceService
from vectorsearch_tpu.core.segment import Segment
from vectorsearch_tpu.core.store import VectorStore
from vectorsearch_tpu.core.tasks import (
    CompactTask,
    FindCompactionCandidatesTask,
    GlobalBuildQueueAdapter,
    GlobalMaintenanceQueueAdapter,
    MaintenanceWorkerPool,
    SegmentBuildWorkerPool,
    TaskQueue,
    VacuumTask,
)
from vectorsearch_tpu.ops import pq as pq_ops
from vectorsearch_tpu.ops import topk as topk_ops
from vectorsearch_tpu.ops import traversal as traversal_ops
from vectorsearch_tpu.params import Mode, SearchParams, SeedStrategy
from vectorsearch_tpu.results import SearchResult
from vectorsearch_tpu.types import BRUTE_FORCE_STATES, GRAPH_STATES, SegmentState
from vectorsearch_tpu.utils.metrics import get_registry

LOG = logging.getLogger("vectorsearch_tpu.index")


def _bucket(n: int, lo: int = 16) -> int:
    """Rounds up to a power of two for jit shape reuse."""
    b = lo
    while b < n:
        b *= 2
    return b


class VectorIndex:
    """Use `VectorIndex.create_or_open(config)`; call `close()` when done."""

    def __init__(self, config: VectorIndexConfig):
        self.config = config
        self._beam_warned = False
        self._closed = False
        self._metrics = get_registry()

        gq = config.global_task_queue_config
        if gq is not None:
            # Global mode: producer-only adapters; NO local queues or pools
            # (reference: createOrOpenWithGlobalQueues :157-176).
            self.build_queue = GlobalBuildQueueAdapter(gq.build_queue, config.name)
            self.maintenance_queue = GlobalMaintenanceQueueAdapter(
                gq.maintenance_queue, config.name
            )
            self._owns_queues = False
        else:
            eff = config.effective
            self.build_queue = TaskQueue(
                f"{config.name}/tasks", default_ttl_s=eff.default_ttl_s,
                default_throttle_s=eff.default_throttle_s,
            )
            self.maintenance_queue = TaskQueue(
                f"{config.name}/tasks/maint", default_ttl_s=eff.default_ttl_s,
                default_throttle_s=eff.default_throttle_s,
            )
            self._owns_queues = True

        self.store = VectorStore(config, self.build_queue)
        self.store.create_or_open()
        self.caches = SegmentCaches(self.store)
        self.build_service = SegmentBuildService(config, self.store)
        self.maintenance = MaintenanceService(
            config, self.store, self.build_service, self.maintenance_queue
        )

        self._build_pool: Optional[SegmentBuildWorkerPool] = None
        self._maint_pool: Optional[MaintenanceWorkerPool] = None
        if gq is None:
            eff = config.effective
            if eff.local_worker_threads > 0:
                self._build_pool = SegmentBuildWorkerPool(
                    self.build_queue, self.build_service
                )
                self._build_pool.start(eff.local_worker_threads)
            if eff.local_maintenance_worker_threads > 0:
                self._maint_pool = MaintenanceWorkerPool(
                    self.maintenance_queue, self.dispatch_maintenance
                )
                self._maint_pool.start(eff.local_maintenance_worker_threads)

    # ------------------------------------------------------------- lifecycle

    @classmethod
    def create_or_open(cls, config: VectorIndexConfig) -> "VectorIndex":
        return cls(config)

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        if self._build_pool:
            self._build_pool.close()
        if self._maint_pool:
            self._maint_pool.close()
        if self._owns_queues:
            self.build_queue.close()
            self.maintenance_queue.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def checkpoint(self) -> None:
        """Full durability flush (segments + control state)."""
        self.store.checkpoint_all()

    # ---------------------------------------------------------------- ingest

    def add(self, embedding, payload: Optional[bytes] = None) -> int:
        gids = self.store.add_batch(np.asarray(embedding, np.float32)[None, :],
                                    [payload])
        return gids[0]

    def add_all(self, embeddings, payloads: Optional[Sequence] = None) -> list[int]:
        return self.store.add_batch(np.asarray(embeddings, np.float32), payloads)

    # ---------------------------------------------------------------- delete

    def delete(self, gid: int) -> None:
        self.delete_all([gid])

    def delete_all(self, gids) -> None:
        if gids is None or len(gids) == 0:
            return
        affected = self.store.delete_batch(gids)
        for seg_id in set(affected):
            self._schedule_vacuum_if_needed(seg_id)

    def _schedule_vacuum_if_needed(self, seg_id: int) -> None:
        """Ratio + cooldown gate (reference: fdb/FdbVectorIndex.java:552-608)."""
        eff = self.config.effective
        with self.store.lock:
            seg = self.store.segments.get(seg_id)
            if seg is None:
                return
            live = seg.meta.count
            dead = seg.meta.deleted_count
            total = live + dead
            ratio = dead / total if total > 0 else 0.0
            if ratio < eff.vacuum_min_deleted_ratio:
                self._metrics.inc("vectorsearch.maintenance.vacuum.skipped")
                return
            now_ms = eff.clock_ms()
            if (
                eff.vacuum_cooldown_s > 0
                and seg.meta.last_vacuum_at_ms > 0
                and (now_ms - seg.meta.last_vacuum_at_ms)
                < eff.vacuum_cooldown_s * 1000.0
            ):
                self._metrics.inc("vectorsearch.maintenance.vacuum.skipped")
                return
        self.maintenance_queue.enqueue_if_not_exists(
            f"vacuum-if-needed:{seg_id}", VacuumTask(seg_id)
        )
        self._metrics.inc("vectorsearch.maintenance.vacuum.scheduled")

    # ----------------------------------------------------------- maintenance

    def request_compaction(self, seg_ids) -> None:
        """Idempotent, order-invariant enqueue
        (reference: fdb/FdbVectorIndex.java:531-543)."""
        ids = sorted(int(s) for s in seg_ids)
        self.maintenance_queue.enqueue_if_not_exists(
            f"compact:{ids}", CompactTask(tuple(ids))
        )

    def dispatch_maintenance(self, task) -> None:
        """Maintenance task dispatcher (reference: tasks/MaintenanceWorker.java:62-95)."""
        if isinstance(task, VacuumTask):
            self.maintenance.vacuum_segment(task.seg_id, task.min_deleted_ratio)
        elif isinstance(task, FindCompactionCandidatesTask):
            max_cc = self.config.effective.max_concurrent_compactions
            if max_cc <= 0:
                return  # compaction disabled
            if self.maintenance.count_in_flight_compactions() >= max_cc:
                return  # throttled (reference :106-110)
            ids = self.maintenance.find_compaction_candidates(task.anchor_seg_id)
            if not ids:
                return
            if not self.maintenance.mark_candidates_compacting(ids):
                return
            self.request_compaction(ids)
        elif isinstance(task, CompactTask):
            self.maintenance.compact_segments(list(task.seg_ids))
        else:
            raise ValueError(f"unknown maintenance task: {task!r}")

    def await_indexing_complete(self, timeout: Optional[float] = None) -> bool:
        return self.build_queue.await_queue_empty(timeout)

    # ------------------------------------------------------------ inspection

    def get_codebook_cache_size(self) -> int:
        return self.caches.codebook_cache_size()

    def get_adjacency_cache_size(self) -> int:
        return self.caches.adjacency_cache_size()

    def resolve_ids(self, gids) -> list[tuple[int, int]]:
        return [self.store.resolve_gid(g) for g in gids]

    # ----------------------------------------------------------------- query

    def query(self, q, k: int, params: Optional[SearchParams] = None) -> list[SearchResult]:
        return self.query_batch(np.asarray(q, np.float32)[None, :], k, params)[0]

    def query_batch(
        self, qs, k: int, params: Optional[SearchParams] = None
    ) -> list[list[SearchResult]]:
        t0 = time.monotonic()
        qs = np.asarray(qs, np.float32)
        if qs.ndim != 2 or qs.shape[1] != self.config.dimension:
            raise ValueError(
                f"query dimension mismatch: expected {self.config.dimension}"
            )
        if params is None:
            params = SearchParams.defaults(k, self.config.oversample)
        if params.mode == Mode.BEAM and not self._beam_warned:
            self._beam_warned = True
            LOG.warning(
                "SearchParams.Mode.BEAM is deprecated; prefer BEST_FIRST "
                "(this warning is logged once)"
            )

        segments = self.store.snapshot_segments()
        per_seg_limit = max(k, k * max(1, self.config.oversample))

        sealed = [s for s in segments if s.state in GRAPH_STATES]
        if self.config.effective.prefetch_codebooks_enabled and sealed:
            # In-process prefetch is synchronous either way; the sync flag is
            # honored for API parity (reference :377-416).
            self.caches.prefetch_codebooks(sealed)

        qd = jnp.asarray(qs)
        per_segment: list[tuple[np.ndarray, np.ndarray, list]] = []
        nq = qs.shape[0]
        for seg in segments:
            if seg.state in BRUTE_FORCE_STATES:
                res = self._search_brute_force(qd, seg, per_seg_limit)
            elif seg.state in GRAPH_STATES:
                res = self._search_sealed(qd, qs, seg, k, per_seg_limit, params)
            else:  # WRITING: invisible (reference :646-649)
                continue
            if res is not None:
                per_segment.append(res)

        results: list[list[SearchResult]] = [[] for _ in range(nq)]
        if per_segment:
            for qi in range(nq):
                pool = []
                for scores, dists, rows in per_segment:
                    for sc, di, (seg_id, vid) in zip(
                        scores[qi], dists[qi], rows[qi]
                    ):
                        if vid < 0:
                            continue
                        pool.append((float(sc), float(di), seg_id, int(vid)))
                pool.sort(key=lambda t: -t[0])
                out = []
                for sc, di, seg_id, vid in pool:
                    gid = self.store.gid_for(seg_id, vid)
                    if gid is None:
                        continue  # deleted concurrently / no mapping
                    seg = self.store.segments.get(seg_id)
                    payload = seg.payloads[vid] if seg is not None else None
                    out.append(
                        SearchResult(gid=gid, score=sc, distance=di, payload=payload)
                    )
                    if len(out) >= k:
                        break
                results[qi] = out

        dur_ms = (time.monotonic() - t0) * 1000.0
        self._metrics.inc("vectorsearch.query.count", nq)
        self._metrics.record("vectorsearch.query.duration_ms", dur_ms)
        self._metrics.record("vectorsearch.query.segments_searched", len(per_segment))
        self._metrics.record(
            "vectorsearch.query.results_returned",
            float(np.mean([len(r) for r in results])) if results else 0.0,
        )
        return results

    # -- brute force path (reference :660-725) -------------------------------

    def _search_brute_force(self, qd, seg: Segment, limit: int):
        if seg.next_row == 0:
            return None
        scores, dists, idx = topk_ops.brute_force_topk(
            qd, seg.vectors_dev, seg.alive_dev, limit, self.config.metric
        )
        idx = np.asarray(idx)
        rows = [[(seg.seg_id, v) for v in idx[qi]] for qi in range(idx.shape[0])]
        return np.asarray(scores), np.asarray(dists), rows

    # -- sealed path (reference :730-837) ------------------------------------

    def _search_sealed(self, qd, qs, seg: Segment, k: int, limit: int,
                       params: SearchParams):
        if seg.codes_np is None or seg.codebook_np is None:
            # Not yet built (shouldn't happen for SEALED) — fall back to brute force.
            return self._search_brute_force(qd, seg, limit)
        n_codes = int(np.count_nonzero(seg.exists_np[: seg.next_row]))
        if n_codes == 0:
            return None

        t_pq = time.monotonic()
        codebook = self.caches.get_codebook(seg)
        codes = seg.codes_dev
        adjacency = self.caches.get_adjacency(seg)
        exists = seg.exists_dev
        alive = seg.alive_dev

        # --- auto-tune (verbatim formulas, reference :772-784) ---
        base_ef = max(params.ef_search, k * max(1, params.per_segment_limit_multiplier))
        scale = int(max(1, round(math.sqrt(max(1, n_codes) / 1000.0))))
        tuned_ef = min(params.max_explore, max(base_ef, min(n_codes, base_ef * scale)))
        tuned_beam = max(
            1,
            min(n_codes, max(params.beam_width, min(64, math.ceil(math.sqrt(n_codes))))),
        )

        lut = pq_ops.build_lut(qd, codebook)
        approx = pq_ops.adc_scan(lut, codes, exists)
        self._metrics.record(
            "vectorsearch.query.pq_scan_ms", (time.monotonic() - t_pq) * 1000.0
        )

        # --- seeds: top-beam approx (+ deterministic diversified pivots) ---
        t_graph = time.monotonic()
        beam_buf = _bucket(tuned_beam, lo=8)
        neg_seed_d, seed_idx = jax.lax.top_k(-approx, min(beam_buf, seg.cap_pad))
        seed_idx = seed_idx.astype(jnp.int32)
        seed_d = -neg_seed_d
        seed_idx = jnp.where(jnp.isfinite(seed_d), seed_idx, -1)

        if params.seed_strategy == SeedStrategy.RANDOM_PIVOTS and n_codes > tuned_beam:
            # Deterministic pivot seeds (reference :804-812 uses
            # (segId<<21) ^ bits(lut[0][0]); we seed the same way but draw row
            # ids directly instead of ranks in the approx-sorted order).
            lut00 = float(np.asarray(lut[0, 0, 0]))
            seed_val = ((seg.seg_id << 21) ^ np.float64(lut00).view(np.int64).item()) & 0xFFFFFFFF
            rnd = np.random.RandomState(seed_val)
            pivots = min(params.pivots, n_codes - tuned_beam)
            exist_rows = np.flatnonzero(seg.exists_np[: seg.next_row])
            pick = exist_rows[rnd.randint(0, len(exist_rows), size=pivots)]
            piv_idx = jnp.broadcast_to(
                jnp.asarray(pick, jnp.int32)[None, :], (qs.shape[0], pivots)
            )
            piv_d = pq_ops.adc_lookup(lut, codes[piv_idx])
            seed_idx = jnp.concatenate([seed_idx, piv_idx], axis=1)
            seed_d = jnp.concatenate([seed_d, piv_d], axis=1)

        ef_buf = min(_bucket(max(tuned_ef, k)), seg.cap_pad)
        beam_buf = min(beam_buf, ef_buf)
        if params.mode == Mode.BEST_FIRST:
            max_steps, min_steps, refine = ef_buf, 0, True
        else:  # legacy BEAM (reference :841-903)
            max_steps = max(params.max_iters, params.min_hops)
            min_steps = params.min_hops
            refine = params.refine_frontier

        cand_idx, cand_d = traversal_ops.graph_expand(
            lut, codes, adjacency, exists, seed_idx, seed_d,
            jnp.int32(tuned_ef), jnp.int32(tuned_beam),
            ef_buf=ef_buf, beam_buf=beam_buf,
            max_steps=max_steps, min_steps=min_steps, refine_frontier=refine,
        )
        self._metrics.record(
            "vectorsearch.query.graph_traversal_ms",
            (time.monotonic() - t_graph) * 1000.0,
        )

        # --- exact re-rank; deleted rows dropped (reference :970-1046) ---
        t_rr = time.monotonic()
        scores, dists, idx = traversal_ops.exact_rerank(
            qd, seg.vectors_dev, alive, cand_idx, min(limit, ef_buf),
            self.config.metric,
        )
        self._metrics.record(
            "vectorsearch.query.rerank_ms", (time.monotonic() - t_rr) * 1000.0
        )
        idx = np.asarray(idx)
        rows = [[(seg.seg_id, v) for v in idx[qi]] for qi in range(idx.shape[0])]
        return np.asarray(scores), np.asarray(dists), rows
