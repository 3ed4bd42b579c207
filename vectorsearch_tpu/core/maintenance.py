"""MaintenanceService: vacuum, compaction planner, compaction executor
(reference: tasks/MaintenanceService.java:48-571).

- vacuum_segment: ratio-guarded physical removal of tombstoned rows' data,
  counter updates, last_vacuum_at stamp; a half-empty segment triggers the
  compaction planner (:88-217).
- find_compaction_candidates: composite score ageW*age + sizeW*size + fragW*frag
  over SEALED segments, greedy pick under an 80%-of-maxSegmentSize budget,
  honoring min/max segment counts and the min-fragmentation threshold
  (:430-529 — formulas ported verbatim).
- compact_segments: reserve a WRITING destination (invisible to search), copy
  live rows + payloads preserving gids, PQ+graph build + seal, then one atomic
  swap: register destination, drop sources, remap gid maps. Sources stay
  COMPACTING (searchable) throughout — no query downtime (:248-417).
  Deletes that land on a source row between copy and swap are re-applied to
  the destination row at swap time (the lock-based replacement for FDB's
  transaction conflicts).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

import numpy as np

from vectorsearch_tpu.config import VectorIndexConfig
from vectorsearch_tpu.core.store import VectorStore
from vectorsearch_tpu.core.tasks import FindCompactionCandidatesTask
from vectorsearch_tpu.types import SegmentState
from vectorsearch_tpu.utils.metrics import get_registry

LOG = logging.getLogger("vectorsearch_tpu.maintenance")


class MaintenanceService:
    def __init__(self, config: VectorIndexConfig, store: VectorStore,
                 build_service, maintenance_queue=None):
        self.config = config
        self.store = store
        self.build_service = build_service
        self.maintenance_queue = maintenance_queue

    def _refuse_for_foreign_writer(self, what: str) -> bool:
        """Cross-process safety gate: vacuum/compaction remap gids, so they
        REFUSE to run while another process holds a live writer lease — a
        concurrent foreign writer would race the remap and corrupt gid
        resolution (the reference's FDB transactions make the remap atomic,
        tasks/MaintenanceService.java:326-386; the planner re-discovers the
        work once the writer's lease expires or is released)."""
        foreign = self.store.live_foreign_writers()
        if not foreign:
            return False
        get_registry(self.config.metric_attributes).inc(
            "vectorsearch.maintenance.refused_foreign_writer",
            attrs={"op": what},
        )
        LOG.warning(
            "%s refused: %d live foreign writer lease(s) (e.g. %s)",
            what, len(foreign), foreign[0][:8],
        )
        return True

    @contextlib.contextmanager
    def _writer_slot(self, what: str):
        """Holds the (exclusive) writer lease for the duration of a
        gid-remapping op, so a foreign writer can't start mid-remap — the
        mirror image of add/delete refusing while maintenance holds the
        lease. Yields False (op must bail) when a live foreign writer exists
        or the lease can't be taken; releases on exit unless this process
        already held the lease (it is the writer running its own
        maintenance)."""
        if self.config.effective.writer_lease_ttl_ms <= 0:
            yield True
            return
        if self._refuse_for_foreign_writer(what):
            yield False
            return
        if self.store.concurrent_writers:
            # concurrent-writer mode: remaps need the EXCLUSIVE maintenance
            # slot (our own writer lease does not conflict with it). While
            # held, checkpoint_state writes full local state (registry
            # removals land), and pending cross-writer overlay deletes are
            # drained first so the remap sees every committed tombstone.
            if not self.store.try_acquire_writer_lease(maintenance=True):
                self._refuse_for_foreign_writer(what)
                yield False
                return
            self.store.maintenance_exclusive = True
            try:
                self.store.refresh()  # drain overlay deletes + peer WALs
                yield True
            finally:
                self.store.maintenance_exclusive = False
                self.store.release_writer_lease(maintenance_only=True)
            return
        held_before = self.store.holds_live_lease()
        if not held_before and not self.store.try_acquire_writer_lease():
            # lost the race to a writer between the check and the acquire
            self._refuse_for_foreign_writer(what)
            yield False
            return
        try:
            yield True
        finally:
            if not held_before:
                self.store.release_writer_lease()

    # ----------------------------------------------------------------- vacuum

    def vacuum_segment(self, seg_id: int, min_ratio: Optional[float] = None) -> int:
        """Removes tombstoned rows' data; returns number removed."""
        t0 = time.monotonic()
        metrics = get_registry(self.config.metric_attributes)
        cfg = self.config
        if min_ratio is None:
            min_ratio = cfg.effective.vacuum_min_deleted_ratio
        with self._writer_slot("vacuum") as ok:
            if not ok:
                return 0
            return self._vacuum_locked(seg_id, min_ratio, t0, metrics, cfg)

    def _vacuum_locked(self, seg_id, min_ratio, t0, metrics, cfg) -> int:
        removed = 0
        try:
            with self.store.lock:
                seg = self.store.segments.get(seg_id)
                if seg is None:
                    return 0
                live = seg.meta.count
                dead = seg.meta.deleted_count
                total = live + dead
                ratio = (dead / total) if total > 0 else 0.0
                if ratio < min_ratio:
                    LOG.debug(
                        "vacuum(%d): ratio %.3f < %.3f; skip", seg_id, ratio, min_ratio
                    )
                    return 0
                doomed = np.flatnonzero(
                    seg.exists_np[: seg.next_row] & ~seg.alive_np[: seg.next_row]
                )
                seg.remove_rows(doomed)
                removed = int(len(doomed))
                seg.meta.deleted_count = max(0, seg.meta.deleted_count - removed)
                seg.meta.last_vacuum_at_ms = cfg.effective.clock_ms()
                # NO device bundle re-upload: remove_rows queues the
                # exists/alive flips through the segment's packed incremental
                # flag transfer (one put, both planes), so vacuumed rows
                # leave flat-mode candidate pools on the next sync instead of
                # occupying ef_buf slots until compaction (ADVICE r3 #2).
                # Re-uploading the whole bundle here (r2 behavior) cost ~5 s
                # per 1M-row segment through the axon tunnel and collapsed
                # Deep10M churn serving to 32 QPS; the host arrays stay the
                # source of truth for checkpoints and compaction either way.
                #
                # NO full-segment checkpoint either (r5): write_segment on a
                # 1M-row segment is ~3.8 s of array copies UNDER THE STORE
                # LOCK — serving measured 0 QPS for the duration
                # (benchmarks/probe_vacuum_stall.py), which made every
                # vacuum window of the deep10m churn bench a dead window.
                # A tiny idempotent "vac" WAL record gives the same
                # durability (replayed over the last checkpoint on reopen,
                # and by reader processes on refresh); full checkpoints
                # still happen at seal, compaction, and close.
                if len(doomed):
                    self.store._wal_append_locked(
                        seg_id, {"op": "vac", "vids": doomed.astype(np.int64)}
                    )
                self.store.checkpoint_state()
                under_half = seg.meta.count < cfg.max_segment_size / 2
            self.store.notify_flag_sync([seg_id])  # off the query path
            metrics.inc("vectorsearch.vacuum.run")
            metrics.inc("vectorsearch.vacuum.removed", removed)
            # Half-empty after vacuum -> look for compaction partners (:200-216)
            if (
                under_half
                and cfg.effective.auto_find_compaction_candidates
                and self.maintenance_queue is not None
            ):
                self.maintenance_queue.enqueue_if_not_exists(
                    f"find-compaction-candidates:{seg_id}",
                    FindCompactionCandidatesTask(anchor_seg_id=seg_id),
                )
            return removed
        finally:
            metrics.record(
                "vectorsearch.vacuum.duration_ms", (time.monotonic() - t0) * 1000.0
            )

    # ---------------------------------------------------------------- planner

    def find_compaction_candidates(self, anchor_seg_id: int = -1) -> list[int]:
        cfg = self.config
        eff = cfg.effective
        max_size = cfg.max_segment_size
        max_segs = eff.compaction_max_segments
        min_segs = eff.compaction_min_segments
        min_frag = eff.compaction_min_fragmentation
        age_w = eff.compaction_age_bias_weight
        size_w = eff.compaction_size_bias_weight
        frag_w = eff.compaction_frag_bias_weight

        with self.store.lock:
            sealed = [
                (s.seg_id, s.meta.count, s.meta.deleted_count, s.meta.created_at_ms)
                for s in self.store.segments.values()
                if s.state == SegmentState.SEALED
            ]
        if len(sealed) < min_segs:
            return []

        min_created = min(s[3] for s in sealed)
        max_created = max(s[3] for s in sealed)
        min_count = min(s[1] for s in sealed)
        max_count = max(s[1] for s in sealed)
        age_range = max_created - min_created
        count_range = max_count - min_count

        scored = []
        for seg_id, count, deleted, created in sealed:
            age_score = 0.5 if age_range == 0 else (max_created - created) / age_range
            size_score = 0.5 if count_range == 0 else (max_count - count) / count_range
            total = count + deleted
            frag_score = 0.0 if total == 0 else deleted / total
            composite = age_w * age_score + size_w * size_score + frag_w * frag_score
            scored.append(((seg_id, count, deleted), composite))
        scored.sort(key=lambda t: -t[1])

        budget = int(max(1, round(0.8 * max_size)))
        total_rows = 0
        pick: list[int] = []
        # anchor first (if sealed)
        for (seg_id, count, _), _score in scored:
            if seg_id == anchor_seg_id:
                pick.append(seg_id)
                total_rows += count
                break
        for (seg_id, count, _), _score in scored:
            if seg_id in pick:
                continue
            if len(pick) >= max_segs:
                break
            pick.append(seg_id)
            total_rows += count
            if total_rows >= budget:
                break
        if len(pick) < min_segs:
            return []

        if min_frag > 0.0:
            total_live = sum(c for (sid, c, d), _ in scored if sid in pick)
            total_del = sum(d for (sid, c, d), _ in scored if sid in pick)
            avg_frag = 0.0 if (total_live + total_del) == 0 else total_del / (
                total_live + total_del
            )
            if avg_frag < min_frag:
                return []
        return pick

    def count_in_flight_compactions(self) -> int:
        with self.store.lock:
            return sum(
                1
                for s in self.store.segments.values()
                if s.state == SegmentState.COMPACTING
            )

    def mark_candidates_compacting(self, seg_ids: list[int]) -> bool:
        """Atomically flips all candidates SEALED->COMPACTING, or none
        (reference: tasks/MaintenanceWorker.java:120-155)."""
        with self._writer_slot("compaction") as ok:
            if not ok:
                return False
            return self._mark_candidates_locked(seg_ids)

    def _mark_candidates_locked(self, seg_ids: list[int]) -> bool:
        with self.store.lock:
            segs = []
            for sid in seg_ids:
                seg = self.store.segments.get(sid)
                if seg is None or seg.state != SegmentState.SEALED:
                    return False
                segs.append(seg)
            for seg in segs:
                seg.meta.state = SegmentState.COMPACTING
            self.store.checkpoint_state()
            return True

    # ------------------------------------------------------------- compaction

    def compact_segments(self, seg_ids: list[int]) -> Optional[int]:
        """Merges source segments into new SEALED segment(s); returns the
        first new segment id, or None if aborted. When the merged live rows
        exceed maxSegmentSize the destination SPLITS into multiple capped
        segments — an oversized single segment would meet the O(N^2) graph
        builder and break mesh cap-divisibility (the reference's FDB segments
        have no physical cap, so its single destination is safe there;
        tasks/MaintenanceService.java:254-271)."""
        with self._writer_slot("compaction") as ok:
            if not ok:
                # a writer appeared between the COMPACTING flip and execution:
                # revert sources so the planner can retry after lease expiry
                self._revert_compaction(seg_ids)
                return None
            return self._compact_with_lease(seg_ids)

    def _revert_compaction(
        self, seg_ids: list[int], dest_ids: Optional[list[int]] = None
    ) -> None:
        """Reverts sources COMPACTING->SEALED and discards unregistered
        WRITING destinations (invisible to search, so dropping them is safe)."""
        store = self.store
        with store.lock:
            for sid in seg_ids:
                seg = store.segments.get(sid)
                if seg is not None and seg.state == SegmentState.COMPACTING:
                    seg.meta.state = SegmentState.SEALED
            for dest_id in dest_ids or ():
                store.segments.pop(dest_id, None)
                store.storage.delete_segment(store.name, dest_id)
                store.storage.wal_reset(store.name, dest_id)
            store.checkpoint_state()

    def _compact_with_lease(self, seg_ids: list[int]) -> Optional[int]:
        t0 = time.monotonic()
        metrics = get_registry(self.config.metric_attributes)
        cfg = self.config
        store = self.store
        try:
            # 1) reserve destination(s) as WRITING (invisible to search
            #    :254-271). The planner's 80% budget keeps the merged live
            #    rows under maxSegmentSize in normal operation, but a manual
            #    request_compaction may exceed it — then the copy splits
            #    across ceil(total/cap) capped destinations.
            with store.lock:
                sources = []
                for sid in seg_ids:
                    seg = store.segments.get(sid)
                    if seg is None or seg.state != SegmentState.COMPACTING:
                        LOG.warning(
                            "compact: source %s not COMPACTING; abort", sid
                        )
                        return None
                    sources.append(seg)
                src_live = [
                    np.flatnonzero(
                        s.alive_np[: s.next_row] & (s.gids_np[: s.next_row] >= 0)
                    )
                    for s in sources
                ]
                total_live = sum(len(lv) for lv in src_live)
                n_dest = max(1, -(-total_live // cfg.max_segment_size))
                dests: list = []
                for _ in range(n_dest):
                    dest_id = store._alloc_segment_id_locked()
                    d = store._new_segment(dest_id, SegmentState.WRITING)
                    store.segments[dest_id] = d  # not in registry => invisible
                    dests.append(d)

                # 2) copy live rows + payloads in bulk appends, filling each
                #    destination to its cap before starting the next;
                #    per-dest parallel arrays record (gid, src loc, dest row)
                plan_gids = [[] for _ in dests]  # type: list[list[np.ndarray]]
                plan_src = [[] for _ in dests]  # packed (src_sid, vid)
                plan_dvid = [[] for _ in dests]
                di = 0
                for seg, live in zip(sources, src_live):
                    off = 0
                    while off < len(live):
                        dest = dests[di]
                        room = dest.remaining_capacity()
                        if room == 0:
                            di += 1
                            continue
                        take = live[off : off + room]
                        dvids = dest.append_rows(
                            seg.vectors_np[take],
                            [seg.payloads[i] for i in take],
                        )
                        plan_gids[di].append(seg.gids_np[take].copy())
                        plan_src[di].append(
                            (np.int64(seg.seg_id) << 32) | take.astype(np.int64)
                        )
                        plan_dvid[di].append(np.asarray(dvids, np.int64))
                        off += len(take)
                store.checkpoint_state()
            dest_ids = [d.seg_id for d in dests]

            # 3) build + seal destinations (PQ + graph; WRITING is buildable)
            for dest_id in dest_ids:
                self.build_service.build(dest_id)

            # 4) atomic swap: register dests, drop sources, remap gids;
            #    re-apply deletes that arrived on sources during the build
            #    (:391-414) — all through the native map's batch API
            with store.lock:
                if store.live_foreign_writers():
                    # Defense-in-depth (ADVICE r2): we hold the lease for the
                    # whole compaction, so this only fires if our lease lapsed
                    # (keeper death / long process pause) and a writer slipped
                    # in. Abort rather than swap over its mutations.
                    self._refuse_for_foreign_writer("compaction")
                    self._revert_compaction(seg_ids, dest_ids=dest_ids)
                    return None
                for di, dest in enumerate(dests):
                    if not plan_gids[di]:
                        continue
                    gids_arr = np.concatenate(plan_gids[di])
                    src_arr = np.concatenate(plan_src[di])
                    dvid_arr = np.concatenate(plan_dvid[di])
                    current = store.gid_map.get_batch(gids_arr)
                    stale = current != src_arr  # deleted/remapped during build
                    if stale.any():
                        dead = dvid_arr[stale]
                        dest.alive_np[dead] = False
                        dest.gids_np[dead] = -1
                        dest.meta.count -= int(stale.sum())
                        dest.meta.deleted_count += int(stale.sum())
                    ok = ~stale
                    store.gid_map.put_batch(
                        gids_arr[ok],
                        (np.int64(dest.seg_id) << 32) | dvid_arr[ok],
                    )
                    dest.gids_np[dvid_arr[ok]] = gids_arr[ok]
                for dest in dests:
                    dest.invalidate_device()
                    store.registry.append(dest.seg_id)
                for seg in sources:
                    if seg.seg_id in store.registry:
                        store.registry.remove(seg.seg_id)
                    store.segments.pop(seg.seg_id, None)
                    store.storage.delete_segment(store.name, seg.seg_id)
                    # drop the source's logs too (its overlay delete log
                    # would otherwise replay onto a future segment reusing
                    # the id — ids never recycle, but debris is debris)
                    store.storage.wal_reset(store.name, seg.seg_id)
                    store.storage.wal_reset(
                        store.name, seg.seg_id + store._OVERLAY_BASE
                    )
                for dest_id in dest_ids:
                    store.checkpoint_segment(dest_id)
                store.checkpoint_state()
            for dest in dests:
                dest.warm_device()  # upload here, not on the next query path
            metrics.inc("vectorsearch.compaction.run")
            LOG.info("compacted %s -> %s", seg_ids, dest_ids)
            return dest_ids[0]
        finally:
            metrics.record(
                "vectorsearch.compaction.duration_ms",
                (time.monotonic() - t0) * 1000.0,
            )
