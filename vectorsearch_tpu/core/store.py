"""VectorStore: segment lifecycle + ingest engine
(reference: fdb/FdbVectorStore.java:41-767).

Owns the mutable index state: the segment registry, the ACTIVE segment with
strict-cap rotation, the monotonic gid counter, and the gid<->(segId,vecId)
maps. All mutations serialize on one RLock — the host-side single-writer
replacement for FDB transactions; queries snapshot the segment list under the
lock and then run lock-free on immutable device arrays.

Rotation semantics (parity-critical; reference :425-539):
- On write entry, if the ACTIVE segment has zero remaining capacity, rotate
  first (ACTIVE->PENDING, create next ACTIVE, registry entry, enqueue
  "build-segment:<id>" atomically) and continue writing into the new ACTIVE.
- After writes, if count >= maxSegmentSize, rotate immediately — so a full
  segment never stays ACTIVE (strict cap).

Deletes are tombstones grouped by segment: flip alive, count--, deleted++,
clear both gid mappings (reference :276-423).
"""

from __future__ import annotations

import logging
import os
import threading
import time
from typing import Dict, Optional

import numpy as np

from vectorsearch_tpu.config import VectorIndexConfig
from vectorsearch_tpu.core.segment import Segment
from vectorsearch_tpu.native import GidMap, pack_loc, unpack_loc
from vectorsearch_tpu.core.tasks import BuildTask
from vectorsearch_tpu.types import (
    ConcurrentWriterError,
    IndexMeta,
    SegmentMeta,
    SegmentState,
)

LOG = logging.getLogger("vectorsearch_tpu.store")


class VectorStore:
    def __init__(self, config: VectorIndexConfig, build_queue):
        self.config = config
        self.storage = config.storage
        self.name = config.name
        self.build_queue = build_queue
        self.lock = threading.RLock()

        self.segments: Dict[int, Segment] = {}
        self.registry: list[int] = []  # live segment ids (segmentsIndex analogue)
        self.current_segment: int = 0
        self.max_segment_id: int = 0
        self.next_gid: int = 0
        # gid -> packed (segId << 32 | vecId); native C++ open-addressing map
        # (vectorsearch_tpu/native.py). The reverse direction lives in each
        # segment's gids_np array — no second map needed.
        self.gid_map = GidMap(1024)
        # Cross-process writer lease: this process's identity, heartbeated in
        # storage on every mutation (at most every ttl/2). Maintenance in a
        # DIFFERENT process refuses gid-remapping work (vacuum/compaction)
        # while a foreign lease is live — the detect-and-refuse analogue of
        # the reference's transactional gid remaps
        # (tasks/MaintenanceService.java:326-386).
        import uuid

        self.owner_id = uuid.uuid4().hex
        self._lease_written_ms = 0
        self._lease_mu = threading.Lock()  # serializes lease writes vs keeper
        self._lease_keeper: Optional[threading.Thread] = None
        self._lease_stop = threading.Event()
        # Per-segment count of WAL records already applied to local arrays —
        # our own appends count too, so refresh()'s delta sync is a natural
        # no-op for mutations this process made itself. The txid of the last
        # applied record guards against count collisions after a foreign
        # checkpoint reset the log (old 2 records vs new 2 records).
        self._wal_applied: Dict[int, int] = {}
        self._wal_last_txid: Dict[int, Optional[str]] = {}
        self._wal_seq = 0
        # Background flag-sync: mutations queue packed alive/exists flips on
        # the segment; without this thread the ~25 ms host->device put lands
        # on the NEXT query batch's critical path (r3 deep10m residual:
        # churn-bound QPS scaled with writer rate). Mutators notify the
        # syncer, which applies seg.sync_device() off the serving path —
        # queries arriving first still sync inline (idempotent, dev-locked).
        self._flag_dirty: set[int] = set()
        self._flag_cv = threading.Condition()
        self._flag_thread: Optional[threading.Thread] = None
        # Last time a query touched this store (monotonic; see note_query):
        # gates the syncer's eager mode — backlog only hurts when someone
        # is actually serving.
        self._last_query_monotonic = 0.0
        # Hook the index installs to pre-warm query-program shapes when the
        # searchable segment SET changes (rotation here, foreign changes via
        # refresh): every distinct set shape is a fresh XLA program
        # (~20-40 s through the axon tunnel), and without warming the first
        # query after a change eats the compile on its latency path (r4
        # probe_cluster_churn saw 0.8k-QPS windows from exactly this).
        self.on_shapes_changed = None
        # Concurrent-writer mode (writer_conflict_policy="concurrent"): gids
        # are drawn from a shared transactional counter in storage, allocated
        # in blocks; [_gid_next, _gid_block_end) is this process's unused
        # remainder of the current block.
        self._gid_block_end = 0
        # True while maintenance holds the exclusive all-writers slot (set by
        # MaintenanceService._writer_slot): checkpoint_state then writes the
        # full local state verbatim (registry removals included) instead of
        # the concurrent-mode merge, which is add-only.
        self.maintenance_exclusive = False

    @property
    def concurrent_writers(self) -> bool:
        eff = self.config.effective
        return (
            eff.writer_conflict_policy == "concurrent"
            and eff.writer_lease_ttl_ms > 0
        )

    def owns_segment(self, seg: Segment) -> bool:
        """True when this process created the segment (meta stamped with our
        owner_id at creation). Ownership gates which segments we append to,
        whose lifecycle flips we treat as locally authoritative in refresh(),
        and whose metas win the concurrent-mode state merge."""
        return seg.meta.owner == self.owner_id

    def note_query(self) -> None:
        """Query-path breadcrumb (one monotonic read; called per batch)."""
        self._last_query_monotonic = time.monotonic()

    def notify_flag_sync(self, seg_ids) -> None:
        """Queues background device syncs (appended row ranges AND flag
        flips — seg.sync_device covers both) for mutated segments, so the
        ~25 ms host->device put happens off the next query's critical
        path. Purely a prefetch: the query path still syncs on demand, so
        disabling this (VSTPU_NO_BG_SYNC=1) only moves the cost back onto
        query latency."""
        if not seg_ids or os.environ.get("VSTPU_NO_BG_SYNC"):
            return
        with self._flag_cv:
            if self._flag_thread is None:
                self._flag_thread = threading.Thread(
                    target=self._flag_sync_loop, daemon=True,
                    name=f"flag-sync-{self.name}",
                )
                self._flag_thread.start()
            self._flag_dirty.update(seg_ids)
            self._flag_cv.notify()

    def _flag_sync_loop(self) -> None:
        # Throttle: each device put is a ~25 ms tunnel round-trip, and an
        # unthrottled syncer matching a fast writer's batch rate STARVES
        # serving when the tunnel is saturated (glove live-insert measured
        # 18.5k -> 10.7k QPS from exactly this; deep10m, with tunnel
        # headroom, gained +35%). Sleeping 3x the last drain's duration
        # caps the syncer's tunnel share at ~25%; mutations missed between
        # drains are synced inline by the query path as before.
        #
        # EXCEPTION — eager mode (r5 churn attribution): when a fast writer
        # outpaces the 25% duty cycle, the append backlog grows without
        # bound and the QUERY path ends up paying the whole drain inline
        # (probe_churn_attrib adds_only: 9.2k -> 0.7k QPS as the backlog
        # grew). If a serving client touched the index recently AND the
        # backlog exceeds one sync chunk, skip the sleep: the syncer must
        # win the race with the writer or serving loses it. With no recent
        # queries (pure ingest) the throttle stands — shipping rows that
        # sealing will restack anyway is pure tunnel waste.
        from vectorsearch_tpu.core.segment import _SYNC_CHUNK

        while not self._lease_stop.is_set():
            with self._flag_cv:
                while not self._flag_dirty and not self._lease_stop.is_set():
                    self._flag_cv.wait(timeout=0.5)
                dirty, self._flag_dirty = self._flag_dirty, set()
            t0 = time.monotonic()
            for sid in dirty:
                seg = self.segments.get(sid)
                if seg is None or seg.is_stub:
                    continue
                try:
                    seg.sync_device()
                except Exception:  # device hiccup: the query path will retry
                    LOG.debug("background flag sync failed for %d", sid,
                              exc_info=True)
            took = time.monotonic() - t0
            serving = time.monotonic() - self._last_query_monotonic < 3.0
            backlog = max(
                (
                    seg.append_backlog()
                    for sid in dirty
                    if (seg := self.segments.get(sid)) is not None
                ),
                default=0,
            )
            if (
                serving and backlog > 2 * _SYNC_CHUNK
                and not os.environ.get("VSTPU_NO_EAGER_SYNC")
            ):
                # outpaced by >2 chunks even after a full drain: re-queue
                # and drain again immediately. The 2x margin keeps moderate
                # writers (glove-rate live inserts) in the throttled regime,
                # where the query path's small inline syncs pace themselves.
                with self._flag_cv:
                    self._flag_dirty.update(dirty)
                continue
            if took > 0 and not self._lease_stop.is_set():
                self._lease_stop.wait(min(3.0 * took, 1.0))

    # ---------------------------------------------------------- writer lease

    _LEASE_KEY = "writer-leases"

    def heartbeat_writer_lease(self) -> None:
        """Acquires-or-renews this process's EXCLUSIVE writer lease; raises
        ConcurrentWriterError (or waits, per writer_conflict_policy) when
        another process holds a live one. Called by every mutation — this is
        the single-writer enforcement point (the reference instead allows
        concurrent writers via FDB transactions + a transactional nextGid
        counter, fdb/FdbVectorStore.java:575-601; two uncoordinated writers
        here would allocate overlapping gids from local counters and clobber
        each other's checkpoints)."""
        eff = self.config.effective
        ttl = eff.writer_lease_ttl_ms
        if ttl <= 0:
            return
        now = eff.clock_ms()
        if self._lease_written_ms > 0 and now - self._lease_written_ms < ttl // 2:
            return  # our lease is fresh; foreigners are excluded by THEIR check
        if self._try_write_lease(now):
            return
        if eff.writer_conflict_policy in ("wait", "concurrent"):
            # concurrent writers coexist; the only thing a concurrent-mode
            # writer ever waits on is a live foreign MAINTENANCE slot
            deadline = time.monotonic() + eff.writer_conflict_wait_timeout_s
            poll_s = min(0.05, max(0.005, ttl / 1000.0 / 20.0))
            while time.monotonic() < deadline:
                time.sleep(poll_s)
                if self._try_write_lease(eff.clock_ms()):
                    return
        raise ConcurrentWriterError(
            f"index '{self.name}': "
            + (
                "a live maintenance lease holds the exclusive remap slot"
                if eff.writer_conflict_policy == "concurrent"
                else "another process holds a live writer lease"
            )
            + f" (policy={eff.writer_conflict_policy}); route writes to the "
            "lease holder or wait for it to close"
        )

    def try_acquire_writer_lease(self, maintenance: bool = False) -> bool:
        """Non-raising one-shot acquire (maintenance ops hold the lease for
        their duration so a writer can't start mid-remap). True on success
        or when leases are disabled. maintenance=True marks the lease as a
        gid-remapping slot: in concurrent-writer mode that slot is EXCLUSIVE
        against every other lease (writers run alongside each other, but
        never alongside a remap), while writers merely exclude maintenance."""
        eff = self.config.effective
        if eff.writer_lease_ttl_ms <= 0:
            return True
        return self._try_write_lease(eff.clock_ms(), maintenance=maintenance)

    _MAINT_PREFIX = "maint!"

    def _is_own_lease(self, key: str) -> bool:
        return key == self.owner_id or key == self._MAINT_PREFIX + self.owner_id

    def _try_write_lease(self, now: int, maintenance: bool = False) -> bool:
        """One atomic check-and-set under the cross-process queue lock.
        Exclusive mode (policy raise/wait): succeeds iff no OTHER live lease
        exists. Concurrent mode: writer leases coexist (the check only
        refuses while a live foreign MAINTENANCE lease holds the exclusive
        remap slot); a maintenance lease still requires being alone. Starts
        the background keeper on first success (ADVICE r2: an idle-but-open
        writer must not silently lapse and let foreign maintenance remap
        gids under it)."""
        ttl = self.config.effective.writer_lease_ttl_ms
        concurrent = self.concurrent_writers
        key = (self._MAINT_PREFIX + self.owner_id) if (
            concurrent and maintenance) else self.owner_id
        with self._lease_mu:
            with self.storage.queue_lock(self.name, self._LEASE_KEY):
                leases = self.storage.read_queue(self.name, self._LEASE_KEY) or {}
                leases = {o: e for o, e in leases.items() if e > now}  # GC
                foreign = [o for o in leases if not self._is_own_lease(o)]
                if concurrent and not maintenance:
                    blocked = any(
                        o.startswith(self._MAINT_PREFIX) for o in foreign
                    )
                else:
                    # exclusive-mode writer OR any maintenance slot: alone
                    blocked = bool(foreign)
                if blocked:
                    return False
                leases[key] = now + ttl
                self.storage.write_queue(self.name, self._LEASE_KEY, leases)
            self._lease_written_ms = now
        self._start_lease_keeper()
        return True

    def _start_lease_keeper(self) -> None:
        if self._lease_keeper is not None:
            return
        ttl = self.config.effective.writer_lease_ttl_ms

        def _keep():
            interval = max(0.2, ttl / 3000.0)  # renew at ~ttl/3 (real time)
            while not self._lease_stop.wait(interval):
                try:
                    with self._lease_mu:
                        if self._lease_written_ms <= 0:
                            continue  # released; idle until re-acquired
                        now = self.config.effective.clock_ms()
                        with self.storage.queue_lock(self.name, self._LEASE_KEY):
                            leases = (
                                self.storage.read_queue(self.name, self._LEASE_KEY)
                                or {}
                            )
                            ours = [o for o in leases if self._is_own_lease(o)]
                            if not ours:
                                # our record vanished (expired + GC'd, or an
                                # operator cleared it): we LOST the lease —
                                # renew-only, never resurrect; the next
                                # mutation re-acquires through the full
                                # conflict check
                                self._lease_written_ms = 0
                                continue
                            leases = {o: e for o, e in leases.items() if e > now}
                            for o in ours:  # renew writer AND maint slots
                                leases[o] = now + ttl
                            self.storage.write_queue(
                                self.name, self._LEASE_KEY, leases
                            )
                        self._lease_written_ms = now
                except Exception:  # pragma: no cover - storage hiccup
                    LOG.exception("writer-lease keeper heartbeat failed")

        t = threading.Thread(target=_keep, name="vstpu-lease-keeper", daemon=True)
        self._lease_keeper = t
        t.start()

    def release_writer_lease(self, maintenance_only: bool = False) -> None:
        """Releases this process's lease(s). maintenance_only drops just the
        exclusive remap slot (concurrent mode: the writer lease stays live
        across the writer's own vacuum/compaction runs)."""
        with self._lease_mu:
            if self._lease_written_ms == 0:
                return
            with self.storage.queue_lock(self.name, self._LEASE_KEY):
                leases = self.storage.read_queue(self.name, self._LEASE_KEY) or {}
                victims = [self._MAINT_PREFIX + self.owner_id]
                if not maintenance_only:
                    victims.append(self.owner_id)
                hit = False
                for v in victims:
                    hit |= leases.pop(v, None) is not None
                if hit:
                    self.storage.write_queue(self.name, self._LEASE_KEY, leases)
                still_held = self.owner_id in leases
            if not still_held:
                self._lease_written_ms = 0

    def holds_live_lease(self) -> bool:
        eff = self.config.effective
        ttl = eff.writer_lease_ttl_ms
        if ttl <= 0 or self._lease_written_ms == 0:
            return False
        return eff.clock_ms() - self._lease_written_ms < ttl

    def live_foreign_writers(self) -> list[str]:
        """Owner ids of OTHER processes holding a live writer lease."""
        if self.config.effective.writer_lease_ttl_ms <= 0:
            return []
        now = self.config.effective.clock_ms()
        leases = self.storage.read_queue(self.name, self._LEASE_KEY) or {}
        return [
            o for o, e in leases.items()
            if not self._is_own_lease(o) and e > now
        ]

    def close(self) -> None:
        """Stops the lease keeper + flag syncer, releases the writer lease."""
        self._lease_stop.set()
        with self._flag_cv:
            self._flag_cv.notify_all()
        if self._flag_thread is not None:
            self._flag_thread.join(timeout=2.0)
            self._flag_thread = None
        if self._lease_keeper is not None:
            self._lease_keeper.join(timeout=2.0)
            self._lease_keeper = None
        self.release_writer_lease()

    # ------------------------------------------------------------------ open

    def create_or_open(self) -> None:
        """Create-or-open with IndexMeta validation
        (reference: fdb/FdbVectorStore.java:71-166). Concurrent-writer mode
        serializes creation under the cross-process state lock: two racing
        creators must not both seed segment 0 (vid spaces would collide)."""
        if self.concurrent_writers:
            with self.storage.queue_lock(self.name, "state-merge"):
                self._create_or_open_inner()
            return
        self._create_or_open_inner()

    def _create_or_open_inner(self) -> None:
        meta_json = self.storage.read_meta(self.name)
        if meta_json is not None:
            existing = IndexMeta.from_json(meta_json)
            self.config.validate_against_meta(existing)
            self._load_state()
            return
        # fresh index: persist meta, seed segment 0 as ACTIVE
        self.storage.write_meta(self.name, self.config.to_index_meta().to_json())
        with self.lock:
            seg0 = self._new_segment(0, SegmentState.ACTIVE)
            self.segments[0] = seg0
            self.registry = [0]
            self.current_segment = 0
            self.max_segment_id = 0
            self.checkpoint_state()

    def _segment_device(self, seg_id: int):
        if self.config.device_placement == "round_robin":
            import jax

            devs = jax.devices()
            return devs[seg_id % len(devs)]
        return self.config.device

    def _owns(self, seg_id: int) -> bool:
        """Shard ownership: with config.segment_shard=(shard, n) set (cluster
        serving, parallel/cluster.py), this process holds row data only for
        seg_id % n == shard; other segments load as stubs (meta only) so host
        RAM scales ~1/n_shards (r2 VERDICT #6 — the reference's FDB hosts
        keep no local copies at all, fdb/FdbVectorStore.java range reads)."""
        ss = self.config.segment_shard
        return ss is None or seg_id % ss[1] == ss[0]

    def _stub_segment(self, sid: int, meta: SegmentMeta) -> Segment:
        seg = Segment(meta, 0, self.config.dimension)
        seg.is_stub = True
        return seg

    def _new_segment(self, seg_id: int, state: SegmentState,
                     capacity: int | None = None) -> Segment:
        meta = SegmentMeta(
            segment_id=seg_id,
            state=state,
            created_at_ms=self.config.effective.clock_ms(),
            owner=self.owner_id,
        )
        return Segment(
            meta, capacity or self.config.max_segment_size, self.config.dimension,
            device=self._segment_device(seg_id), mesh=self.config.mesh,
            payload_arena=self.config.payload_storage == "arena",
        )

    def _load_state(self) -> None:
        state = self.storage.read_state(self.name)
        if state is None:
            # meta exists but no state yet — treat as fresh
            with self.lock:
                seg0 = self._new_segment(0, SegmentState.ACTIVE)
                self.segments[0] = seg0
                self.registry = [0]
                self.checkpoint_state()
            return
        with self.lock:
            self.current_segment = state["current_segment"]
            self.max_segment_id = state["max_segment_id"]
            self.next_gid = state["next_gid"]
            self.registry = list(state["registry"])
            self.segments = {}
            for sid, meta_json in state["segment_metas"].items():
                sid = int(sid)
                meta = SegmentMeta.from_json(meta_json)
                # A WRITING segment outside the registry is debris of an
                # interrupted compaction (the swap never committed; sources
                # remain authoritative) — drop it, like the reference where
                # an unregistered dest is invisible and its task retries.
                # Shard readers (segment_shard set) must NOT clean: the dest
                # may belong to a live writer's in-flight compaction.
                if meta.state == SegmentState.WRITING and sid not in self.registry:
                    if self.config.segment_shard is None:
                        self.storage.delete_segment(self.name, sid)
                        self.storage.wal_reset(self.name, sid)
                    continue
                if not self._owns(sid):
                    # foreign shard: meta-only stub, no checkpoint read, no
                    # row arrays — host RAM stays ~1/n_shards
                    self.segments[sid] = self._stub_segment(sid, meta)
                    continue
                rec = self.storage.read_segment(self.name, sid)
                if rec is None:
                    seg = self._new_segment(sid, meta.state)
                    seg.meta = meta
                else:
                    seg = Segment.from_arrays(
                        meta, self.config.max_segment_size, self.config.dimension,
                        rec, device=self._segment_device(sid),
                        mesh=self.config.mesh,
                        payload_arena=self.config.payload_storage == "arena",
                    )
                self.segments[sid] = seg
            # Per-mutation durability: replay each segment's WAL over its
            # checkpoint (adds + tombstones since the last full write).
            # Overlay delete logs (concurrent-writer cross-deletes, id =
            # seg_id + _OVERLAY_BASE) replay AFTER every base log: their
            # tombstones may target rows that only exist via base-WAL adds.
            wal_ids = self.storage.wal_segments(self.name)
            overlay_ids = []
            for sid in wal_ids:
                base_sid = (
                    sid - self._OVERLAY_BASE
                    if sid >= self._OVERLAY_BASE else sid
                )
                seg = self.segments.get(base_sid)
                if seg is None:
                    # unknown: debris — but shard readers leave foreign
                    # processes' WALs alone
                    if self.config.segment_shard is None:
                        self.storage.wal_reset(self.name, sid)
                    continue
                if seg.is_stub:
                    continue  # foreign shard: rows not materialized here
                if sid >= self._OVERLAY_BASE:
                    overlay_ids.append(sid)
                    continue
                records = self.storage.wal_read(self.name, sid)
                seg.replay_wal(records)
                self._wal_applied[sid] = len(records)
                self._wal_last_txid[sid] = (
                    records[-1].get("txid") if records else None
                )
                # gid high-water mark: tombstoned rows set gids_np=-1, so the
                # live-gid scan below would REGRESS next_gid if the highest
                # gids were deleted before this reopen — and then hand those
                # gids to new vectors, breaking gid stability (the reference's
                # nextGid counter only ever grows, fdb/FdbVectorStore.java:
                # 575-580). Add records carry every gid ever assigned; fold
                # their max in before the live scan.
                for rec in records:
                    if rec.get("op") == "add" and len(rec.get("gids", ())):
                        self.next_gid = max(
                            self.next_gid, int(np.max(rec["gids"])) + 1
                        )
            for oid in overlay_ids:
                seg = self.segments.get(oid - self._OVERLAY_BASE)
                records = self.storage.wal_read(self.name, oid)
                seg.replay_wal(records)
                self._wal_applied[oid] = len(records)
                self._wal_last_txid[oid] = (
                    records[-1].get("txid") if records else None
                )
            # Rebuild derived state from segment truth: the gid map, counts,
            # and the gid counter (reconciles meta.count with arrays — counts
            # in persisted metas may predate WAL-only mutations).
            self.gid_map = GidMap(max(1024, self.next_gid))
            max_gid = -1
            for sid in self.registry:
                seg = self.segments.get(sid)
                if seg is None or seg.is_stub:
                    continue  # stubs: resolve routes to the writer (cluster)
                vids = np.flatnonzero(seg.gids_np[: seg.next_row] >= 0)
                if len(vids):
                    gids = seg.gids_np[vids]
                    self.gid_map.put_batch(
                        gids, (np.int64(sid) << 32) | vids.astype(np.int64)
                    )
                    max_gid = max(max_gid, int(gids.max()))
                seg.reconcile_counts()
            self.next_gid = max(self.next_gid, max_gid + 1)
            # Crash recovery: interrupted builds resume from the queue — the
            # reference's queue lives in FDB; ours is in-process, so re-enqueue
            # builds for any PENDING/WRITING segment found on open.
            live_peers = (
                set(self.live_foreign_writers())
                if self.concurrent_writers else set()
            )
            for sid, seg in self.segments.items():
                if seg.is_stub:
                    continue  # foreign shard: its owner re-enqueues builds
                if seg.state in (SegmentState.PENDING, SegmentState.WRITING):
                    if seg.meta.owner in live_peers:
                        continue  # a LIVE peer owns this build; duplicating
                        # it here would only waste device time (its seal
                        # arrives via refresh)
                    if self.concurrent_writers and not self.owns_segment(seg):
                        # dead peer's unfinished build: take the segment over
                        # (its rows are all in the checkpoint+WAL we just
                        # replayed) so our seal can checkpoint it
                        seg.meta.owner = self.owner_id
                    self.enqueue_build_task(sid)

    # ------------------------------------------------------------ durability

    def checkpoint_state(self) -> None:
        """Persists control-plane state (call with lock held or externally
        consistent). The gid map is NOT persisted here — it is rebuilt on load
        from segment gids arrays (+WAL replay), the single source of truth.

        Concurrent-writer mode MERGES instead of overwriting: N writers each
        checkpoint their own rotations/flips, so a blind write would clobber
        a peer's registry entries. The merge is add-only — persisted entries
        survive, our additions land, and OUR OWNED segments' metas win (a
        peer never legitimately flips them; gid-remapping maintenance, which
        does remove registry entries, runs under the exclusive slot and
        writes the full local state verbatim via maintenance_exclusive)."""
        state = {
            "current_segment": self.current_segment,
            "max_segment_id": self.max_segment_id,
            "next_gid": self.next_gid,
            "registry": list(self.registry),
            "segment_metas": {
                sid: seg.meta.to_json() for sid, seg in self.segments.items()
            },
        }
        if not self.concurrent_writers or self.maintenance_exclusive:
            self.storage.write_state(self.name, state)
            return
        with self.storage.queue_lock(self.name, "state-merge"):
            persisted = self.storage.read_state(self.name)
            if persisted is not None:
                p_metas = {
                    int(s): m
                    for s, m in persisted.get("segment_metas", {}).items()
                }
                merged_metas = dict(p_metas)
                for sid, seg in self.segments.items():
                    if self.owns_segment(seg) or sid not in p_metas:
                        merged_metas[sid] = seg.meta.to_json()
                p_reg = [int(s) for s in persisted.get("registry", [])]
                state["registry"] = p_reg + [
                    s for s in self.registry if s not in p_reg
                ]
                state["segment_metas"] = merged_metas
                state["max_segment_id"] = max(
                    self.max_segment_id,
                    int(persisted.get("max_segment_id", 0)),
                )
                state["next_gid"] = max(
                    self.next_gid, int(persisted.get("next_gid", 0))
                )
            self.storage.write_state(self.name, state)

    def _wal_append_locked(self, seg_id: int, record: dict) -> None:
        """Appends a WAL record stamped with a process-unique txid (so other
        processes' refresh() can detect log resets) and counts it as applied
        locally."""
        record["txid"] = f"{self.owner_id}:{self._wal_seq}"
        self._wal_seq += 1
        self.storage.wal_append(self.name, seg_id, record)
        self._wal_applied[seg_id] = self._wal_applied.get(seg_id, 0) + 1
        self._wal_last_txid[seg_id] = record["txid"]

    def checkpoint_segment(self, seg_id: int) -> None:
        """Full-array segment checkpoint; subsumes and resets the segment's
        WAL. Checkpoint-then-reset ordering keeps a crash between the two
        writes safe: replaying the stale WAL over the new checkpoint is
        idempotent (records re-apply in order)."""
        with self.lock:
            seg = self.segments.get(seg_id)
            if seg is None or seg.is_stub:
                return  # a stub's zeros must never overwrite the owner's data
            if (
                self.concurrent_writers
                and not self.maintenance_exclusive
                and not self.owns_segment(seg)
            ):
                # concurrent mode: a peer's segment — our replicated copy may
                # lag the owner's, and a checkpoint here would reset the
                # owner's WAL under it. The owner (or exclusive maintenance)
                # checkpoints it.
                return
            self.storage.write_segment(
                self.name, seg_id, seg.to_arrays(), seg.payloads_for_checkpoint()
            )
            self.storage.wal_reset(self.name, seg_id)
            self._wal_applied[seg_id] = 0
            self._wal_last_txid[seg_id] = None

    def checkpoint_all(self) -> None:
        with self.lock:
            for sid in list(self.segments):
                self.checkpoint_segment(sid)
            self.checkpoint_state()

    # --------------------------------------------------------------- refresh

    def _load_segment_locked(self, sid: int, meta: SegmentMeta) -> Segment:
        """(Re)loads a segment from its persisted checkpoint (or creates it
        empty when no checkpoint exists yet) and registers it locally. The
        caller is responsible for WAL replay via the delta pass. Foreign-
        shard segments load as stubs (meta only; see _owns)."""
        if not self._owns(sid):
            seg = self._stub_segment(sid, meta)
            self.segments[sid] = seg
            return seg
        rec = self.storage.read_segment(self.name, sid)
        if rec is None:
            seg = self._new_segment(sid, meta.state)
            seg.meta = meta
        else:
            seg = Segment.from_arrays(
                meta, self.config.max_segment_size, self.config.dimension,
                rec, device=self._segment_device(sid), mesh=self.config.mesh,
                payload_arena=self.config.payload_storage == "arena",
            )
        self.segments[sid] = seg
        return seg

    def _index_segment_gids_locked(self, seg: Segment) -> None:
        """(Re)inserts a segment's live gids into the gid map and advances
        the gid counter past them (idempotent)."""
        vids = np.flatnonzero(seg.gids_np[: seg.next_row] >= 0)
        if len(vids):
            gids = seg.gids_np[vids]
            self.gid_map.put_batch(
                gids, (np.int64(seg.seg_id) << 32) | vids.astype(np.int64)
            )
            self.next_gid = max(self.next_gid, int(gids.max()) + 1)

    def _drop_segment_gids_locked(self, seg: Segment) -> None:
        for gid in seg.gids_np[: seg.next_row][
            seg.gids_np[: seg.next_row] >= 0
        ].tolist():
            self.gid_map.remove(int(gid))

    def _apply_wal_delta_locked(self, seg: Segment, recs: list[dict]) -> None:
        """Applies WAL records appended by ANOTHER process onto local arrays
        + the gid map. Idempotent: re-applied adds rewrite the same rows and
        re-applied dels no-op on already-dead rows — so replaying a full WAL
        over a freshly reloaded checkpoint is always safe."""
        added = False
        for rec in recs:
            if rec["op"] == "add":
                start = int(rec["start"])
                rows = np.asarray(rec["vectors"], np.float32)
                n = rows.shape[0]
                seg.vectors_np[start : start + n, : rows.shape[1]] = rows
                seg.exists_np[start : start + n] = True
                seg.alive_np[start : start + n] = True
                gids = np.asarray(rec["gids"], np.int64)
                seg.gids_np[start : start + n] = gids
                payloads = rec.get("payloads")
                if payloads:
                    for i, p in enumerate(payloads):
                        seg.payloads[start + i] = p
                seg.next_row = max(seg.next_row, start + n)
                vids = np.arange(start, start + n, dtype=np.int64)
                live = gids >= 0
                if live.any():
                    self.gid_map.put_batch(
                        gids[live], (np.int64(seg.seg_id) << 32) | vids[live]
                    )
                if len(gids):
                    # high-water over ALL gids the record ever assigned (not
                    # just still-live ones) — deleted gids must never recycle
                    self.next_gid = max(self.next_gid, int(gids.max()) + 1)
                added = True
            elif rec["op"] == "del":
                vids = np.asarray(rec["vids"], np.int64)
                gid_before = seg.gids_np[
                    np.clip(vids, 0, seg.cap_pad - 1)
                ].copy()  # captured BEFORE the flip zeroes gids_np
                flipped = seg.tombstone_batch(vids)
                if len(flipped):
                    sel = gid_before[np.isin(vids, flipped)]
                    self.gid_map.remove_batch(sel[sel >= 0])
            elif rec["op"] == "vac":
                # a peer's vacuum: physical removal of already-tombstoned
                # rows (their gid-map entries went with the "del" records);
                # remove_rows also queues the exists flips for OUR device
                # mirror
                seg.remove_rows(np.asarray(rec["vids"], np.int64))
        if added:
            seg.version += 1  # tombstone_batch bumps per batch; adds here
        seg.reconcile_counts()

    def refresh(self) -> list[int]:
        """Synchronizes this process with mutations made by ANOTHER process
        over shared storage — the polling analogue of the reference's FDB
        reads, where any process sees any range (fdb/FdbVectorStore.java).
        Returns the ids of segments whose local view changed. Picks up:

        - builds completed elsewhere (PENDING/WRITING shown SEALED → reload
          artifacts; reference: build pickup via GlobalWorkerRunner);
        - segments created elsewhere (the writer's rotations) including the
          writer's live ACTIVE segment, loaded checkpoint+WAL;
        - adds/deletes appended to any segment's WAL since our last sync
          (per-mutation durability doubles as a replication log; local
          mutations are counted in _wal_applied, so self-sync is a no-op);
        - foreign checkpoints (WAL shorter than applied → reload + replay);
        - IF this process has never written (no writer lease taken): registry
          removals from a foreign vacuum/compaction swap — dropped segments'
          gids are purged and the compaction dest adopted, re-syncing the gid
          map from persisted state. Writer processes never adopt removals
          (their own registry is authoritative, and cross-writer compaction
          is excluded by the writer lease, core/maintenance.py)."""
        state = self.storage.read_state(self.name)
        if state is None:
            return []
        changed: set[int] = set()
        # A "passive" process never wrote (took no writer lease), so the
        # persisted registry is authoritative over its local copy. With
        # leases disabled we cannot distinguish writers — never adopt
        # removals then (ACTIVE adoption below has its own emptiness guard).
        passive = (
            self._lease_written_ms == 0
            and self.config.effective.writer_lease_ttl_ms > 0
        )
        # Concurrent-writer mode: a WRITER process also adopts foreign
        # registry removals and lifecycle flips — but only for segments it
        # does not own (its own segments' state is locally authoritative,
        # and gid-remapping maintenance runs under the exclusive slot, so a
        # removal in persisted state is always a committed remap).
        concurrent = self.concurrent_writers
        with self.lock:
            metas = {
                int(s): SegmentMeta.from_json(m)
                for s, m in state.get("segment_metas", {}).items()
            }
            self.max_segment_id = max(
                self.max_segment_id, state.get("max_segment_id", 0)
            )
            self.next_gid = max(self.next_gid, state.get("next_gid", 0))

            # --- passive readers adopt registry removals FIRST (vacuum
            # clears / compaction swaps): a compaction moves gids from the
            # dropped sources into its dest, so the sources' stale map
            # entries must go before the dest's gids are indexed below
            persisted_registry = [int(s) for s in state.get("registry", [])]
            if passive or concurrent:
                persisted_set = set(persisted_registry)
                for sid in [s for s in self.registry if s not in persisted_set]:
                    if concurrent and not passive:
                        seg0 = self.segments.get(sid)
                        if sid == self.current_segment or (
                            seg0 is not None and self.owns_segment(seg0)
                        ):
                            continue  # our own segments: locally authoritative
                    seg = self.segments.pop(sid, None)
                    self.registry.remove(sid)
                    if seg is not None:
                        self._drop_segment_gids_locked(seg)
                        changed.add(sid)
                    self._wal_applied.pop(sid, None)
                    self._wal_last_txid.pop(sid, None)
                    self._wal_applied.pop(sid + self._OVERLAY_BASE, None)
                    self._wal_last_txid.pop(sid + self._OVERLAY_BASE, None)

            # --- segments created by another process (rotation / compaction)
            for sid in persisted_registry:
                meta = metas.get(sid)
                if sid in self.segments or meta is None:
                    continue
                if meta.state == SegmentState.WRITING:
                    continue  # foreign compaction dest mid-copy: not visible
                seg = self._load_segment_locked(sid, meta)
                if sid not in self.registry:
                    self.registry.append(sid)
                self._index_segment_gids_locked(seg)
                self._wal_applied[sid] = 0  # delta pass replays its WAL
                changed.add(sid)

            # --- passive readers adopt the writer's ACTIVE segment
            if passive:
                # we never wrote, so any rows in our local ACTIVE copy came
                # from the writer's WAL — adopting its rotation loses nothing
                cur = int(state.get("current_segment", self.current_segment))
                if cur != self.current_segment and cur in self.segments:
                    self.current_segment = cur

            # --- builds completed by another process (state flip + artifacts)
            for sid, meta in metas.items():
                local = self.segments.get(sid)
                if local is None or sid == self.current_segment:
                    continue  # we own the ACTIVE segment's unpersisted rows
                if local.is_stub:
                    # meta-only view: adopt lifecycle flips, never load rows
                    if meta.state != local.state or meta.count != local.meta.count:
                        local.meta = meta
                        changed.add(sid)
                    continue
                if (
                    meta.state == SegmentState.SEALED
                    and local.state != SegmentState.SEALED
                ):
                    rec = self.storage.read_segment(self.name, sid)
                    if rec is None or "codes" not in rec["arrays"]:
                        continue
                    self.segments[sid] = Segment.from_arrays(
                        meta, self.config.max_segment_size,
                        self.config.dimension, rec,
                        device=self._segment_device(sid), mesh=self.config.mesh,
                        payload_arena=self.config.payload_storage == "arena",
                    )
                    self._wal_applied[sid] = 0  # replay post-seal dels below
                    self._wal_last_txid[sid] = None
                    # overlay tombstones we already applied locally are NOT
                    # in the owner's checkpoint — re-replay them too
                    self._wal_applied.pop(sid + self._OVERLAY_BASE, None)
                    self._wal_last_txid.pop(sid + self._OVERLAY_BASE, None)
                    changed.add(sid)
                    LOG.debug("refreshed segment %d from storage (SEALED)", sid)
                elif (
                    passive or (concurrent and not self.owns_segment(local))
                ) and meta.state != local.state:
                    # pure lifecycle flips made by the writer (ACTIVE→PENDING
                    # at rotation, SEALED→COMPACTING at candidate marking):
                    # row data is unchanged, adopt the state in place
                    local.meta.state = meta.state
                    changed.add(sid)

            # --- WAL delta sync: mutations appended since our last look.
            # Base logs first, overlay delete logs after (an overlay replay
            # over a just-reloaded checkpoint must see the reload, which the
            # base pass performs).
            wal_ids = self.storage.wal_segments(self.name)
            for sid in (i for i in wal_ids if i < self._OVERLAY_BASE):
                seg = self.segments.get(sid)
                if seg is None or seg.is_stub:
                    continue  # not in our shard/view; leave the WAL alone
                recs = self.storage.wal_read(self.name, sid)
                applied = self._wal_applied.get(sid, 0)
                stale = len(recs) < applied or (
                    0 < applied <= len(recs)
                    and recs[applied - 1].get("txid")
                    != self._wal_last_txid.get(sid)
                )
                if stale:
                    # a foreign checkpoint subsumed + reset the WAL (shorter
                    # log, or same length with different record identities):
                    # reload the checkpoint, then replay the new WAL entirely.
                    # Purge the old view's gids first — the checkpoint may
                    # have absorbed deletes our stale map still resolves.
                    self._drop_segment_gids_locked(seg)
                    seg = self._load_segment_locked(sid, metas.get(sid, seg.meta))
                    self._index_segment_gids_locked(seg)
                    applied = 0
                    self._wal_applied.pop(sid + self._OVERLAY_BASE, None)
                    self._wal_last_txid.pop(sid + self._OVERLAY_BASE, None)
                    changed.add(sid)
                if len(recs) > applied:
                    self._apply_wal_delta_locked(seg, recs[applied:])
                    changed.add(sid)
                self._wal_applied[sid] = len(recs)
                self._wal_last_txid[sid] = (
                    recs[-1].get("txid") if recs else None
                )
            for oid in (i for i in wal_ids if i >= self._OVERLAY_BASE):
                sid = oid - self._OVERLAY_BASE
                seg = self.segments.get(sid)
                if seg is None or seg.is_stub:
                    continue
                recs = self.storage.wal_read(self.name, oid)
                applied = self._wal_applied.get(oid, 0)
                stale = len(recs) < applied or (
                    0 < applied <= len(recs)
                    and recs[applied - 1].get("txid")
                    != self._wal_last_txid.get(oid)
                )
                if stale:
                    # overlay logs are multi-producer: OUR append may have
                    # interleaved with a peer's, so the positional check can
                    # trip without any reset. Records are pure idempotent
                    # tombstones — re-replaying the whole log is always
                    # sound and needs no checkpoint reload.
                    applied = 0
                if len(recs) > applied:
                    self._apply_wal_delta_locked(seg, recs[applied:])
                    changed.add(sid)
                self._wal_applied[oid] = len(recs)
                self._wal_last_txid[oid] = (
                    recs[-1].get("txid") if recs else None
                )
        if changed and self.on_shapes_changed is not None:
            self.on_shapes_changed()
        return sorted(changed)

    # --------------------------------------------------- concurrent writers
    #
    # writer_conflict_policy="concurrent" is the rebuild's equivalent of the
    # reference's FDB-transactional N-writer ingest
    # (fdb/FdbVectorStore.java:425-492,575-601). The design replaces
    # serializable transactions with partitioned ownership:
    #   - every writer appends ONLY to ACTIVE segments it created (metas are
    #     stamped with owner_id), so row appends never conflict;
    #   - gids / segment ids come from shared transactional counters in
    #     storage (block-allocated under the cross-process queue lock — the
    #     analogue of the reference's transactional nextGid counter);
    #   - control-state checkpoints MERGE under a cross-process lock
    #     (add-only: foreign registry entries and metas are preserved,
    #     our own segments' metas win);
    #   - deletes of rows in foreign segments append to a per-segment
    #     OVERLAY delete log (separate from the owner's WAL, multi-producer
    #     safe) that every process replays idempotently on refresh();
    #   - gid-remapping maintenance (vacuum/compaction) takes an EXCLUSIVE
    #     slot and defers while any other writer is live — remaps are
    #     epoch-deferred rather than transactional.

    _GID_ALLOC_KEY = "gid-alloc"
    _SEG_ALLOC_KEY = "seg-alloc"
    #: Overlay delete logs live in the same WAL namespace at seg_id +
    #: _OVERLAY_BASE. Records are pure idempotent tombstones, so a positional
    #: txid mismatch (concurrent appenders) is healed by re-replaying the
    #: whole overlay — no checkpoint reload needed (cf. refresh()).
    _OVERLAY_BASE = 1 << 40

    def _alloc_gids_locked(self, n: int) -> np.ndarray:
        """Returns n fresh gids. Single-writer: the local monotonic counter.
        Concurrent: drawn from this process's block of the shared counter,
        refilled transactionally (block allocation amortizes the
        cross-process lock to ~1 storage round-trip per 16k gids; unused
        remainders on close become gaps, which is fine — gids are opaque
        and only ever required to be unique and non-recycled)."""
        if not self.concurrent_writers:
            start = self.next_gid
            self.next_gid += n
            return np.arange(start, start + n, dtype=np.int64)
        out = np.empty(n, np.int64)
        filled = 0
        while filled < n:
            if self.next_gid >= self._gid_block_end:
                want = max(n - filled, 16384)
                with self.storage.queue_lock(self.name, self._GID_ALLOC_KEY):
                    rec = self.storage.read_queue(
                        self.name, self._GID_ALLOC_KEY) or {}
                    # fold the local high-water in: pre-concurrent history
                    # (or a wiped counter record) must never recycle gids
                    start = max(int(rec.get("next", 0)), self.next_gid)
                    self.storage.write_queue(
                        self.name, self._GID_ALLOC_KEY,
                        {"next": start + want})
                self.next_gid = start
                self._gid_block_end = start + want
            take = min(n - filled, self._gid_block_end - self.next_gid)
            out[filled:filled + take] = np.arange(
                self.next_gid, self.next_gid + take, dtype=np.int64)
            self.next_gid += take
            filled += take
        return out

    def _alloc_segment_id_locked(self) -> int:
        """Fresh segment id: local max+1 single-writer; shared counter in
        concurrent mode (rotations are rare — one per max_segment_size rows
        — so no block amortization is needed)."""
        if not self.concurrent_writers:
            new_id = self.max_segment_id + 1
            self.max_segment_id = new_id
            return new_id
        with self.storage.queue_lock(self.name, self._SEG_ALLOC_KEY):
            rec = self.storage.read_queue(self.name, self._SEG_ALLOC_KEY) or {}
            new_id = max(int(rec.get("next", 0)), self.max_segment_id + 1)
            self.storage.write_queue(
                self.name, self._SEG_ALLOC_KEY, {"next": new_id + 1})
        self.max_segment_id = max(self.max_segment_id, new_id)
        return new_id

    def _ensure_own_active_locked(self) -> None:
        """Concurrent mode, on write entry: make current_segment one of OURS.
        A foreign or orphaned ACTIVE under current_segment is left alone if
        its owner's lease is live (the owner is filling it); if the owner is
        dead (or pre-concurrent None) and it holds rows, flip it PENDING so
        its rows get built+sealed — then create our own ACTIVE."""
        seg = self.segments.get(self.current_segment)
        if seg is not None and seg.state == SegmentState.ACTIVE \
                and self.owns_segment(seg):
            return
        if (
            seg is not None
            and seg.state == SegmentState.ACTIVE
            and not seg.is_stub
            and (seg.meta.owner is None
                 or seg.meta.owner not in self.live_foreign_writers())
        ):
            # orphaned ACTIVE: its creator is gone; adopt-by-rotation so the
            # rows reach SEALED (builds only seal PENDING/WRITING). Claim
            # ownership — the state merge persists OUR metas, and the build
            # is now ours to run. A double-claim race is benign: the merge
            # lock serializes the writes and duplicate builds are idempotent.
            seg.meta.state = SegmentState.PENDING
            seg.meta.owner = self.owner_id
            self.enqueue_build_task(seg.seg_id)
        new_id = self._alloc_segment_id_locked()
        fresh = self._new_segment(new_id, SegmentState.ACTIVE)
        self.segments[new_id] = fresh
        if new_id not in self.registry:
            self.registry.append(new_id)
        self.current_segment = new_id
        if self.on_shapes_changed is not None:
            self.on_shapes_changed()
        self.checkpoint_state()
        LOG.info("concurrent writer %s opened ACTIVE segment %d",
                 self.owner_id[:8], new_id)

    # ---------------------------------------------------------------- ingest

    def add_batch(self, embeddings: np.ndarray, payloads: Optional[list]) -> list[int]:
        """Inserts a batch, rotating as needed; returns assigned gids
        (reference: addBatch loop :210-226 + writeOnce :425-492)."""
        embeddings = np.asarray(embeddings, np.float32)
        if embeddings.ndim != 2 or embeddings.shape[1] != self.config.dimension:
            raise ValueError(
                f"embedding dimension mismatch: expected {self.config.dimension}, "
                f"got {embeddings.shape[-1] if embeddings.ndim else 'scalar'}"
            )
        n = embeddings.shape[0]
        # addAll payload rules (reference: api/VectorIndex.java:78-88):
        # short/None payloads -> missing entries None; extra payloads ignored.
        plist: list = [None] * n
        if payloads is not None:
            for i in range(min(n, len(payloads))):
                plist[i] = payloads[i]

        gids: list[int] = []
        offset = 0
        self.heartbeat_writer_lease()
        touched: set = set()
        with self.lock:
            if self.concurrent_writers:
                self._ensure_own_active_locked()
            while offset < n:
                seg = self.segments[self.current_segment]
                if seg.state != SegmentState.ACTIVE:
                    raise RuntimeError(
                        f"current segment {seg.seg_id} not ACTIVE: {seg.state}"
                    )
                cap = seg.remaining_capacity()
                if cap == 0:
                    self._rotate_locked()
                    continue
                take = min(cap, n - offset)
                chunk = embeddings[offset : offset + take]
                chunk_payloads = plist[offset : offset + take]
                vec_ids = seg.append_rows(chunk, chunk_payloads)
                new_gids = self._alloc_gids_locked(take)
                vid_arr = np.asarray(vec_ids, np.int64)
                self.gid_map.put_batch(
                    new_gids, (np.int64(seg.seg_id) << 32) | vid_arr
                )
                seg.gids_np[vid_arr] = new_gids
                # per-mutation durability (reference: each add is an FDB txn,
                # fdb/FdbVectorStore.java:425-492)
                self._wal_append_locked(
                    seg.seg_id,
                    {
                        "op": "add",
                        "start": int(vec_ids[0]),
                        "vectors": chunk,
                        "gids": new_gids,
                        "payloads": (
                            chunk_payloads
                            if any(p is not None for p in chunk_payloads)
                            else None
                        ),
                    },
                )
                gids.extend(new_gids.tolist())  # C-speed int conversion
                touched.add(seg.seg_id)
                offset += take
                # strict cap: rotate immediately when full (reference :494-510)
                if seg.remaining_capacity() == 0:
                    self._rotate_locked()
        self.notify_flag_sync(touched)  # appends upload off the query path
        return gids

    def _rotate_locked(self) -> None:
        """ACTIVE->PENDING + create next ACTIVE + registry + build-task enqueue,
        all under the lock (the reference does this in one FDB txn :512-539)."""
        old = self.segments[self.current_segment]
        old.meta.state = SegmentState.PENDING
        new_id = self._alloc_segment_id_locked()
        self.current_segment = new_id
        seg = self._new_segment(new_id, SegmentState.ACTIVE)
        self.segments[new_id] = seg
        self.registry.append(new_id)
        self.enqueue_build_task(old.seg_id)
        if self.on_shapes_changed is not None:
            self.on_shapes_changed()  # only schedules; safe under the lock
        LOG.debug("rotated segment %d -> PENDING; new ACTIVE %d", old.seg_id, new_id)
        # No full-segment checkpoint here: the rotated segment's rows are
        # already durable in its WAL, and the build worker checkpoints at seal
        # — so rotation never stalls writers on a multi-MB serialization (the
        # reference chunks writes under txn budgets for the same reason,
        # fdb/FdbVectorStore.java:659-721). Only the tiny control write stays.
        self.checkpoint_state()

    def enqueue_build_task(self, seg_id: int) -> None:
        """Idempotent key "build-segment:<id>" (reference :723-727)."""
        if self.build_queue is not None:
            self.build_queue.enqueue_if_not_exists(
                f"build-segment:{seg_id}", BuildTask(seg_id)
            )

    # ---------------------------------------------------------------- delete

    def delete_batch(self, gids) -> list[int]:
        """Tombstones gids; returns the affected segment ids
        (reference: deleteBatch :276-423). Unknown gids are ignored."""
        affected: list[int] = []
        self.heartbeat_writer_lease()
        gids_arr = np.asarray(
            gids if isinstance(gids, np.ndarray) else list(gids), np.int64
        )
        if gids_arr.size == 0:
            return affected
        if self.concurrent_writers:
            # rows added by a PEER writer enter this process's view via
            # refresh(); resolve misses get one refresh retry so deletes of
            # freshly replicated gids succeed (the reference reads any gid
            # transactionally, fdb/FdbVectorStore.java:276-423)
            with self.lock:
                if np.any(self.gid_map.get_batch(gids_arr) < 0):
                    pass_refresh = True
                else:
                    pass_refresh = False
            if pass_refresh:
                self.refresh()
        with self.lock:
            # vectorized resolve + tombstone: the per-gid Python loop was
            # measurable writer GIL time under deep10m churn (r4)
            packed = self.gid_map.get_batch(gids_arr)
            ok = packed >= 0
            segs = (packed[ok] >> 32).astype(np.int64)
            vids = (packed[ok] & 0xFFFFFFFF).astype(np.int64)
            g_ok = gids_arr[ok]
            for sid in np.unique(segs):
                seg = self.segments.get(int(sid))
                if seg is None:
                    continue
                m = segs == sid
                flipped = seg.tombstone_batch(vids[m])
                if len(flipped):
                    self.gid_map.remove_batch(
                        g_ok[m][np.isin(vids[m], flipped)]
                    )
                    # per-mutation durability (reference: deleteBatch is an
                    # FDB txn, fdb/FdbVectorStore.java:276-423). Concurrent
                    # mode routes deletes of rows in PEER-owned segments to
                    # the segment's OVERLAY delete log: the owner's WAL is
                    # single-producer (its positional replay tracking breaks
                    # under interleaved appends), while the overlay is
                    # multi-producer by construction (pure idempotent
                    # tombstones; see the "concurrent writers" section).
                    wal_id = int(sid)
                    if self.concurrent_writers and not self.owns_segment(seg):
                        wal_id = int(sid) + self._OVERLAY_BASE
                    self._wal_append_locked(
                        wal_id, {"op": "del", "vids": flipped}
                    )
                affected.append(int(sid))
        self.notify_flag_sync(affected)
        return affected

    # ----------------------------------------------------------------- query

    def snapshot_segments(self) -> list[Segment]:
        """Consistent segment-set snapshot for a query (registry order)."""
        with self.lock:
            return [self.segments[sid] for sid in self.registry if sid in self.segments]

    def resolve_gid(self, gid: int) -> tuple[int, int]:
        with self.lock:
            return unpack_loc(self.gid_map.get(int(gid)))

    def gid_for(self, seg_id: int, vec_id: int) -> Optional[int]:
        with self.lock:
            seg = self.segments.get(seg_id)
            if seg is None or not (0 <= vec_id < seg.cap_pad):
                return None
            g = int(seg.gids_np[vec_id])
            return g if g >= 0 else None
