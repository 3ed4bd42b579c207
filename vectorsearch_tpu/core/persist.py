"""Durability backends — the analogue of the reference's FoundationDB layer.

The reference stores every mutation transactionally in FDB (SURVEY.md §5.4:
"FDB is the single source of truth"). On TPU the authoritative working state is
host RAM + HBM; durability is two-layer:
- per-mutation: every add/delete appends to a per-segment write-ahead log
  (the analogue of FDB's transactional writes, fdb/FdbVectorStore.java:276-492);
- checkpoint: full segment arrays persisted at lifecycle boundaries (seal,
  vacuum, compaction) plus explicit `VectorIndex.checkpoint()` calls, which
  resets that segment's WAL. Open = load checkpoints, replay WALs.

Two backends:
- MemoryStorage: keeps everything in process memory. The default for tests and
  ephemeral serving (like the reference's tests against a throwaway FDB
  namespace). Reopen semantics (meta validation) still work.
- DiskStorage: JSON metadata + .npz array files under a directory.

The storage schema mirrors the reference's directory layout
(fdb/FdbDirectories.java:291-308):
  <index>/meta            -> IndexMeta json
  <index>/state           -> {current_segment, max_segment_id, next_gid,
                              registry: [segIds], segment_metas, gid_entries}
  <index>/segments/<id>   -> arrays npz (vectors, alive, exists, codes,
                              codebook, adjacency) + payloads
"""

from __future__ import annotations

import json
import os
import pickle
import threading
import time
from typing import Any, Dict, Optional

import numpy as np


class IndexStorage:
    """Abstract storage backend. All methods are thread-safe."""

    def list_indexes(self) -> list[str]:
        raise NotImplementedError

    def read_meta(self, name: str) -> Optional[dict]:
        raise NotImplementedError

    def write_meta(self, name: str, meta: dict) -> None:
        raise NotImplementedError

    def read_state(self, name: str) -> Optional[dict]:
        raise NotImplementedError

    def write_state(self, name: str, state: dict) -> None:
        raise NotImplementedError

    def write_segment(self, name: str, seg_id: int, arrays: Dict[str, np.ndarray],
                      payloads: Optional[list] = None) -> None:
        raise NotImplementedError

    def read_segment(self, name: str, seg_id: int) -> Optional[dict]:
        """Returns {"arrays": {...}, "payloads": [...]} or None."""
        raise NotImplementedError

    def delete_segment(self, name: str, seg_id: int) -> None:
        raise NotImplementedError

    def delete_index(self, name: str) -> None:
        raise NotImplementedError

    # -- per-segment write-ahead log (per-mutation durability; reference
    # semantics: every add/delete is an FDB transaction,
    # fdb/FdbVectorStore.java:276-423,425-492). Records are replayed in append
    # order over the segment's last checkpoint on open; a checkpoint resets
    # the log. Records must therefore be idempotent under in-order replay. --

    def wal_append(self, name: str, seg_id: int, record: dict) -> None:
        raise NotImplementedError

    def wal_read(self, name: str, seg_id: int) -> list[dict]:
        raise NotImplementedError

    def wal_reset(self, name: str, seg_id: int) -> None:
        raise NotImplementedError

    def wal_segments(self, name: str) -> list[int]:
        raise NotImplementedError

    # -- task-queue journal (durable queues; reference semantics: the FDB-
    # backed taskqueue persists every enqueue/claim/retry, SURVEY.md §5.3) --

    def read_queue(self, name: str, qname: str) -> Optional[dict]:
        raise NotImplementedError

    def write_queue(self, name: str, qname: str, state: dict) -> None:
        raise NotImplementedError

    def queue_lock(self, name: str, qname: str):
        """Context manager serializing queue read-modify-write cycles across
        ALL participants (threads here, processes for DiskStorage) — the
        analogue of an FDB transaction over the queue subspace."""
        raise NotImplementedError

    def queue_wake(self, name: str, qname: str) -> "QueueWake":
        """Wake channel for the queue — the analogue of the reference's FDB
        watches (tasks/SegmentBuildWorker.java:42-53 blocks on a watch, no
        polling): producers `.notify()` after any journal write that could
        unblock a waiter; consumers `.wait(timeout)` block until a notify or
        timeout. A spurious wake is always safe (waiters re-read the journal
        under the lock), so implementations only guarantee no LOST wakes for
        notifies issued after the waiter's last journal read. Base fallback:
        a plain timeout sleep (degrades to polling)."""
        return _SleepWake()


class QueueWake:
    """Interface for cross-participant queue wake channels (see
    IndexStorage.queue_wake)."""

    def notify(self) -> None:
        raise NotImplementedError

    def wait(self, timeout: float) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class _SleepWake(QueueWake):
    """Timeout-only channel: no cross-participant signaling; callers degrade
    to bounded polling (their deadline math still caps latency)."""

    _POLL_S = 0.05

    def notify(self) -> None:
        pass

    def wait(self, timeout: float) -> None:
        time.sleep(max(0.0, min(timeout, self._POLL_S)))


class _CondWake(QueueWake):
    """In-process channel (MemoryStorage: all queue participants are threads
    of one process): a plain Condition, exact wakeups, zero polling."""

    def __init__(self):
        self._cond = threading.Condition()

    def notify(self) -> None:
        with self._cond:
            self._cond.notify_all()

    def wait(self, timeout: float) -> None:
        with self._cond:
            self._cond.wait(max(0.0, timeout))


class _FifoWake(QueueWake):
    """Cross-PROCESS channel for DiskStorage: a POSIX FIFO next to the queue
    journal. Waiters hold the FIFO open O_RDWR (so reader-side EOF can never
    occur) and block in select(); notifiers open O_WRONLY|O_NONBLOCK and
    write one byte (ENXIO = nobody waiting = nothing to do). Wake bytes
    persist in the FIFO until some waiter drains them, so a notify issued
    while a waiter is between its journal read and its select() is not lost.
    All woken waiters re-read the journal, so wake-one vs wake-all does not
    affect correctness — at most a different process claims the task."""

    def __init__(self, path: str):
        self._path = path
        self._rfd: Optional[int] = None
        self._lock = threading.Lock()

    def _reader_fd(self) -> int:
        with self._lock:
            if self._rfd is None:
                if not os.path.exists(self._path):
                    try:
                        os.mkfifo(self._path)
                    except FileExistsError:
                        pass
                self._rfd = os.open(self._path, os.O_RDWR | os.O_NONBLOCK)
            return self._rfd

    def notify(self) -> None:
        try:
            fd = os.open(self._path, os.O_WRONLY | os.O_NONBLOCK)
        except (FileNotFoundError, OSError):
            return  # no FIFO yet / no waiter holds it open: nobody to wake
        try:
            os.write(fd, b"w")
        except (BlockingIOError, BrokenPipeError, OSError):
            pass  # FIFO buffer full = wakes already pending
        finally:
            os.close(fd)

    def wait(self, timeout: float) -> None:
        import select

        try:
            fd = self._reader_fd()
        except OSError:
            time.sleep(max(0.0, min(timeout, 0.05)))
            return
        r, _, _ = select.select([fd], [], [], max(0.0, timeout))
        if r:
            try:
                os.read(fd, 4096)  # drain; peers that raced us see EAGAIN
            except (BlockingIOError, OSError):
                pass

    def close(self) -> None:
        with self._lock:
            if self._rfd is not None:
                try:
                    os.close(self._rfd)
                except OSError:
                    pass
                self._rfd = None


class MemoryStorage(IndexStorage):
    def __init__(self):
        self._lock = threading.RLock()
        self._meta: Dict[str, dict] = {}
        self._state: Dict[str, dict] = {}
        self._segments: Dict[str, Dict[int, dict]] = {}
        self._queues: Dict[str, Dict[str, dict]] = {}
        self._wals: Dict[str, Dict[int, list]] = {}

    def list_indexes(self):
        with self._lock:
            return sorted(self._meta)

    def read_meta(self, name):
        with self._lock:
            m = self._meta.get(name)
            return json.loads(json.dumps(m)) if m is not None else None

    def write_meta(self, name, meta):
        with self._lock:
            self._meta[name] = json.loads(json.dumps(meta))

    def read_state(self, name):
        with self._lock:
            s = self._state.get(name)
            return pickle.loads(pickle.dumps(s)) if s is not None else None

    def write_state(self, name, state):
        with self._lock:
            self._state[name] = pickle.loads(pickle.dumps(state))

    def write_segment(self, name, seg_id, arrays, payloads=None):
        with self._lock:
            self._segments.setdefault(name, {})[seg_id] = {
                "arrays": {k: np.array(v, copy=True) for k, v in arrays.items()},
                "payloads": list(payloads) if payloads is not None else None,
            }

    def read_segment(self, name, seg_id):
        with self._lock:
            rec = self._segments.get(name, {}).get(seg_id)
            if rec is None:
                return None
            return {
                "arrays": {k: np.array(v, copy=True) for k, v in rec["arrays"].items()},
                "payloads": list(rec["payloads"]) if rec["payloads"] is not None else None,
            }

    def delete_segment(self, name, seg_id):
        with self._lock:
            self._segments.get(name, {}).pop(seg_id, None)

    def delete_index(self, name):
        with self._lock:
            self._meta.pop(name, None)
            self._state.pop(name, None)
            self._segments.pop(name, None)
            self._queues.pop(name, None)
            self._wals.pop(name, None)

    def wal_append(self, name, seg_id, record):
        # Snapshot isolation without pickle: the caller's arrays mutate
        # after append, so values must be copied — but pickling a 2000-row
        # add record (~768 KB) was measurable writer GIL time under churn
        # (r4). ndarray.copy()/list() give the same isolation at memcpy
        # speed; payload bytes are immutable. DiskStorage remains the
        # serialization-validating durable backend.
        snap = {
            k: (v.copy() if isinstance(v, np.ndarray)
                else list(v) if isinstance(v, list) else v)
            for k, v in record.items()
        }
        with self._lock:
            self._wals.setdefault(name, {}).setdefault(seg_id, []).append(snap)

    def wal_read(self, name, seg_id):
        with self._lock:
            recs = self._wals.get(name, {}).get(seg_id, [])
            # consumers treat records as read-only; return shallow copies of
            # the dicts so accidental key mutation can't corrupt the log
            return [dict(r) for r in recs]

    def wal_reset(self, name, seg_id):
        with self._lock:
            self._wals.get(name, {}).pop(seg_id, None)

    def wal_segments(self, name):
        with self._lock:
            return sorted(self._wals.get(name, {}))

    def read_queue(self, name, qname):
        with self._lock:
            q = self._queues.get(name, {}).get(qname)
            return json.loads(json.dumps(q)) if q is not None else None

    def write_queue(self, name, qname, state):
        with self._lock:
            self._queues.setdefault(name, {})[qname] = json.loads(json.dumps(state))

    def queue_lock(self, name, qname):
        with self._lock:
            if not hasattr(self, "_qlocks"):
                self._qlocks = {}
            return self._qlocks.setdefault((name, qname), threading.RLock())

    def queue_wake(self, name, qname):
        with self._lock:
            if not hasattr(self, "_qwakes"):
                self._qwakes = {}
            return self._qwakes.setdefault((name, qname), _CondWake())


class DiskStorage(IndexStorage):
    """Directory-backed storage: JSON for metadata, npz+pickle for segment data.

    Durability levels (the reference's FDB commits survive machine crashes,
    fdb/FdbVectorStore.java:276-492; flush-only writes survive process death
    but not kernel/power loss):

    - ``fsync=True`` (default): every WAL append fsyncs before returning, and
      every atomic rename (state/meta/segment/queue) fsyncs the tmp file and
      the parent directory — acknowledged mutations survive a machine crash.
    - ``wal_group_commit_ms > 0``: WAL appends return after flush; a
      background flusher fsyncs dirty logs every N ms (group commit). Loss
      window on kernel/power crash = at most that many ms of acknowledged
      mutations; process death (kill -9) still loses nothing.
    - ``fsync=False``: flush-only everywhere (fastest; the round-2 behavior).
    """

    def __init__(self, root: str, fsync: bool = True,
                 wal_group_commit_ms: float = 0.0,
                 payload_spill_bytes: int = 8 * 1024 * 1024):
        # payload_spill_bytes: arena blobs at/above this size live in their
        # own .npy and are memory-mapped on reopen (host RAM stays bounded
        # however large payloads grow); smaller blobs stay inside the npz.
        self.root = root
        self.fsync = bool(fsync)
        self.payload_spill_bytes = int(payload_spill_bytes)
        self.wal_group_commit_ms = float(wal_group_commit_ms)
        self._lock = threading.RLock()
        # open append handles per WAL path; value = [file, dir_synced: bool]
        self._wal_handles: Dict[str, list] = {}
        self._dirty_wals: set = set()  # paths awaiting a group-commit fsync
        self._flusher: Optional[threading.Thread] = None
        self._flusher_stop = threading.Event()
        os.makedirs(root, exist_ok=True)

    # -- fsync helpers --------------------------------------------------

    def _sync_dir(self, path: str) -> None:
        if not self.fsync:
            return
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)

    def _replace_synced(self, tmp: str, dst: str) -> None:
        """rename + (optionally) fsync file-then-directory, so the swap
        itself survives a machine crash, not just process death."""
        if self.fsync:
            fd = os.open(tmp, os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        os.replace(tmp, dst)
        self._sync_dir(os.path.dirname(dst))

    def _idx(self, name: str) -> str:
        safe = name.replace("/", "__")
        return os.path.join(self.root, safe)

    def list_indexes(self):
        with self._lock:
            out = []
            for d in sorted(os.listdir(self.root)):
                if os.path.exists(os.path.join(self.root, d, "meta.json")):
                    out.append(d.replace("__", "/"))
            return out

    def _read_json(self, path):
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _write_json(self, path, obj):
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f)
        # atomic swap: crash-consistent like an FDB commit
        self._replace_synced(tmp, path)

    def read_meta(self, name):
        with self._lock:
            return self._read_json(os.path.join(self._idx(name), "meta.json"))

    def write_meta(self, name, meta):
        with self._lock:
            os.makedirs(self._idx(name), exist_ok=True)
            self._write_json(os.path.join(self._idx(name), "meta.json"), meta)

    def read_state(self, name):
        with self._lock:
            p = os.path.join(self._idx(name), "state.pkl")
            if not os.path.exists(p):
                return None
            with open(p, "rb") as f:
                return pickle.load(f)

    def write_state(self, name, state):
        with self._lock:
            os.makedirs(self._idx(name), exist_ok=True)
            p = os.path.join(self._idx(name), "state.pkl")
            tmp = p + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(state, f)
            self._replace_synced(tmp, p)

    def _seg_dir(self, name):
        return os.path.join(self._idx(name), "segments")

    def write_segment(self, name, seg_id, arrays, payloads=None):
        with self._lock:
            d = self._seg_dir(name)
            os.makedirs(d, exist_ok=True)
            npz = os.path.join(d, f"{seg_id}.npz")
            tmp = npz + ".tmp.npz"
            arrays = dict(arrays)
            # Large arena payload blobs SPILL to their own .npy so reopen can
            # np.memmap them instead of loading GBs of payload bytes into
            # host RAM (the reference pages payloads from FDB on demand,
            # fdb/FdbVectorIndex.java:970-1046 point-reads). Crash
            # consistency: the blob file is fully written + renamed BEFORE
            # the npz that references its version, so offsets in a visible
            # npz always index a complete matching blob; stale versions are
            # swept after the npz swap.
            blob = arrays.get("payload_blob")
            spilled_v = None
            if blob is not None and blob.nbytes >= self.payload_spill_bytes:
                spilled_v = 1 + max(
                    (v for _, v in self._blob_files(d, seg_id)), default=0
                )
                bp = os.path.join(d, f"{seg_id}.payblob.{spilled_v}.npy")
                np.save(bp + ".tmp.npy", np.asarray(blob, np.uint8))
                self._replace_synced(bp + ".tmp.npy", bp)
                arrays.pop("payload_blob")
                arrays["payload_blob_spill"] = np.array([spilled_v], np.int64)
            # uncompressed on purpose: savez_compressed costs ~4.3s per 100k
            # segment vs 0.06s for ~13% size — checkpoints sit on the build
            # and rotation paths
            np.savez(tmp, **arrays)
            self._replace_synced(tmp, npz)
            for p, v in self._blob_files(d, seg_id):
                if v != spilled_v:
                    os.remove(p)
            pp = os.path.join(d, f"{seg_id}.payloads.pkl")
            tmpp = pp + ".tmp"
            with open(tmpp, "wb") as f:
                pickle.dump(payloads, f)
            self._replace_synced(tmpp, pp)

    @staticmethod
    def _blob_files(d: str, seg_id: int) -> list[tuple[str, int]]:
        """[(path, version)] of spilled payload blobs for one segment."""
        out = []
        prefix = f"{seg_id}.payblob."
        for fn in os.listdir(d) if os.path.isdir(d) else ():
            if fn.startswith(prefix) and fn.endswith(".npy") and ".tmp" not in fn:
                try:
                    out.append((os.path.join(d, fn),
                                int(fn[len(prefix):-4])))
                except ValueError:
                    continue
        return out

    def read_segment(self, name, seg_id):
        with self._lock:
            npz = os.path.join(self._seg_dir(name), f"{seg_id}.npz")
            if not os.path.exists(npz):
                return None
            with np.load(npz, allow_pickle=False) as z:
                arrays = {k: z[k] for k in z.files}
            spill = arrays.pop("payload_blob_spill", None)
            if spill is not None:
                bp = os.path.join(
                    self._seg_dir(name),
                    f"{seg_id}.payblob.{int(spill[0])}.npy",
                )
                # memory-mapped: payload bytes page in on result access
                arrays["payload_blob"] = np.load(bp, mmap_mode="r")
            pp = os.path.join(self._seg_dir(name), f"{seg_id}.payloads.pkl")
            payloads = None
            if os.path.exists(pp):
                with open(pp, "rb") as f:
                    payloads = pickle.load(f)
            return {"arrays": arrays, "payloads": payloads}

    def delete_segment(self, name, seg_id):
        with self._lock:
            d = self._seg_dir(name)
            for suffix in (f"{seg_id}.npz", f"{seg_id}.payloads.pkl"):
                p = os.path.join(d, suffix)
                if os.path.exists(p):
                    os.remove(p)
            for p, _v in self._blob_files(d, seg_id):
                os.remove(p)

    def delete_index(self, name):
        with self._lock:
            import shutil

            prefix = self._idx(name) + os.sep
            for path in [p for p in self._wal_handles if p.startswith(prefix)]:
                h = self._wal_handles.pop(path)
                self._dirty_wals.discard(path)
                try:
                    h[0].close()
                except OSError:
                    pass
            if os.path.exists(self._idx(name)):
                shutil.rmtree(self._idx(name))

    def _wal_dir(self, name):
        return os.path.join(self._idx(name), "wal")

    def _wal_path(self, name, seg_id):
        return os.path.join(self._wal_dir(name), f"{seg_id}.wal")

    def wal_append(self, name, seg_id, record):
        # Length-framed pickle appended to a per-segment log. A crash mid-write
        # leaves a torn tail frame which wal_read skips — the record simply
        # never committed, matching an aborted FDB transaction. Handles stay
        # open across appends (one open per mutation would dominate the
        # fsync'd hot write path).
        import fcntl

        blob = pickle.dumps(record, protocol=pickle.HIGHEST_PROTOCOL)
        frame = len(blob).to_bytes(8, "little") + blob
        with self._lock:
            path = self._wal_path(name, seg_id)
            h = self._wal_handles.get(path)
            if h is None:
                os.makedirs(self._wal_dir(name), exist_ok=True)
                created = not os.path.exists(path)
                h = [open(path, "ab"), not created]
                self._wal_handles[path] = h
            f, dir_synced = h
            # flock for the frame write: concurrent-writer overlay logs (and
            # any future multi-producer log) take appends from SEVERAL
            # processes; Python's buffered writer may split a frame across
            # write(2) calls, so without the lock two processes' frames could
            # interleave bytes. ~1 us on an already-open fd — noise next to
            # the pickle+flush it protects.
            fcntl.flock(f.fileno(), fcntl.LOCK_EX)
            try:
                f.write(frame)
                f.flush()
            finally:
                fcntl.flock(f.fileno(), fcntl.LOCK_UN)
            if not self.fsync:
                return
            if self.wal_group_commit_ms > 0:
                self._dirty_wals.add(path)
                self._start_flusher()
                return
            os.fsync(f.fileno())
            if not dir_synced:
                # first append after file creation: persist the dirent too
                self._sync_dir(self._wal_dir(name))
                h[1] = True

    def _start_flusher(self):
        if self._flusher is not None:
            return

        def _flush_loop():
            interval = max(0.001, self.wal_group_commit_ms / 1000.0)
            while not self._flusher_stop.wait(interval):
                self.flush_wals()

        t = threading.Thread(target=_flush_loop, name="vstpu-wal-flusher",
                             daemon=True)
        self._flusher = t
        t.start()

    def flush_wals(self) -> None:
        """Group commit: one fsync per dirty WAL since the last cycle."""
        with self._lock:
            dirty, self._dirty_wals = self._dirty_wals, set()
            for path in dirty:
                h = self._wal_handles.get(path)
                if h is None:
                    continue
                try:
                    os.fsync(h[0].fileno())
                    if not h[1]:
                        self._sync_dir(os.path.dirname(path))
                        h[1] = True
                except (OSError, ValueError):  # closed/removed underneath
                    pass

    def close(self) -> None:
        self._flusher_stop.set()
        if self._flusher is not None:
            self._flusher.join(timeout=2.0)
            self._flusher = None
        self.flush_wals()
        with self._lock:
            for h in self._wal_handles.values():
                try:
                    h[0].close()
                except OSError:
                    pass
            self._wal_handles.clear()

    def wal_read(self, name, seg_id):
        with self._lock:
            p = self._wal_path(name, seg_id)
            if not os.path.exists(p):
                return []
            with open(p, "rb") as f:
                data = f.read()
        out, off = [], 0
        while off + 8 <= len(data):
            n = int.from_bytes(data[off : off + 8], "little")
            if off + 8 + n > len(data):
                break  # torn tail: uncommitted record
            try:
                out.append(pickle.loads(data[off + 8 : off + 8 + n]))
            except Exception:
                break  # corrupt tail
            off += 8 + n
        return out

    def wal_reset(self, name, seg_id):
        with self._lock:
            p = self._wal_path(name, seg_id)
            h = self._wal_handles.pop(p, None)
            if h is not None:
                self._dirty_wals.discard(p)
                try:
                    h[0].close()
                except OSError:
                    pass
            if os.path.exists(p):
                os.remove(p)

    def wal_segments(self, name):
        with self._lock:
            d = self._wal_dir(name)
            if not os.path.isdir(d):
                return []
            out = []
            for fn in os.listdir(d):
                if fn.endswith(".wal"):
                    try:
                        out.append(int(fn[:-4]))
                    except ValueError:
                        pass
            return sorted(out)

    def read_queue(self, name, qname):
        with self._lock:
            return self._read_json(
                os.path.join(self._idx(name), f"queue_{qname}.json")
            )

    def write_queue(self, name, qname, state):
        with self._lock:
            os.makedirs(self._idx(name), exist_ok=True)
            self._write_json(
                os.path.join(self._idx(name), f"queue_{qname}.json"), state
            )

    def queue_lock(self, name, qname):
        return _FileLock(
            os.path.join(self._idx(name), f"queue_{qname}.lock")
        )

    def queue_wake(self, name, qname):
        try:
            os.makedirs(self._idx(name), exist_ok=True)
            return _FifoWake(
                os.path.join(self._idx(name), f"queue_{qname}.wake")
            )
        except OSError:  # exotic fs without FIFO support: degrade to polling
            return _SleepWake()


class _FileLock:
    """Cross-process lock (fcntl.flock on a lock file), reentrant PER
    THREAD: flock conflicts between two fds even within one process, so a
    nested acquisition of the same path (e.g. concurrent-writer
    create_or_open -> checkpoint_state, both under "state-merge") would
    self-deadlock without the thread-local depth count. Distinct threads
    still serialize on the OS lock, as they must."""

    _tls = threading.local()

    def __init__(self, path: str):
        self._path = path
        self._fh = None
        self._nested = False

    def __enter__(self):
        import fcntl

        held = getattr(self._tls, "held", None)
        if held is None:
            held = self._tls.held = {}
        if held.get(self._path, 0) > 0:
            held[self._path] += 1
            self._nested = True
            return self
        os.makedirs(os.path.dirname(self._path), exist_ok=True)
        self._fh = open(self._path, "a+")
        fcntl.flock(self._fh.fileno(), fcntl.LOCK_EX)
        held[self._path] = 1
        return self

    def __exit__(self, *exc):
        import fcntl

        held = self._tls.held
        if self._nested:
            held[self._path] -= 1
            self._nested = False
            return
        held[self._path] = 0
        fcntl.flock(self._fh.fileno(), fcntl.LOCK_UN)
        self._fh.close()
        self._fh = None
