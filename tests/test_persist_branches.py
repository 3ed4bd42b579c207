"""Targeted DiskStorage/wake-channel branch coverage (r5, VERDICT r4 #8):
error and edge paths of the durable layer — torn/corrupt WAL tails, missing
files/dirs, handle cleanup on delete/reset/close, FIFO wake channels —
that the happy-path suites never reach."""

import os
import pickle
import threading
import time

import numpy as np
import pytest

from vectorsearch_tpu.core.persist import (
    DiskStorage,
    MemoryStorage,
    _CondWake,
    _FifoWake,
    _SleepWake,
)


@pytest.fixture
def disk(tmp_path):
    st = DiskStorage(str(tmp_path / "idx"))
    yield st
    st.close()


def test_wal_read_missing_torn_and_corrupt_tails(disk):
    # missing WAL file -> []
    assert disk.wal_read("a", 0) == []
    disk.wal_append("a", 0, {"op": "add", "start": 0, "gids": [1]})
    disk.wal_append("a", 0, {"op": "del", "vids": [0]})
    disk.flush_wals()
    good = disk.wal_read("a", 0)
    assert [r["op"] for r in good] == ["add", "del"]

    path = disk._wal_path("a", 0)
    # torn tail: frame header promises more bytes than exist
    with open(path, "ab") as f:
        f.write((1 << 20).to_bytes(8, "little") + b"xx")
    assert [r["op"] for r in disk.wal_read("a", 0)] == ["add", "del"]

    # corrupt tail: full frame whose payload is not unpicklable
    with open(path, "rb") as f:
        base = f.read()
    junk = b"\x00NOTPICKLE"
    with open(path, "wb") as f:
        f.write(base[: len(base) - 10])  # drop the torn header
    with open(path, "ab") as f:
        f.write(len(junk).to_bytes(8, "little") + junk)
    assert [r["op"] for r in disk.wal_read("a", 0)] == ["add", "del"]


def test_wal_segments_edge_names(disk):
    # missing wal dir -> []
    assert disk.wal_segments("nope") == []
    disk.wal_append("a", 3, {"op": "add"})
    disk.wal_append("a", 11, {"op": "add"})
    # non-.wal and non-numeric names are skipped, not crashed on
    d = disk._wal_dir("a")
    open(os.path.join(d, "junk.txt"), "w").close()
    open(os.path.join(d, "bad.wal"), "w").close()
    assert disk.wal_segments("a") == [3, 11]


def test_wal_reset_open_handle_and_missing(disk):
    disk.wal_append("a", 0, {"op": "add"})
    disk.wal_reset("a", 0)  # closes + removes the live handle
    assert disk.wal_read("a", 0) == []
    disk.wal_reset("a", 0)  # second reset: no handle, no file — no-op


def test_delete_index_closes_handles_and_missing(disk):
    disk.wal_append("a", 0, {"op": "add"})
    disk.write_meta("a", {"dimension": 4})
    disk.delete_index("a")
    assert disk.read_meta("a") is None
    assert disk.wal_read("a", 0) == []
    disk.delete_index("never-existed")  # directory-missing branch


def test_flush_wals_survives_closed_handle(disk):
    disk.wal_append("a", 0, {"op": "add"})
    path = disk._wal_path("a", 0)
    disk._wal_handles[path][0].close()  # fsync will raise ValueError
    disk.flush_wals()  # swallowed; handle stays registered
    disk.wal_append("a", 1, {"op": "add"})
    disk.flush_wals()


def test_meta_state_queue_missing_reads(disk):
    assert disk.read_meta("m") is None
    assert disk.read_state("m") is None
    assert disk.read_queue("m", "build") is None
    disk.write_state("m", {"x": 1})
    assert disk.read_state("m") == {"x": 1}
    disk.write_queue("m", "build", {"tasks": []})
    assert disk.read_queue("m", "build") == {"tasks": []}


def test_list_indexes_skips_meta_less_dirs(disk):
    disk.write_meta("real", {"dimension": 4})
    os.makedirs(os.path.join(disk.root, "stray"), exist_ok=True)
    assert disk.list_indexes() == ["real"]


def test_memory_storage_missing_reads_and_deletes():
    st = MemoryStorage()
    assert st.read_meta("m") is None
    assert st.read_state("m") is None
    assert st.read_segment("m", 0) is None
    assert st.read_queue("m", "q") is None
    assert st.wal_read("m", 0) == []
    assert st.wal_segments("m") == []
    st.delete_segment("m", 0)  # no-ops on absent entries
    st.delete_index("m")
    st.wal_reset("m", 0)


def test_cond_wake_notify_unblocks_waiter():
    w = _CondWake()
    woke = []

    def waiter():
        w.wait(5.0)
        woke.append(True)

    t = threading.Thread(target=waiter)
    t.start()
    time.sleep(0.05)
    w.notify()
    t.join(timeout=2.0)
    assert woke


def test_fifo_wake_roundtrip(tmp_path):
    w = _FifoWake(str(tmp_path / "w.wake"))
    w.notify()  # no FIFO yet: nobody to wake (FileNotFoundError branch)
    woke = []

    def waiter():
        w.wait(5.0)
        woke.append(True)

    t = threading.Thread(target=waiter)
    t.start()
    time.sleep(0.1)  # waiter holds the FIFO open in select()
    w.notify()
    t.join(timeout=2.0)
    assert woke
    w.wait(0.0)  # timeout<=0 fast path
    w.close()
    w.close()  # second close: fd-already-None branch


def test_sleep_wake_bounds_poll():
    w = _SleepWake()
    w.notify()  # no-op
    t0 = time.monotonic()
    w.wait(10.0)  # capped at _POLL_S, not 10 s
    assert time.monotonic() - t0 < 1.0


def test_disk_queue_wake_is_fifo(disk):
    w = disk.queue_wake("a", "build")
    assert isinstance(w, _FifoWake)
    w.close()
