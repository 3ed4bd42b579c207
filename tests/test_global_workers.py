"""Global (cross-index) worker runtime tests
(parity with tasks/GlobalTaskQueueIntegrationTest.java and
GlobalTaskQueueEdgeCaseTest.java): two indices sharing queues, config
reconstruction from persisted IndexMeta, malformed-task handling."""

import numpy as np
import pytest

from vectorsearch_tpu.config import (
    GlobalTaskQueueConfig,
    VectorIndexConfig,
    WorkerConfig,
)
from vectorsearch_tpu.core.index import VectorIndex
from vectorsearch_tpu.core.tasks import (
    BuildTask,
    GlobalBuildTask,
    GlobalWorkerRunner,
    TaskQueue,
)
from vectorsearch_tpu.types import SegmentState


def make_global_setup(storage):
    bq = TaskQueue("global-build", default_throttle_s=0.05)
    mq = TaskQueue("global-maint", default_throttle_s=0.05)
    gq = GlobalTaskQueueConfig(build_queue=bq, maintenance_queue=mq)

    def mk(name):
        return VectorIndex.create_or_open(
            VectorIndexConfig(
                storage=storage, name=name, dimension=8, max_segment_size=10,
                pq_m=4, pq_k=16, graph_degree=8, graph_build_breadth=32,
                global_task_queue_config=gq,
            )
        )

    return bq, mq, mk


def test_global_mode_skips_local_pools(storage):
    bq, mq, mk = make_global_setup(storage)
    idx = mk("g/one")
    assert idx._build_pool is None
    assert idx._maint_pool is None
    idx.close()


def test_two_indices_share_queues_and_worker_builds_both(storage, rng):
    bq, mq, mk = make_global_setup(storage)
    a = mk("g/a")
    b = mk("g/b")
    a.add_all(rng.normal(size=(15, 8)).astype(np.float32))  # rotates seg0
    b.add_all(rng.normal(size=(12, 8)).astype(np.float32))
    a.checkpoint()
    b.checkpoint()
    assert bq.has_visible_unclaimed_tasks()

    worker = WorkerConfig(default_graph_build_breadth=32, default_graph_alpha=1.2)
    runner = GlobalWorkerRunner(storage, worker, bq, mq)
    # process tasks synchronously (no threads, deterministic)
    while runner.run_once_build(timeout=0.2):
        pass

    # the runner reconstructed configs from persisted IndexMeta and sealed
    # both indices' pending segments in ITS OWN runtimes
    ra = runner._indexes["g/a"]
    rb = runner._indexes["g/b"]
    assert ra.store.segments[0].state == SegmentState.SEALED
    assert rb.store.segments[0].state == SegmentState.SEALED
    # reconstructed config matches persisted data-format params
    assert ra.config.dimension == 8 and ra.config.pq_m == 4
    assert ra.config.effective.local_worker_threads == 0
    runner.close()
    a.close()
    b.close()


def test_malformed_global_task_fails_claim(storage):
    bq, mq, mk = make_global_setup(storage)
    bq.enqueue_if_not_exists("bogus", GlobalBuildTask("no/such/index", BuildTask(0)))
    worker = WorkerConfig()
    runner = GlobalWorkerRunner(storage, worker, bq, mq)
    assert not runner.run_once_build(timeout=0.5)  # fails gracefully
    # task requeued for retry (throttled)
    assert not bq.await_queue_empty(timeout=0.01)
    runner.close()


def test_runner_threads_and_sentinel_shutdown(storage, rng):
    bq, mq, mk = make_global_setup(storage)
    a = mk("g/thr")
    a.add_all(rng.normal(size=(12, 8)).astype(np.float32))
    a.checkpoint()
    worker = WorkerConfig()
    runner = GlobalWorkerRunner(storage, worker, bq, mq)
    runner.start(build_threads=1, maintenance_threads=1)
    assert a.await_indexing_complete(timeout=180)  # adapter delegates globally
    runner.close()
    a.close()


# ---------------------------------------------------------------------------
# Cross-process distribution: SharedTaskQueue over shared storage + refresh()
# (the reference's multi-process story: FDB queues + workers in other JVMs,
#  tasks/GlobalTaskQueueIntegrationTest.java)
# ---------------------------------------------------------------------------


def make_shared_setup(storage):
    from vectorsearch_tpu.core.tasks import SharedTaskQueue

    bq = SharedTaskQueue("gb", storage, "_global", "build",
                         default_throttle_s=0.05)
    mq = SharedTaskQueue("gm", storage, "_global", "maint",
                         default_throttle_s=0.05)
    return bq, mq, GlobalTaskQueueConfig(build_queue=bq, maintenance_queue=mq)


def test_shared_queue_basic_semantics(storage):
    from vectorsearch_tpu.core.tasks import SharedTaskQueue

    q = SharedTaskQueue("q", storage, "_global", "build")
    assert q.enqueue_if_not_exists("k", BuildTask(1))
    assert not q.enqueue_if_not_exists("k", BuildTask(1))
    # a SECOND handle over the same storage sees and claims the task
    q2 = SharedTaskQueue("q2", storage, "_global", "build")
    c = q2.await_and_claim(timeout=1)
    assert c is not None and c.payload == BuildTask(1)
    # claimed: invisible to others until lease expiry
    assert q.await_and_claim(timeout=0.1) is None
    c.fail()  # requeue with throttle
    import time as _t
    _t.sleep(0.1)
    c2 = q.await_and_claim(timeout=1)
    assert c2 is not None and c2.attempts >= 1
    c2.complete()
    assert q.await_queue_empty(timeout=1)


def test_shared_queue_lease_expiry(storage):
    from vectorsearch_tpu.core.tasks import SharedTaskQueue

    q = SharedTaskQueue("q", storage, "_global", "build", default_ttl_s=0.1)
    q.enqueue_if_not_exists("k", BuildTask(5))
    c = q.await_and_claim(timeout=1)  # claim then "crash" (no complete)
    assert c is not None
    import time as _t
    _t.sleep(0.15)  # lease expires
    c2 = q.await_and_claim(timeout=1)
    assert c2 is not None and c2.payload == BuildTask(5)
    assert c2.attempts == 1


def test_shared_queue_worker_process_builds_and_refresh_picks_up(storage, rng):
    """Producer index + a SEPARATE GlobalWorkerRunner ('another process':
    fresh runtime over the same storage and shared queues). The producer
    sees the sealed segment after refresh() and serves queries from it."""
    from vectorsearch_tpu.core.tasks import GlobalWorkerRunner

    bq, mq, gq = make_shared_setup(storage)
    producer = VectorIndex.create_or_open(
        VectorIndexConfig(
            storage=storage, name="xp", dimension=8, max_segment_size=10,
            pq_m=4, pq_k=16, graph_degree=8, graph_build_breadth=32,
            global_task_queue_config=gq,
        )
    )
    x = rng.normal(size=(15, 8)).astype(np.float32)
    gids = producer.add_all(x)  # rotation -> 1 build task on the shared queue
    with producer.store.lock:
        assert producer.store.segments[0].state == SegmentState.PENDING

    worker = GlobalWorkerRunner(storage, WorkerConfig(), bq, mq)
    assert worker.run_once_build(timeout=2)
    worker.close()

    assert producer.refresh() == [0]
    with producer.store.lock:
        assert producer.store.segments[0].state == SegmentState.SEALED
        assert producer.store.segments[0].codes_np is not None
    res = producer.query(x[3], 5)
    assert gids[3] in [r.gid for r in res]
    # idempotent: nothing further to refresh
    assert producer.refresh() == []
    producer.close()


def test_shared_queue_true_subprocess_worker(tmp_path, rng):
    """REAL two-process distribution over DiskStorage: a child Python process
    runs the GlobalWorkerRunner against the shared directory (fcntl-locked
    queue journal), builds the segment, and exits; the parent refreshes."""
    import subprocess
    import sys

    from vectorsearch_tpu.core.persist import DiskStorage

    root = str(tmp_path / "shared")
    storage = DiskStorage(root)
    bq, mq, gq = make_shared_setup(storage)
    producer = VectorIndex.create_or_open(
        VectorIndexConfig(
            storage=storage, name="xp2", dimension=8, max_segment_size=10,
            pq_m=4, pq_k=16, graph_degree=8, graph_build_breadth=32,
            global_task_queue_config=gq,
        )
    )
    x = rng.normal(size=(12, 8)).astype(np.float32)
    gids = producer.add_all(x)

    child = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from vectorsearch_tpu.core.persist import DiskStorage
from vectorsearch_tpu.core.tasks import GlobalWorkerRunner, SharedTaskQueue
from vectorsearch_tpu.config import WorkerConfig
storage = DiskStorage({root!r})
bq = SharedTaskQueue("gb", storage, "_global", "build")
mq = SharedTaskQueue("gm", storage, "_global", "maint")
w = GlobalWorkerRunner(storage, WorkerConfig(), bq, mq)
assert w.run_once_build(timeout=5)
w.close()
print("WORKER_DONE")
"""
    proc = subprocess.run(
        [sys.executable, "-c", child], capture_output=True, text=True,
        timeout=300, cwd="/root/repo",
    )
    assert "WORKER_DONE" in proc.stdout, proc.stderr[-2000:]

    assert producer.refresh() == [0]
    res = producer.query(x[3], 5)
    assert gids[3] in [r.gid for r in res]
    producer.close()


# ---------------------------------------------------------------------------
# Wake channels: claims block on storage.queue_wake (the analogue of the
# reference blocking on FDB watches, tasks/SegmentBuildWorker.java:42-53) —
# no 50 ms polling. Latency and no-busy-poll asserted for both backends.
# ---------------------------------------------------------------------------


def test_shared_queue_wake_memory_no_polling(storage):
    """An idle claimer over MemoryStorage reads the journal only on real
    events (Condition wake channel), and a late enqueue unblocks it fast."""
    import threading
    import time as _t

    from vectorsearch_tpu.core.tasks import SharedTaskQueue

    q = SharedTaskQueue("q", storage, "_global", "build")
    reads = [0]
    orig = storage.read_queue

    def counting_read(name, qname):
        reads[0] += 1
        return orig(name, qname)

    storage.read_queue = counting_read
    got = {}

    def waiter():
        c = q.await_and_claim(timeout=5)
        got["t"] = _t.monotonic()
        got["claim"] = c

    th = threading.Thread(target=waiter)
    th.start()
    _t.sleep(0.5)  # idle window: a 50 ms poller would do ~10 reads
    reads_idle = reads[0]
    t_enq = _t.monotonic()
    q.enqueue_if_not_exists("k", BuildTask(3))
    th.join(timeout=5)
    assert got["claim"] is not None and got["claim"].payload == BuildTask(3)
    assert got["t"] - t_enq < 0.2, "wake latency should be ~ms, not a poll tick"
    assert reads_idle <= 3, f"idle claimer polled the journal {reads_idle}x"
    got["claim"].complete()
    q.close()


def test_shared_queue_wake_fifo_cross_process(tmp_path):
    """REAL cross-process wake over DiskStorage: a child process blocks in
    await_and_claim; the parent enqueues after the child is provably idle;
    the child's measured claim latency beats the 5 s safety resync (so the
    FIFO — not the fallback timer — delivered the wake)."""
    import subprocess
    import sys
    import time as _t

    from vectorsearch_tpu.core.persist import DiskStorage
    from vectorsearch_tpu.core.tasks import SharedTaskQueue

    root = str(tmp_path / "wk")
    child = f"""
import time, sys
from vectorsearch_tpu.core.persist import DiskStorage
from vectorsearch_tpu.core.tasks import SharedTaskQueue
storage = DiskStorage({root!r})
q = SharedTaskQueue("gb", storage, "_global", "build")
print("WAITING", flush=True)
t0 = time.monotonic()
c = q.await_and_claim(timeout=30)
assert c is not None
c.complete()
print(f"CLAIMED {{time.monotonic() - t0:.3f}}", flush=True)
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", child], stdout=subprocess.PIPE, text=True,
        cwd="/root/repo",
    )
    try:
        assert proc.stdout.readline().strip() == "WAITING"
        _t.sleep(1.2)  # let the child pass its first journal read and block
        storage = DiskStorage(root)
        q = SharedTaskQueue("gb", storage, "_global", "build")
        t_enq = _t.monotonic()
        q.enqueue_if_not_exists("k", BuildTask(7))
        line = proc.stdout.readline().strip()
        dt = _t.monotonic() - t_enq
        assert line.startswith("CLAIMED")
        assert dt < 2.0, f"cross-process wake took {dt:.2f}s (resync, not FIFO)"
        assert q.await_queue_empty(timeout=5)
    finally:
        proc.wait(timeout=30)


def test_fifo_wake_unit(tmp_path):
    """_FifoWake: wait() blocks until notify(); notify with no waiter is a
    no-op; stale bytes wake the next waiter (never lost)."""
    import threading
    import time as _t

    from vectorsearch_tpu.core.persist import _FifoWake

    w = _FifoWake(str(tmp_path / "x.wake"))
    w.notify()  # no FIFO yet: no-op
    woke = []

    def waiter():
        t0 = _t.monotonic()
        w.wait(5.0)
        woke.append(_t.monotonic() - t0)

    th = threading.Thread(target=waiter)
    th.start()
    _t.sleep(0.2)
    w.notify()
    th.join(timeout=5)
    assert woke and woke[0] < 1.0
    # a notify issued between journal-read and wait() is not lost
    w.notify()
    t0 = _t.monotonic()
    w.wait(5.0)
    assert _t.monotonic() - t0 < 0.5
    w.close()
