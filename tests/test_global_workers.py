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
