"""Task queue + worker pool tests (parity with the reference's taskqueue
semantics and tasks/*PoolTest.java, SegmentBuildWorkerSentinelTest.java)."""

import threading
import time

import pytest

from vectorsearch_tpu.core.tasks import (
    BuildTask,
    GlobalBuildQueueAdapter,
    GlobalBuildTask,
    TaskQueue,
    VacuumTask,
)


def test_enqueue_if_not_exists_idempotent():
    q = TaskQueue("t")
    assert q.enqueue_if_not_exists("k1", BuildTask(1))
    assert not q.enqueue_if_not_exists("k1", BuildTask(1))  # suppressed
    c = q.await_and_claim(timeout=1)
    assert c.payload == BuildTask(1)
    # still claimed: same key suppressed
    assert not q.enqueue_if_not_exists("k1", BuildTask(1))
    c.complete()
    # completed: key free again
    assert q.enqueue_if_not_exists("k1", BuildTask(1))


def test_fail_requeues_with_throttle():
    clock = [0.0]
    q = TaskQueue("t", default_throttle_s=5.0, clock=lambda: clock[0])
    q.enqueue_if_not_exists("k", BuildTask(3))
    c = q.await_and_claim(timeout=1)
    c.fail()
    # throttled: invisible until clock advances
    assert not q.has_visible_unclaimed_tasks()
    assert q.await_and_claim(timeout=0.01) is None
    clock[0] = 6.0
    c2 = q.await_and_claim(timeout=1)
    assert c2 is not None
    assert c2.attempts == 1


def test_lease_expiry_requeues():
    clock = [0.0]
    q = TaskQueue("t", default_ttl_s=10.0, clock=lambda: clock[0])
    q.enqueue_if_not_exists("k", BuildTask(7))
    c = q.await_and_claim(timeout=1)
    assert q.has_claimed_tasks()
    clock[0] = 11.0  # lease expires; crashed-worker recovery
    c2 = q.await_and_claim(timeout=1)
    assert c2 is not None and c2.payload == BuildTask(7)
    assert c2.attempts == 1
    # the stale claim's complete() is a no-op now
    c.complete()
    assert q.has_claimed_tasks()


def test_await_queue_empty():
    q = TaskQueue("t")
    assert q.await_queue_empty(timeout=0.1)
    q.enqueue_if_not_exists("k", BuildTask(1))
    assert not q.await_queue_empty(timeout=0.1)
    done = []

    def worker():
        c = q.await_and_claim(timeout=2)
        time.sleep(0.1)
        c.complete()
        done.append(1)

    t = threading.Thread(target=worker)
    t.start()
    assert q.await_queue_empty(timeout=5)
    t.join()
    assert done


def test_worker_pool_sentinel_shutdown(storage, rng):
    """close() wakes blocked claimants via sentinels
    (reference: tasks/SegmentBuildWorkerSentinelTest.java)."""
    import numpy as np

    from tests.test_index_e2e import make_index

    idx = make_index(storage, max_segment_size=10, local_worker_threads=3)
    assert idx._build_pool.active_threads == 3
    idx.add_all(rng.normal(size=(25, 8)).astype(np.float32))
    # generous timeout: first jit compile of the build kernels dominates
    assert idx.await_indexing_complete(timeout=180)
    idx.close()
    deadline = time.time() + 10
    while idx._build_pool.active_threads and time.time() < deadline:
        time.sleep(0.05)
    assert idx._build_pool.active_threads == 0


def test_global_adapter_wraps_and_prefixes():
    gq = TaskQueue("global")
    a = GlobalBuildQueueAdapter(gq, "idx/a")
    b = GlobalBuildQueueAdapter(gq, "idx/b")
    assert a.enqueue_if_not_exists("build-segment:0", BuildTask(0))
    # same key, different index: distinct (prefixing)
    assert b.enqueue_if_not_exists("build-segment:0", BuildTask(0))
    # idempotence within an index
    assert not a.enqueue_if_not_exists("build-segment:0", BuildTask(0))
    c = gq.await_and_claim(timeout=1)
    assert isinstance(c.payload, GlobalBuildTask)
    assert c.payload.index_path in ("idx/a", "idx/b")
    with pytest.raises(NotImplementedError):
        a.await_and_claim()


def test_global_await_empty_drains_all_indices():
    gq = TaskQueue("global")
    a = GlobalBuildQueueAdapter(gq, "idx/a")
    b = GlobalBuildQueueAdapter(gq, "idx/b")
    b.enqueue_if_not_exists("build-segment:9", BuildTask(9))
    # a's await_queue_empty delegates globally -> blocked by b's task
    assert not a.await_queue_empty(timeout=0.1)
    c = gq.await_and_claim(timeout=1)
    c.complete()
    assert a.await_queue_empty(timeout=1)


# ---------------------------------------------------------------------------
# Durable queues (journaled through storage; reference: the FDB-backed
# taskqueue persists every enqueue/claim/retry, SURVEY.md §5.3)
# ---------------------------------------------------------------------------


def test_durable_queue_survives_restart(storage):
    from vectorsearch_tpu.core.tasks import DurableTaskQueue, CompactTask

    q1 = DurableTaskQueue("q", storage, "idx", "maint")
    q1.enqueue_if_not_exists("compact:[1, 2]", CompactTask((1, 2)))
    q1.close()

    q2 = DurableTaskQueue("q", storage, "idx", "maint")
    # idempotence across restart: same key suppressed
    assert not q2.enqueue_if_not_exists("compact:[1, 2]", CompactTask((1, 2)))
    c = q2.await_and_claim(timeout=1)
    assert c.payload == CompactTask((1, 2))
    c.complete()
    # completion journaled: a third instance sees an empty queue
    q3 = DurableTaskQueue("q", storage, "idx", "maint")
    assert not q3.has_visible_unclaimed_tasks()


def test_durable_queue_claimed_at_crash_is_requeued(storage):
    from vectorsearch_tpu.core.tasks import DurableTaskQueue

    q1 = DurableTaskQueue("q", storage, "idx", "build")
    q1.enqueue_if_not_exists("build-segment:3", BuildTask(3))
    claim = q1.await_and_claim(timeout=1)
    assert claim is not None
    # crash: no complete()/fail(); a new process restores it claimable
    q2 = DurableTaskQueue("q", storage, "idx", "build")
    c2 = q2.await_and_claim(timeout=1)
    assert c2 is not None and c2.payload == BuildTask(3)
    assert c2.attempts == 1  # dead worker's lease counted as one attempt


def test_durable_queue_skips_sentinels(storage):
    from vectorsearch_tpu.core.tasks import DurableTaskQueue

    q1 = DurableTaskQueue("q", storage, "idx", "build")
    q1.enqueue(BuildTask(-1))  # shutdown sentinel: process-local
    q1.enqueue_if_not_exists("build-segment:7", BuildTask(7))
    q2 = DurableTaskQueue("q", storage, "idx", "build")
    c = q2.await_and_claim(timeout=1)
    assert c.payload == BuildTask(7)
    assert not q2.has_visible_unclaimed_tasks()


def test_durable_queue_global_payloads_roundtrip(storage):
    from vectorsearch_tpu.core.tasks import (
        DurableTaskQueue, GlobalMaintenanceTask, VacuumTask,
        task_payload_to_json, task_payload_from_json,
    )

    p = GlobalMaintenanceTask("idx/a", VacuumTask(4, 0.5))
    assert task_payload_from_json(task_payload_to_json(p)) == p
    q1 = DurableTaskQueue("g", storage, "_global", "maint")
    q1.enqueue_if_not_exists("idx/a:vacuum-if-needed:4", p)
    q2 = DurableTaskQueue("g", storage, "_global", "maint")
    assert q2.await_and_claim(timeout=1).payload == p


def test_index_durable_queues_e2e(storage, rng):
    """Tasks enqueued before a crash are claimable after reopen, and the
    reopen-time re-derivation does not duplicate them (same idempotent key)."""
    import numpy as np
    from vectorsearch_tpu.config import VectorIndexConfig
    from vectorsearch_tpu.core.index import VectorIndex

    cfg = dict(storage=storage, name="dur", dimension=8, max_segment_size=10,
               pq_m=4, pq_k=16, graph_degree=8, graph_build_breadth=32,
               durable_task_queues=True)
    idx = VectorIndex.create_or_open(VectorIndexConfig(**cfg))
    x = rng.normal(size=(25, 8)).astype(np.float32)
    gids = idx.add_all(x)  # 2 rotations -> 2 build tasks pending
    idx.close()

    idx2 = VectorIndex.create_or_open(VectorIndexConfig(**cfg))
    keys = set()
    claims = []
    while True:
        c = idx2.build_queue.await_and_claim(timeout=0.2)
        if c is None:
            break
        keys.add(c.key)
        claims.append(c)
    assert keys == {"build-segment:0", "build-segment:1"}  # no duplicates
    for c in claims:
        idx2.build_service.build(c.payload.seg_id)
        c.complete()
    res = idx2.query(x[3], 5)
    assert gids[3] in [r.gid for r in res]
    idx2.close()
