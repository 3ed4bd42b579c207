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
