"""Config validation parity (reference: config/VectorIndexConfigValidationTest.java)."""

import pytest

from vectorsearch_tpu.config import Metric, VectorIndexConfig, WorkerConfig
from vectorsearch_tpu.types import IndexMeta


class FakeStorage:
    pass


def cfg(**kw):
    base = dict(storage=FakeStorage(), name="idx", dimension=16, pq_m=4, pq_k=16)
    base.update(kw)
    return VectorIndexConfig(**base)


def test_defaults_match_reference():
    c = VectorIndexConfig(storage=FakeStorage(), name="idx")
    assert c.dimension == 768
    assert c.metric == Metric.L2
    assert c.max_segment_size == 100_000
    assert c.pq_m == 16 and c.pq_k == 256
    assert c.graph_degree == 64 and c.oversample == 2
    assert c.graph_build_breadth == 256 and c.graph_alpha == 1.2
    assert c.effective.vacuum_min_deleted_ratio == 0.25
    assert c.effective.vacuum_cooldown_s == 0.0
    assert c.effective.max_concurrent_compactions == 1
    # buildTxn*/batchLoadSize/estimatedWorkerCount knobs are deliberately
    # absent: the TPU design has no FDB txn budget or range-read batching
    # (see config.py doc note, VERDICT r3 #5)
    assert not hasattr(c.effective, "build_chunk_limit_bytes")
    assert not hasattr(c.effective, "codebook_batch_load_size")
    assert not hasattr(c.effective, "estimated_worker_count")
    assert c.effective.compaction_min_segments == 2
    assert c.effective.compaction_max_segments == 8
    assert c.effective.compaction_min_fragmentation == 0.1
    assert c.effective.compaction_age_bias_weight == 0.3
    assert c.effective.compaction_size_bias_weight == 0.5
    assert c.effective.compaction_frag_bias_weight == 0.2
    assert c.effective.local_worker_threads == 0


@pytest.mark.parametrize(
    "kw,msg",
    [
        (dict(dimension=0), "dimension"),
        (dict(dimension=-4), "dimension"),
        (dict(max_segment_size=0), "maxSegmentSize"),
        (dict(pq_m=0), "pqM"),
        (dict(pq_k=1), "pqK"),
        (dict(graph_degree=0), "graphDegree"),
        (dict(graph_build_breadth=2, graph_degree=8), "graphBuildBreadth"),
        (dict(graph_alpha=-0.5), "graphAlpha"),
        (dict(oversample=0), "oversample"),
        (dict(local_worker_threads=-1), "localWorkerThreads"),
        (dict(local_maintenance_worker_threads=-1), "localMaintenanceWorkerThreads"),
        (dict(max_concurrent_compactions=-1), "maxConcurrentCompactions"),
        (dict(vacuum_cooldown_s=-1.0), "vacuumCooldown"),
        (dict(vacuum_min_deleted_ratio=1.5), "vacuumMinDeletedRatio"),
        (dict(default_ttl_s=0), "defaultTtl"),
        (dict(default_throttle_s=-1), "defaultThrottle"),
        (dict(compaction_min_segments=1), "compactionMinSegments"),
        (dict(compaction_max_segments=2, compaction_min_segments=4), "compactionMaxSegments"),
        (dict(compaction_min_fragmentation=2.0), "compactionMinFragmentation"),
        (dict(compaction_age_bias_weight=-1.0), "compactionAgeBiasWeight"),
        (dict(compaction_size_bias_weight=-0.1), "compactionSizeBiasWeight"),
        (dict(compaction_frag_bias_weight=-0.1), "compactionFragBiasWeight"),
        (dict(metric="HAMMING"), "metric"),
        (dict(dimension=10, pq_m=3), "divisible"),
    ],
)
def test_builder_rejections(kw, msg):
    with pytest.raises(ValueError, match=msg):
        cfg(**kw)


def test_storage_and_name_required():
    with pytest.raises(ValueError, match="database"):
        VectorIndexConfig(storage=None, name="x")
    with pytest.raises(ValueError, match="indexDir"):
        VectorIndexConfig(storage=FakeStorage(), name=None)


def test_worker_config_delegation():
    w = WorkerConfig(local_worker_threads=3, vacuum_min_deleted_ratio=0.5)
    c = cfg(worker_config=w, local_worker_threads=7)
    # operational getters delegate to worker_config when present
    assert c.effective.local_worker_threads == 3
    assert c.effective.vacuum_min_deleted_ratio == 0.5


def test_index_meta_roundtrip_and_validation():
    c = cfg()
    meta = c.to_index_meta()
    c.validate_against_meta(meta)  # same config passes

    for field, bad in [
        ("dimension", 32),
        ("metric", "COSINE"),
        ("max_segment_size", 5),
        ("pq_m", 2),
        ("pq_k", 8),
        ("graph_degree", 3),
        ("oversample", 7),
        ("graph_build_breadth", 999),
        ("graph_alpha", 9.0),
    ]:
        bad_meta = IndexMeta(**{**meta.to_json(), field: bad})
        with pytest.raises(ValueError, match="mismatch"):
            c.validate_against_meta(bad_meta)


def test_index_meta_zero_optional_fields_skip_validation():
    c = cfg()
    meta = c.to_index_meta()
    relaxed = IndexMeta(**{**meta.to_json(), "graph_build_breadth": 0, "graph_alpha": 0.0})
    c.validate_against_meta(relaxed)  # 0 => unknown => no mismatch


def test_from_index_meta_fallbacks():
    w = WorkerConfig(default_graph_build_breadth=256, default_graph_alpha=1.2)
    meta = IndexMeta(
        name="i",
        dimension=16,
        metric="L2",
        max_segment_size=100,
        pq_m=4,
        pq_k=16,
        graph_degree=8,
        oversample=2,
        graph_build_breadth=0,
        graph_alpha=0.0,
    )
    c = VectorIndexConfig.from_index_meta(meta, FakeStorage(), "i", w)
    assert c.graph_build_breadth == 256
    assert c.graph_alpha == 1.2
    # global workers never start local pools
    assert c.effective.local_worker_threads == 0
    assert c.effective.local_maintenance_worker_threads == 0


def test_search_params_validation_and_defaults():
    from vectorsearch_tpu.params import Mode, SearchParams, SeedStrategy

    with pytest.raises(ValueError, match="efSearch"):
        SearchParams(ef_search=0, beam_width=1)
    with pytest.raises(ValueError, match="beamWidth"):
        SearchParams(ef_search=1, beam_width=0)
    with pytest.raises(ValueError, match="maxIters"):
        SearchParams(ef_search=1, beam_width=1, max_iters=0)
    with pytest.raises(ValueError, match="maxExplore"):
        SearchParams(ef_search=1, beam_width=1, max_explore=0)

    p = SearchParams.defaults(k=10, oversample=2)
    assert p.ef_search == max(100, 10 * 2 * 4)
    assert p.beam_width == min(64, max(8, 20))
    assert p.max_iters == 6
    assert p.max_explore == max(p.ef_search * 4, 4096)
    assert p.mode == Mode.BEST_FIRST
    assert p.seed_strategy == SeedStrategy.PQ_SEED_ONLY
    assert p.per_segment_limit_multiplier == 2
    assert not p.normalize_on_read

    p2 = SearchParams.of(64, 32, 4)
    assert p2.max_explore == max(64 * 4, 1024)
    assert p2.mode == Mode.BEAM
