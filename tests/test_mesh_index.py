"""E2e mesh-sharded VectorIndex: sealed segments row-sharded over an 8-device
mesh, SPMD flat queries with ICI merge, psum-reduced PQ training
(VERDICT r1 missing #3 / SURVEY §7 step 7; reference analogue: per-segment
async fan-out + merge, fdb/FdbVectorIndex.java:417-470)."""

import jax
import numpy as np
import pytest

from vectorsearch_tpu.config import VectorIndexConfig
from vectorsearch_tpu.parallel.mesh import make_mesh

from tests.test_index_e2e import gaussian, make_index, run_builds


@pytest.fixture
def mesh():
    return make_mesh()  # 8 virtual CPU devices (conftest)


def _recall_at_k(res_gids, x, q, k):
    hits = 0
    for i in range(q.shape[0]):
        truth = set(np.argsort(np.linalg.norm(x - q[i], axis=1))[:k].tolist())
        hits += len(truth & set(g for g in res_gids[i] if g >= 0))
    return hits / (q.shape[0] * k)


def test_mesh_sealed_segment_is_row_sharded(storage, rng, mesh):
    idx = make_index(storage, max_segment_size=128, mesh=mesh)
    x = gaussian(rng, 128)  # exactly the cap: strict-cap rotation
    idx.add_all(x)
    run_builds(idx)
    sealed = [s for s in idx.store.segments.values() if s.state.name == "SEALED"]
    assert len(sealed) == 1
    idx.query_batch(x[:4], 5)  # materializes device planes
    seg = sealed[0]
    for arr in (seg.vectors_dev, seg.codes_dev, seg.exists_dev, seg.alive_dev):
        assert len(arr.sharding.device_set) == 8, arr.sharding
    assert len(seg.codebook_dev.sharding.device_set) == 8  # replicated
    # ACTIVE segment stays unsharded (incremental appends)
    active = [s for s in idx.store.segments.values() if s.state.name == "ACTIVE"]
    assert active and len(active[0].vectors_dev.sharding.device_set) == 1
    idx.close()


def test_mesh_query_recall_matches_single_device(storage, rng, mesh):
    """One 3-segment corpus, mesh vs single-device: both must clear the same
    recall gate against exact ground truth, and agree with each other on
    nearly every result (PQ init differs across the two trainers)."""
    x = gaussian(rng, 300)
    q = x[:32]
    k = 10

    idx_m = make_index(storage, name="mesh", max_segment_size=128, mesh=mesh)
    gm_ids = idx_m.add_all(x)
    run_builds(idx_m)
    gm, sm, dm = idx_m.query_batch_arrays(q, k)

    from vectorsearch_tpu.core.persist import MemoryStorage

    idx_s = make_index(MemoryStorage(), name="single", max_segment_size=128)
    idx_s.add_all(x)
    run_builds(idx_s)
    gs, ss, ds = idx_s.query_batch_arrays(q, k)

    r_m = _recall_at_k(gm, x, q, k)
    r_s = _recall_at_k(gs, x, q, k)
    assert r_m >= 0.9, f"mesh recall {r_m}"
    assert r_s >= 0.9, f"single-device recall {r_s}"
    # self-hit identical
    assert np.array_equal(gm[:, 0], gs[:, 0])
    # scores of shared results agree to float tolerance
    assert np.allclose(sm[:, 0], ss[:, 0], atol=1e-4)
    idx_m.close()
    idx_s.close()


def test_mesh_delete_drops_rows_and_wal_survives_reopen(storage, rng, mesh):
    idx = make_index(storage, max_segment_size=128, mesh=mesh)
    x = gaussian(rng, 128)
    gids = idx.add_all(x)
    run_builds(idx)
    first = idx.query_batch(x[:1], 5)[0]
    assert first[0].gid == gids[0]
    idx.delete(gids[0])
    again = idx.query_batch(x[:1], 5)[0]
    assert gids[0] not in [r.gid for r in again]
    idx.close()

    idx2 = make_index(storage, max_segment_size=128, mesh=mesh)
    reopened = idx2.query_batch(x[:1], 5)[0]
    assert gids[0] not in [r.gid for r in reopened]
    idx2.close()


def test_mesh_strict_ef_and_brute_merge(storage, rng, mesh):
    """Mesh + flat_strict composes; results merge with the unsharded ACTIVE
    segment's brute-force entries (mixed device sets -> host merge)."""
    idx = make_index(storage, max_segment_size=128, mesh=mesh,
                     flat_ef_semantics="strict")
    x = gaussian(rng, 150)  # 128 sealed + 22 ACTIVE
    gids = idx.add_all(x)
    run_builds(idx)
    res = idx.query_batch(x[140:141], 5)[0]
    assert res[0].gid == gids[140]  # ACTIVE row found via brute merge
    res2 = idx.query_batch(x[:1], 5)[0]
    assert res2[0].gid == gids[0]  # sealed row found via SPMD path
    idx.close()


def test_mesh_config_validation():
    from vectorsearch_tpu.core.persist import MemoryStorage

    m = make_mesh()
    with pytest.raises(ValueError, match="sealedSearchMode"):
        VectorIndexConfig(storage=MemoryStorage(), name="x", dimension=8,
                          pq_m=4, pq_k=16, mesh=m, sealed_search_mode="graph")
    with pytest.raises(ValueError, match="devicePlacement"):
        VectorIndexConfig(storage=MemoryStorage(), name="x", dimension=8,
                          pq_m=4, pq_k=16, mesh=m,
                          device_placement="round_robin")
    with pytest.raises(ValueError, match="mesh"):
        VectorIndexConfig(storage=MemoryStorage(), name="x", dimension=8,
                          pq_m=4, pq_k=16, mesh="not-a-mesh")
    # 8 devices divide the 128-row pad: OK
    VectorIndexConfig(storage=MemoryStorage(), name="x", dimension=8,
                      pq_m=4, pq_k=16, mesh=m, max_segment_size=100)


def test_mesh_compaction_split_keeps_cap_divisibility(storage, rng, mesh):
    """An oversized compaction under a mesh splits into maxSegmentSize-capped
    destinations, so every dest's cap_pad keeps dividing the mesh (r2 VERDICT
    #5 mesh edge: a merged dest sized to total live rows could have a cap_pad
    the mesh doesn't divide)."""
    idx = make_index(storage, max_segment_size=128, mesh=mesh,
                     compaction_min_fragmentation=0.0)
    x = gaussian(rng, 384)  # 3 full sealed segments
    gids = idx.add_all(x)
    run_builds(idx)
    idx.delete_all(gids[:40])  # 344 live -> 3 capped dests (128,128,88)
    assert idx.maintenance.mark_candidates_compacting([0, 1, 2])
    first = idx.maintenance.compact_segments([0, 1, 2])
    assert first is not None
    with idx.store.lock:
        dests = [s for s in idx.store.segments.values()
                 if s.seg_id >= first and s.state.name == "SEALED"]
        assert len(dests) == 3
        assert sorted(d.meta.count for d in dests) == [88, 128, 128]
        n_dev = len(mesh.devices.flatten())
        assert all(d.cap_pad % n_dev == 0 for d in dests)
    # queries stay correct through the SPMD path over the new segments
    g, s, d = idx.query_batch_arrays(x[40:44], 3)
    assert [int(r[0]) for r in g] == gids[40:44]
    idx.close()
