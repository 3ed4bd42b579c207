"""graph_build_mode="skip_for_flat": flat-mode indexes skip the Vamana build
at seal (the reference always builds it because traversal is its only sealed
search, tasks/SegmentBuildService.java:204-209; flat mode never reads
adjacency, so the build and the [cap, R] checkpoint plane are pure waste)."""

import numpy as np
import pytest

from vectorsearch_tpu.config import VectorIndexConfig
from vectorsearch_tpu.core.index import VectorIndex
from vectorsearch_tpu.params import Mode, SearchParams, SeedStrategy

from tests.test_index_e2e import gaussian, make_index, run_builds


def test_validation(storage):
    with pytest.raises(ValueError, match="graphBuildMode"):
        VectorIndexConfig(storage=storage, name="x", dimension=8, pq_m=4,
                          pq_k=16, graph_build_mode="off")


def test_skip_builds_no_graph_and_flat_recall_holds(storage, rng):
    idx = make_index(storage, max_segment_size=100,
                     graph_build_mode="skip_for_flat")
    x = gaussian(rng, 300)
    gids = idx.add_all(x)
    run_builds(idx)
    for seg in idx.store.snapshot_segments():
        if seg.codes_np is not None:
            assert seg.adjacency_np.shape == (seg.cap_pad, 0)
    hits = 0
    for i in range(50):
        truth = set(np.argsort(((x - x[i]) ** 2).sum(1))[:10].tolist())
        got = {gids.index(r.gid) for r in idx.query(x[i], 10)}
        hits += len(truth & got)
    assert hits / 500 >= 0.9
    idx.close()


def test_traversal_modes_fall_back_to_flat(storage, rng, caplog):
    idx = make_index(storage, max_segment_size=100,
                     graph_build_mode="skip_for_flat")
    x = gaussian(rng, 200)
    gids = idx.add_all(x)
    run_builds(idx)
    # BEAM mode (stacked path) and RANDOM_PIVOTS (fallback path) both have no
    # graph to traverse: they must serve from the flat pool, not crash
    beam = SearchParams(ef_search=64, beam_width=16, max_iters=4,
                        mode=Mode.BEAM)
    res = idx.query(x[11], 5, beam)
    assert res and res[0].gid == gids[11]
    piv = SearchParams(ef_search=64, beam_width=16, max_iters=4,
                       seed_strategy=SeedStrategy.RANDOM_PIVOTS,
                       mode=Mode.BEST_FIRST)
    res = idx.query(x[12], 5, piv)
    assert res and res[0].gid == gids[12]
    assert idx._graphless_warned
    idx.close()


def test_reopen_and_vacuum_roundtrip(tmp_path, rng):
    from vectorsearch_tpu.core.persist import DiskStorage

    storage = DiskStorage(str(tmp_path / "gbm"))
    idx = make_index(storage, max_segment_size=100,
                     graph_build_mode="skip_for_flat",
                     vacuum_min_deleted_ratio=0.05)
    x = gaussian(rng, 200)
    gids = idx.add_all(x)
    run_builds(idx)
    idx.delete_all(gids[:20])
    assert idx.maintenance.vacuum_segment(0) == 20  # 0-col graph clear is a no-op
    idx.checkpoint()
    idx.close()

    idx2 = make_index(storage, max_segment_size=100,
                      graph_build_mode="skip_for_flat",
                      vacuum_min_deleted_ratio=0.05)
    seg0 = idx2.store.segments[0]
    assert seg0.adjacency_np.shape[1] == 0  # npz roundtrip keeps 0 columns
    res = idx2.query(x[30], 5)
    assert res[0].gid == gids[30]
    assert not any(r.gid in set(gids[:20]) for r in res)
    idx2.close()
