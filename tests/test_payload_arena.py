"""Payload arena (config.payload_storage="arena"): blob+offset storage with
list-identical semantics, bounded memory at 10M+ rows (VERDICT r1 weak #7;
the reference keeps payloads out of process memory entirely as FDB values,
fdb/FdbVectorStore.java:425-492)."""

import numpy as np

from vectorsearch_tpu.core.payloads import PayloadArena

from tests.test_index_e2e import gaussian, make_index, run_builds


def test_arena_semantics_match_list():
    a = PayloadArena(8)
    a[0] = b"alpha"
    a[3] = b""
    a[5] = bytearray(b"beta")
    assert a[0] == b"alpha" and a[1] is None and a[3] == b"" and a[5] == b"beta"
    a[0] = None  # vacuum clears
    assert a[0] is None
    assert a[0:6] == [None, None, None, b"", None, b"beta"]
    rt = PayloadArena.from_npz_arrays(8, a.to_npz_arrays(6))
    assert [rt[i] for i in range(8)] == [a[i] for i in range(8)]
    assert a.nbytes() < 1000


def test_arena_index_e2e_with_reopen_and_vacuum(storage, rng):
    idx = make_index(storage, max_segment_size=30, payload_storage="arena",
                     vacuum_min_deleted_ratio=0.1)
    x = gaussian(rng, 60)
    payloads = [f"payload-{i}".encode() if i % 3 else None for i in range(60)]
    gids = idx.add_all(x, payloads)
    run_builds(idx)

    res = idx.query(x[7], 1)
    assert res[0].gid == gids[7] and res[0].payload == b"payload-7"
    assert idx.query(x[3], 1)[0].payload is None  # i%3==0 -> None

    idx.delete_all(gids[:10])
    assert idx.maintenance.vacuum_segment(0) == 10
    assert idx.query(x[13], 1)[0].payload == b"payload-13"
    idx.checkpoint()
    idx.close()

    # reopen: arena planes come back from the npz checkpoint
    idx2 = make_index(storage, max_segment_size=30, payload_storage="arena",
                      vacuum_min_deleted_ratio=0.1)
    r = idx2.query(x[13], 1)[0]
    assert r.gid == gids[13] and r.payload == b"payload-13"
    seg0 = idx2.store.segments[0]
    assert not isinstance(seg0.payloads, list)
    idx2.close()


def test_arena_compaction_copies_payloads(storage, rng):
    idx = make_index(storage, max_segment_size=30, payload_storage="arena",
                     compaction_min_fragmentation=0.0)
    x = gaussian(rng, 60)
    gids = idx.add_all(x, [f"p{i}".encode() for i in range(60)])
    run_builds(idx)
    idx.delete_all(gids[:20])
    assert idx.maintenance.mark_candidates_compacting([0, 1])
    dest = idx.maintenance.compact_segments([0, 1])
    assert dest is not None
    r = idx.query(x[42], 1)[0]
    assert r.gid == gids[42] and r.payload == b"p42"
    idx.close()


def test_payload_storage_validated(storage):
    import pytest

    from vectorsearch_tpu.config import VectorIndexConfig

    with pytest.raises(ValueError, match="payloadStorage"):
        VectorIndexConfig(storage=storage, name="x", dimension=8,
                          pq_m=4, pq_k=16, payload_storage="mmap")
