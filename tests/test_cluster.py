"""Multi-host (DCN) query scale-out: shard-owning ClusterQueryServer processes
plus the merging ClusterClient router (parallel/cluster.py). The reference
gets cross-host serving for free from FDB (any process reads any range,
fdb/FdbVectorStore.java); here the router's per-host top-k merge must equal
the single-process fan-in (fdb/FdbVectorIndex.java:417-470)."""

import subprocess
import sys
import threading

import numpy as np
import pytest

from vectorsearch_tpu.config import VectorIndexConfig
from vectorsearch_tpu.core.index import VectorIndex
from vectorsearch_tpu.core.persist import DiskStorage
from vectorsearch_tpu.params import Mode, SearchParams, SeedStrategy
from vectorsearch_tpu.parallel.cluster import ClusterClient, ClusterQueryServer

from tests.test_index_e2e import gaussian, make_index, run_builds


def clustered(rng, n, d=16, n_centers=8):
    centers = rng.normal(size=(n_centers, d)).astype(np.float32) * 4
    return (centers[rng.integers(0, n_centers, n)]
            + rng.normal(size=(n, d)).astype(np.float32)).astype(np.float32)


def build_disk_index(root, x, payloads=None, **kw):
    cfg = dict(storage=DiskStorage(root), name="cl", dimension=x.shape[1],
               pq_m=4, pq_k=16, max_segment_size=100, graph_degree=16,
               graph_build_breadth=64, local_worker_threads=0,
               local_maintenance_worker_threads=0)
    cfg.update(kw)
    idx = VectorIndex.create_or_open(VectorIndexConfig(**cfg))
    gids = idx.add_all(x, payloads)
    run_builds(idx)
    idx.checkpoint()
    return idx, gids


def test_params_wire_roundtrip():
    p = SearchParams(ef_search=77, beam_width=9, max_iters=3,
                     seed_strategy=SeedStrategy.RANDOM_PIVOTS, pivots=5,
                     mode=Mode.BEST_FIRST, normalize_on_read=True)
    assert SearchParams.from_dict(p.to_dict()) == p


def test_segment_shard_validation(storage):
    with pytest.raises(ValueError, match="segmentShard"):
        VectorIndexConfig(storage=storage, name="x", dimension=8, pq_m=4,
                          pq_k=16, segment_shard=(2, 2))
    with pytest.raises(ValueError, match="segmentShard"):
        VectorIndexConfig(storage=storage, name="x", dimension=8, pq_m=4,
                          pq_k=16, segment_shard="nope")


def test_segment_shard_filters_queries(storage, rng):
    idx = make_index(storage, max_segment_size=50)
    x = gaussian(rng, 150)
    gids = idx.add_all(x)
    run_builds(idx)
    full, _, _ = idx.query_batch_arrays(x[:4], 5)
    idx.close()
    sharded = VectorIndex.create_or_open(VectorIndexConfig(
        storage=storage, name="idx", dimension=8, max_segment_size=50,
        pq_m=4, pq_k=16, graph_degree=16, graph_build_breadth=64,
        local_worker_threads=0, local_maintenance_worker_threads=0,
        segment_shard=(0, 2),
    ))
    part, _, _ = sharded.query_batch_arrays(x[:4], 5)
    owned = {s.meta.segment_id for s in sharded.store.snapshot_segments()
             if s.meta.segment_id % 2 == 0}
    for g in part.reshape(-1).tolist():
        if g >= 0:
            sid, _vid = sharded.resolve_ids([g])[0]
            assert sid % 2 == 0
    assert owned and len(owned) < 4  # really a strict subset of segments
    sharded.close()


def test_resolve_payloads(storage, rng):
    idx = make_index(storage, max_segment_size=30)
    x = gaussian(rng, 40)
    payloads = [f"p{i}".encode() if i % 2 else None for i in range(40)]
    gids = idx.add_all(x, payloads)
    got = idx.resolve_payloads([gids[1], gids[2], -1, 10**9, None])
    assert got == [b"p1", None, None, None, None]
    idx.close()


def test_inprocess_server_roundtrip(tmp_path, rng):
    """One server (whole index) over the wire == direct arrays API."""
    x = clustered(rng, 250)
    payloads = [f"pay{i}".encode() for i in range(250)]
    idx, gids = build_disk_index(str(tmp_path / "one"), x, payloads)
    srv = ClusterQueryServer(idx, port=0).start()
    client = ClusterClient([srv.address])
    try:
        assert client.ping()[0]["ok"]
        g, s, d = client.query_batch_arrays(x[:16], 5)
        dg, ds, dd = idx.query_batch_arrays(x[:16], 5)
        np.testing.assert_array_equal(g, dg)
        np.testing.assert_allclose(s, ds, rtol=1e-6)
        # payload fetch over the wire
        g2, _, _, pl = client.query_batch_arrays(x[:4], 3, want_payloads=True)
        for qi in range(4):
            for j in range(3):
                if g2[qi, j] >= 0:
                    assert pl[qi][j] == payloads[gids.index(int(g2[qi, j]))]
        # object API through the router
        res = client.query_batch(x[:2], 3)
        assert res[0][0].gid == dg[0, 0] and res[0][0].payload is not None
        # errors surface as RuntimeError, not a dead connection
        with pytest.raises(RuntimeError, match="dimension"):
            client.query_batch_arrays(np.zeros((2, 7), np.float32), 3)
        g3, _, _ = client.query_batch_arrays(x[:4], 5)  # conn still usable
        np.testing.assert_array_equal(g3, dg[:4])
    finally:
        client.shutdown_servers()
        srv.close()
        idx.close()


def test_sharded_router_merge_matches_single_process(tmp_path, rng):
    """Two shard servers (seg_id % 2) merged by the router == one process
    owning everything — same gids in the same order at k=10."""
    root = str(tmp_path / "shards")
    x = clustered(rng, 400)
    idx, gids = build_disk_index(root, x)
    params = SearchParams(ef_search=64, beam_width=32, max_iters=4,
                          mode=Mode.BEST_FIRST)
    want_g, want_s, _ = idx.query_batch_arrays(x[:32], 10, params)
    n_segs = len(idx.store.snapshot_segments())
    assert n_segs >= 4
    idx.close()

    shards = []
    for sh in range(2):
        sidx = VectorIndex.create_or_open(VectorIndexConfig(
            storage=DiskStorage(root), name="cl", dimension=x.shape[1],
            pq_m=4, pq_k=16, max_segment_size=100, graph_degree=16,
            graph_build_breadth=64, local_worker_threads=0,
            local_maintenance_worker_threads=0, segment_shard=(sh, 2),
        ))
        shards.append((sidx, ClusterQueryServer(sidx, port=0).start()))
    client = ClusterClient([srv.address for _, srv in shards])
    try:
        got_g, got_s, _ = client.query_batch_arrays(x[:32], 10, params)
        # scores must match exactly; gid order can differ only on ties
        np.testing.assert_allclose(got_s, want_s, rtol=1e-5)
        agree = (got_g == want_g).mean()
        assert agree > 0.95, agree
    finally:
        client.shutdown_servers()
        for sidx, srv in shards:
            srv.close()
            sidx.close()


def test_true_subprocess_cluster(tmp_path, rng):
    """REAL multi-process serving: two child processes each own a shard over
    the shared DiskStorage; the parent routes and merges."""
    root = str(tmp_path / "proc")
    x = clustered(rng, 300)
    idx, gids = build_disk_index(root, x)
    want_g, want_s, _ = idx.query_batch_arrays(x[:8], 10)
    idx.close()
    np.save(str(tmp_path / "queries.npy"), x[:8])

    child_src = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from vectorsearch_tpu.config import VectorIndexConfig
from vectorsearch_tpu.core.index import VectorIndex
from vectorsearch_tpu.core.persist import DiskStorage
from vectorsearch_tpu.parallel.cluster import ClusterQueryServer
shard = int(sys.argv[1]); root = sys.argv[2]; dim = int(sys.argv[3])
idx = VectorIndex.create_or_open(VectorIndexConfig(
    storage=DiskStorage(root), name="cl", dimension=dim, pq_m=4, pq_k=16,
    max_segment_size=100, graph_degree=16, graph_build_breadth=64,
    local_worker_threads=0, local_maintenance_worker_threads=0,
    segment_shard=(shard, 2)))
srv = ClusterQueryServer(idx, port=0)
print(f"PORT {srv.address[1]}", flush=True)
srv.serve_forever()
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", child_src, str(sh), root, str(x.shape[1])],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd="/root/repo",
        )
        for sh in range(2)
    ]
    try:
        ports = []
        for p in procs:
            line = p.stdout.readline()
            assert line.startswith("PORT "), (line, p.stderr.read())
            ports.append(int(line.split()[1]))
        client = ClusterClient([("127.0.0.1", pt) for pt in ports])
        got_g, got_s, _ = client.query_batch_arrays(x[:8], 10)
        np.testing.assert_allclose(got_s, want_s, rtol=1e-5)
        assert (got_g == want_g).mean() > 0.95
        client.shutdown_servers()
    finally:
        for p in procs:
            p.terminate()
            p.wait(timeout=30)


def test_cluster_mutation_forwarding(tmp_path, rng):
    """Router forwards add/delete to the writes=True server; read shards see
    the mutations after refresh (WAL delta sync through shared storage)."""
    root = str(tmp_path / "mut")
    x = clustered(rng, 200)
    widx, gids = build_disk_index(root, x, local_worker_threads=1)

    shards = []
    for sh in range(2):
        sidx = VectorIndex.create_or_open(VectorIndexConfig(
            storage=DiskStorage(root), name="cl", dimension=x.shape[1],
            pq_m=4, pq_k=16, max_segment_size=100, graph_degree=16,
            graph_build_breadth=64, local_worker_threads=0,
            local_maintenance_worker_threads=0, segment_shard=(sh, 2),
        ))
        shards.append((sidx, ClusterQueryServer(sidx, port=0).start()))
    wsrv = ClusterQueryServer(widx, port=0, writes=True).start()
    client = ClusterClient([srv.address for _, srv in shards]
                           + [wsrv.address])
    try:
        pings = client.ping()
        assert [p["writes"] for p in pings] == [False, False, True]

        # forwarded add, visible on shards after refresh
        y = clustered(rng, 30)
        new_gids = client.add_all(y, [f"np{i}".encode() for i in range(30)])
        assert len(new_gids) == 30
        client.await_indexing_complete(timeout=60)
        client.refresh()
        g, s, d = client.query_batch_arrays(y[:8], 1)
        assert [int(v) for v in g[:, 0]] == new_gids[:8]

        # resolve through the writer
        pairs = client.resolve_ids(new_gids[:3])
        assert all(p != (-1, -1) for p in pairs)

        # forwarded delete, visible after refresh
        client.delete_all(new_gids[:5])
        client.delete(new_gids[5])
        client.refresh()
        assert client.resolve_ids(new_gids[:6]) == [(-1, -1)] * 6
        g2, _, _ = client.query_batch_arrays(y[:6], 1)
        assert all(int(v) not in set(new_gids[:6]) for v in g2[:, 0])

        # a read shard refuses writes with a clear error
        ro = ClusterClient([shards[0][1].address])
        with pytest.raises(RuntimeError, match="writes"):
            ro.add_all(y[:1])
        ro.close()
    finally:
        client.shutdown_servers()
        wsrv.close()
        widx.close()
        for sidx, srv in shards:
            srv.close()
            sidx.close()


def test_shard_host_ram_is_sharded(tmp_path, rng):
    """A shard host materializes row data ONLY for its own segments (foreign
    segments are meta-only stubs), so host RAM scales ~1/n_shards (r2
    VERDICT #6) — while the router's merge over all shards stays exact."""
    root = str(tmp_path / "ram")
    x = clustered(rng, 400)
    idx, gids = build_disk_index(root, x)
    want_g, want_s, _ = idx.query_batch_arrays(x[:16], 10)
    n_segs = len(idx.store.snapshot_segments())
    full_rows = sum(s.next_row for s in idx.store.snapshot_segments())
    idx.close()

    shards = []
    for sh in range(2):
        sidx = VectorIndex.create_or_open(VectorIndexConfig(
            storage=DiskStorage(root), name="cl", dimension=x.shape[1],
            pq_m=4, pq_k=16, max_segment_size=100, graph_degree=16,
            graph_build_breadth=64, local_worker_threads=0,
            local_maintenance_worker_threads=0, segment_shard=(sh, 2),
        ))
        shards.append(sidx)

    for sh, sidx in enumerate(shards):
        with sidx.store.lock:
            segs = list(sidx.store.segments.values())
        assert len(segs) == n_segs  # full registry view (metas for all)
        owned = [s for s in segs if s.seg_id % 2 == sh]
        foreign = [s for s in segs if s.seg_id % 2 != sh]
        assert owned and foreign
        # foreign segments: stubs — no rows, no payloads, tiny arrays
        for s in foreign:
            assert s.is_stub and s.next_row == 0
            assert s.vectors_np.nbytes <= 128 * s.d_pad * 4  # one cap_pad row block
            assert s.meta.count > 0 or s.state.name == "ACTIVE"  # meta intact
        # owned segments hold their checkpointed rows
        rows = sum(s.next_row for s in owned)
        assert 0 < rows < full_rows
        # host-RAM fraction ~ shard fraction (segments are equal-sized here)
        frac = rows / full_rows
        assert 0.2 <= frac <= 0.8, frac

    # the two shards' materialized rows partition the corpus exactly
    assert sum(
        s.next_row
        for sidx in shards
        for s in sidx.store.snapshot_segments()
        if not s.is_stub
    ) == full_rows

    # queries through the router remain exact
    servers = [ClusterQueryServer(sidx, port=0).start() for sidx in shards]
    client = ClusterClient([srv.address for srv in servers])
    try:
        got_g, got_s, _ = client.query_batch_arrays(x[:16], 10)
        np.testing.assert_allclose(got_s, want_s, rtol=1e-5)
        assert (got_g == want_g).mean() > 0.95
    finally:
        client.shutdown_servers()
        for srv, sidx in zip(servers, shards):
            srv.close()
            sidx.close()
