"""Multi-host query scale-out: shard-owning query servers + a merging router.

The reference scales across processes/hosts through FoundationDB — any
process can serve any query because FDB holds the data
(fdb/FdbVectorStore.java throughout; workers coordinate only through the
FDB-backed task queue, tasks/GlobalWorkerRunner.java). On TPU pods the data
plane is HBM, so scale-out is explicit: each host owns a deterministic shard
of the segments (seg_id % n_hosts — rotation assigns new segments without
coordination), serves its shard's top-k over TCP, and a thin router fans a
query batch out to every host and merges the per-host top-k by score. The
merge is exact: segments are disjoint across hosts, so the union of
per-host candidate sets equals the single-process candidate set.

Within a host the usual device story applies (one chip, round_robin chips,
or a jax.sharding.Mesh with ICI collectives); this module is the DCN layer
above it. Wire format is length-prefixed JSON headers + raw little-endian
array buffers — no pickle, so a malicious peer cannot execute code, but the
protocol is still meant for a trusted cluster network (no auth/TLS).

Consistency: servers see the corpus as of their last ``refresh()`` (storage
snapshots, same as the reference's cross-process visibility); the writing
host serves its own ACTIVE segment live.

Mutations: the router forwards add/delete/resolve to the single server
started with ``writes=True`` (the process holding the writer lease —
core/store.py's single-writer model). Read shards pick the mutations up
through refresh(): the per-mutation WAL doubles as a replication log
(VectorStore.refresh), so a forwarded delete becomes visible on every shard
at its next refresh without re-reading checkpoints.
"""

from __future__ import annotations

import json
import logging
import socket
import struct
import threading
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

LOG = logging.getLogger("vectorsearch_tpu.cluster")

_MAGIC = b"VSC1"
_HDR = struct.Struct("<4sI")  # magic, header-json length


# --------------------------------------------------------------------- wire

def _send_msg(sock: socket.socket, header: dict, buffers: Sequence[bytes] = ()):
    header = dict(header)
    header["buffers"] = [len(b) for b in buffers]
    hj = json.dumps(header).encode()
    sock.sendall(_HDR.pack(_MAGIC, len(hj)))
    sock.sendall(hj)
    for b in buffers:
        sock.sendall(b)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        c = sock.recv(min(n, 1 << 20))
        if not c:
            raise ConnectionError("peer closed mid-message")
        chunks.append(c)
        n -= len(c)
    return b"".join(chunks)


def _recv_msg(sock: socket.socket) -> tuple[dict, list[bytes]]:
    magic, hlen = _HDR.unpack(_recv_exact(sock, _HDR.size))
    if magic != _MAGIC:
        raise ConnectionError(f"bad magic {magic!r}")
    header = json.loads(_recv_exact(sock, hlen))
    buffers = [_recv_exact(sock, n) for n in header.get("buffers", [])]
    return header, buffers


def _arr(buf: bytes, dtype: str, shape) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.dtype(dtype)).reshape(shape)


def _encode_payloads(payloads) -> tuple[bytes, bytes]:
    """(lens int64 LE, concatenated blob); None -> length -1."""
    lens = np.asarray(
        [-1 if p is None else len(p) for p in payloads], np.int64
    )
    blob = b"".join(p for p in payloads if p is not None)
    return lens.tobytes(), blob


def _decode_payloads(lens_buf: bytes, blob: bytes) -> list:
    out, off = [], 0
    for ln in np.frombuffer(lens_buf, np.int64).tolist():
        if ln < 0:
            out.append(None)
        else:
            out.append(blob[off : off + ln])
            off += ln
    return out


# ------------------------------------------------------------------- server

class ClusterQueryServer:
    """Serves one shard of an index over TCP.

    The index should be opened with ``VectorIndexConfig.segment_shard=
    (shard, n_shards)`` so queries touch only the segments this host owns
    (and so HBM holds only that shard). ``refresh_every`` batches trigger a
    storage ``refresh()`` to pick up segments sealed by other processes.
    """

    def __init__(self, index, host: str = "127.0.0.1", port: int = 0,
                 refresh_every: int = 64, writes: bool = False):
        self.index = index
        self.refresh_every = refresh_every
        # ``writes=True`` marks this server as the cluster's writer: the
        # router forwards add/delete/resolve to it (single-writer model —
        # the same process that holds the writer lease; read shards pick the
        # mutations up through their periodic refresh()). The writer should
        # be opened WITHOUT segment_shard so every delete finds its segment.
        self.writes = writes
        self._srv = socket.create_server((host, port))
        self.address = self._srv.getsockname()[:2]
        self._stop = threading.Event()
        self._batches = 0
        self._lock = threading.Lock()
        self._accept_thread: Optional[threading.Thread] = None

    # -- lifecycle

    def start(self) -> "ClusterQueryServer":
        self._accept_thread = threading.Thread(
            target=self._accept_loop, name="vscluster-accept", daemon=True
        )
        self._accept_thread.start()
        return self

    def close(self) -> None:
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass
        if self._accept_thread is not None:
            self._accept_thread.join(timeout=5)

    def serve_forever(self) -> None:
        self.start()
        self._stop.wait()

    # -- internals

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return  # closed
            threading.Thread(
                target=self._serve_conn, args=(conn,), daemon=True
            ).start()

    def _serve_conn(self, conn: socket.socket) -> None:
        with conn:
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            while not self._stop.is_set():
                try:
                    header, buffers = _recv_msg(conn)
                except (ConnectionError, OSError):
                    return
                try:
                    self._handle(conn, header, buffers)
                except Exception as e:  # surface as a protocol error frame
                    LOG.exception("cluster request failed")
                    try:
                        _send_msg(conn, {"ok": False, "error": repr(e)})
                    except OSError:
                        return

    def _handle(self, conn, header: dict, buffers: list[bytes]) -> None:
        op = header.get("op")
        if op == "ping":
            _send_msg(conn, {
                "ok": True, "shard": self.index.config.segment_shard,
                "writes": self.writes,
            })
            return
        if op in ("add", "delete"):
            if not self.writes:
                _send_msg(conn, {
                    "ok": False,
                    "error": "this server is a read shard (writes=False); "
                             "route mutations to the writer",
                })
                return
            if op == "add":
                vecs = _arr(buffers[0], "float32", header["shape"])
                payloads = None
                if len(buffers) >= 3:
                    payloads = _decode_payloads(buffers[1], buffers[2])
                gids = self.index.add_all(vecs, payloads)
                _send_msg(conn, {"ok": True, "n": len(gids)},
                          [np.asarray(gids, np.int64).tobytes()])
            else:
                gids = np.frombuffer(buffers[0], np.int64).tolist()
                self.index.delete_all(gids)
                _send_msg(conn, {"ok": True, "n": len(gids)})
            return
        if op == "resolve":
            gids = np.frombuffer(buffers[0], np.int64).tolist()
            pairs = self.index.resolve_ids(gids)
            _send_msg(conn, {"ok": True, "n": len(pairs)},
                      [np.asarray(pairs, np.int64).tobytes()])
            return
        if op == "await_indexing":
            # queue wait only — no device work, so don't hold the query lock
            done = self.index.await_indexing_complete(header.get("timeout"))
            _send_msg(conn, {"ok": True, "done": bool(done)})
            return
        if op == "refresh":
            changed = self.index.refresh()
            _send_msg(conn, {"ok": True, "refreshed": changed})
            return
        if op == "shutdown":
            _send_msg(conn, {"ok": True})
            self._stop.set()
            try:
                self._srv.close()
            except OSError:
                pass
            return
        if op != "query":
            _send_msg(conn, {"ok": False, "error": f"unknown op {op!r}"})
            return

        qs = _arr(buffers[0], "float32", header["shape"])
        k = int(header["k"])
        params = None
        if header.get("params") is not None:
            from vectorsearch_tpu.params import SearchParams

            params = SearchParams.from_dict(header["params"])
        with self._lock:
            # one device stream per server process; concurrent router
            # connections queue here rather than interleave partial batches
            self._batches += 1
            if self.refresh_every and self._batches % self.refresh_every == 0:
                self.index.refresh()
            gids, scores, dists = self.index.query_batch_arrays(qs, k, params)
        out = {"ok": True, "shape": list(gids.shape)}
        bufs = [
            np.ascontiguousarray(gids, np.int64).tobytes(),
            np.ascontiguousarray(scores, np.float32).tobytes(),
            np.ascontiguousarray(dists, np.float32).tobytes(),
        ]
        if header.get("want_payloads"):
            flat = gids.reshape(-1)
            lens, blob = _encode_payloads(
                self.index.resolve_payloads(flat.tolist())
            )
            out["payloads"] = True
            bufs += [lens, blob]
        _send_msg(conn, out, bufs)


# ------------------------------------------------------------------- client

@dataclass
class _Host:
    addr: tuple
    sock: Optional[socket.socket] = None
    lock: threading.Lock = None  # type: ignore[assignment]

    def connect(self) -> socket.socket:
        if self.sock is None:
            self.sock = socket.create_connection(self.addr, timeout=30)
            self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        return self.sock


class ClusterClient:
    """Fan-out/merge router over a set of ClusterQueryServer endpoints.

    ``query_batch_arrays`` matches VectorIndex's arrays API: per-host top-k
    arrays are concatenated to [Q, H*k] and re-top-k'd by score (scores are
    the merge key in both metrics: L2 -> -dist, cosine -> sim; identical to
    the single-process fan-in of fdb/FdbVectorIndex.java:417-470).
    """

    def __init__(self, endpoints: Sequence[tuple]):
        if not endpoints:
            raise ValueError("at least one endpoint required")
        self._hosts = [
            _Host(tuple(e), lock=threading.Lock()) for e in endpoints
        ]
        self._writer: Optional[_Host] = None  # discovered on first mutation

    def close(self) -> None:
        for h in self._hosts:
            if h.sock is not None:
                try:
                    h.sock.close()
                except OSError:
                    pass
                h.sock = None

    def ping(self) -> list[dict]:
        return [self._rpc(h, {"op": "ping"})[0] for h in self._hosts]

    def refresh(self) -> list[dict]:
        return [self._rpc(h, {"op": "refresh"})[0] for h in self._hosts]

    def shutdown_servers(self) -> None:
        for h in self._hosts:
            try:
                self._rpc(h, {"op": "shutdown"})
            except (RuntimeError, OSError, ConnectionError):
                pass
        self.close()

    def _rpc(self, host: _Host, header: dict, buffers: Sequence[bytes] = ()):
        with host.lock:
            try:
                sock = host.connect()
                _send_msg(sock, header, buffers)
                resp, bufs = _recv_msg(sock)
            except (ConnectionError, OSError):
                # one reconnect: the server may have restarted between batches
                if host.sock is not None:
                    try:
                        host.sock.close()
                    except OSError:
                        pass
                    host.sock = None
                sock = host.connect()
                _send_msg(sock, header, buffers)
                resp, bufs = _recv_msg(sock)
        if not resp.get("ok"):
            raise RuntimeError(f"cluster host {host.addr}: {resp.get('error')}")
        return resp, bufs

    # -- mutations: forwarded to the cluster's single writer ---------------

    def _writer_host(self) -> _Host:
        """Finds (and caches) the endpoint whose server accepts writes."""
        if self._writer is None:
            for h in self._hosts:
                resp, _ = self._rpc(h, {"op": "ping"})
                if resp.get("writes"):
                    self._writer = h
                    break
            else:
                raise RuntimeError(
                    "no cluster endpoint accepts writes (start one "
                    "ClusterQueryServer with writes=True)"
                )
        return self._writer

    def add_all(self, embeddings, payloads: Optional[Sequence] = None) -> list:
        """Forwards a batch insert to the writer; returns assigned gids.
        Read shards see the rows after their next refresh (server-side
        refresh_every, or an explicit client.refresh())."""
        vecs = np.ascontiguousarray(np.asarray(embeddings, np.float32))
        header = {"op": "add", "shape": list(vecs.shape)}
        bufs = [vecs.tobytes()]
        if payloads is not None:
            lens, blob = _encode_payloads(list(payloads))
            bufs += [lens, blob]
        resp, rbufs = self._rpc(self._writer_host(), header, bufs)
        return np.frombuffer(rbufs[0], np.int64).tolist()

    def add(self, embedding, payload: Optional[bytes] = None) -> int:
        return self.add_all(np.asarray(embedding, np.float32)[None, :],
                            [payload])[0]

    def delete_all(self, gids) -> None:
        buf = np.ascontiguousarray(np.asarray(list(gids), np.int64)).tobytes()
        self._rpc(self._writer_host(), {"op": "delete"}, [buf])

    def delete(self, gid: int) -> None:
        self.delete_all([int(gid)])

    def resolve_ids(self, gids) -> list:
        """Resolves gids on the writer (its gid map spans every segment)."""
        buf = np.ascontiguousarray(np.asarray(list(gids), np.int64)).tobytes()
        resp, rbufs = self._rpc(self._writer_host(), {"op": "resolve"}, [buf])
        pairs = np.frombuffer(rbufs[0], np.int64).reshape(resp["n"], 2)
        return [tuple(int(v) for v in row) for row in pairs]

    def await_indexing_complete(self, timeout: Optional[float] = None) -> bool:
        resp, _ = self._rpc(
            self._writer_host(), {"op": "await_indexing", "timeout": timeout}
        )
        return bool(resp.get("done"))

    # -- queries ------------------------------------------------------------

    def query_batch_arrays(
        self, qs, k: int, params=None, want_payloads: bool = False
    ):
        qs = np.ascontiguousarray(np.asarray(qs, np.float32))
        header = {
            "op": "query", "k": int(k), "shape": list(qs.shape),
            "params": None if params is None else params.to_dict(),
            "want_payloads": bool(want_payloads),
        }
        buf = qs.tobytes()
        results: list = [None] * len(self._hosts)

        def call(i: int) -> None:
            results[i] = self._rpc(self._hosts[i], header, [buf])

        threads = [
            threading.Thread(target=call, args=(i,))
            for i in range(1, len(self._hosts))
        ]
        for t in threads:
            t.start()
        call(0)
        for t in threads:
            t.join()

        nq = qs.shape[0]
        all_gids, all_scores, all_dists, all_payloads = [], [], [], []
        for resp, bufs in results:
            shape = resp["shape"]
            all_gids.append(_arr(bufs[0], "int64", shape))
            all_scores.append(_arr(bufs[1], "float32", shape))
            all_dists.append(_arr(bufs[2], "float32", shape))
            if want_payloads:
                plist = _decode_payloads(bufs[3], bufs[4])
                all_payloads.append(
                    [plist[i * shape[1] : (i + 1) * shape[1]] for i in range(shape[0])]
                )

        gids = np.concatenate(all_gids, axis=1)  # [Q, H*k]
        scores = np.concatenate(all_scores, axis=1)
        dists = np.concatenate(all_dists, axis=1)
        # top-k by score desc; empty slots (gid=-1) carry -inf and sink
        order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        rows = np.arange(nq)[:, None]
        out_g = np.take_along_axis(gids, order, axis=1)
        out_s = np.take_along_axis(scores, order, axis=1)
        out_d = np.take_along_axis(dists, order, axis=1)
        if not want_payloads:
            return out_g, out_s, out_d
        h_k = all_gids[0].shape[1]
        merged_payloads = []
        for qi in range(nq):
            row = []
            for j in order[qi].tolist():
                row.append(all_payloads[j // h_k][qi][j % h_k])
            merged_payloads.append(row)
        return out_g, out_s, out_d, merged_payloads

    def query_batch(self, qs, k: int, params=None):
        """SearchResult-object convenience (payloads included)."""
        from vectorsearch_tpu.results import SearchResult

        g, s, d, p = self.query_batch_arrays(qs, k, params, want_payloads=True)
        out = []
        for qi in range(g.shape[0]):
            row = [
                SearchResult(int(g[qi, j]), float(s[qi, j]), float(d[qi, j]),
                             p[qi][j])
                for j in range(k) if g[qi, j] >= 0
            ]
            out.append(row)
        return out
