"""Compact payload storage: one uint8 blob + int64 offset/length planes.

The reference stores payloads as FDB values next to each vector
(fdb/FdbVectorStore.java:425-492), so corpus size never pressures process
memory. The list-mode default here keeps one Python object per row — fine to
~1M rows, but 10M payload objects cost GBs of pointer-heavy heap and GC time.
`PayloadArena` replaces the per-row objects with a single append-only numpy
uint8 blob plus two int64 planes (16 bytes/row fixed overhead);
`__getitem__` materializes a payload only when a result actually returns it.

The blob grows copy-on-grow (amortized O(1)): growth allocates a NEW array
and leaves the old one alive, so a buffer exported to the C result builder
(native/resultbuilder.c arena fast path) can never be invalidated by a
concurrent writer's append — the exported prefix is immutable by
construction. A bytearray blob would instead raise BufferError on any
resize while exported.

Semantics match the list exactly: absent payloads are None; clearing a row
(vacuum) drops the reference (blob space is reclaimed when the segment is
compacted — the arena is rebuilt row-by-row into the destination segment).
Enabled per index via VectorIndexConfig.payload_storage="arena".
"""

from __future__ import annotations

import numpy as np


class PayloadArena:
    __slots__ = ("_off", "_len", "_blob", "_blob_len")

    def __init__(self, cap: int):
        self._off = np.full(cap, -1, np.int64)
        self._len = np.zeros(cap, np.int64)
        self._blob = np.empty(1024, np.uint8)
        self._blob_len = 0

    def __len__(self) -> int:
        return len(self._off)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(len(self._off)))]
        o = int(self._off[i])
        if o < 0:
            return None
        return self._blob[o : o + int(self._len[i])].tobytes()

    def __setitem__(self, i: int, payload) -> None:
        if payload is None:
            self._off[i] = -1
            self._len[i] = 0
            return
        b = np.frombuffer(bytes(payload), np.uint8)
        if len(b) == 0:
            # no blob write: a zero-length slice assignment would still raise
            # on a read-only memmapped blob (reopened-from-spill arena), and
            # copy-on-grow never triggers for need == _blob_len (ADVICE r3)
            self._off[i] = self._blob_len
            self._len[i] = 0
            return
        need = self._blob_len + len(b)
        if need > len(self._blob):
            new = np.empty(max(need, 2 * len(self._blob)), np.uint8)
            new[: self._blob_len] = self._blob[: self._blob_len]
            self._blob = new  # old array stays alive for exported buffers
        self._blob[self._blob_len : need] = b
        self._off[i] = self._blob_len
        self._len[i] = len(b)
        self._blob_len = need

    def nbytes(self) -> int:
        return self._blob_len + self._off.nbytes + self._len.nbytes

    def c_planes(self) -> tuple:
        """(off i64[cap], len i64[cap], blob u8[*]) descriptor for the C
        result builder's arena fast path. Snapshot semantics: the returned
        blob reference covers every payload written before this call;
        concurrent appends grow a NEW blob and never touch this one."""
        return (self._off, self._len, self._blob)

    # ------------------------------------------------------------ persistence

    def to_npz_arrays(self, n: int) -> dict:
        """Planes for embedding into the segment's npz checkpoint (no Python
        object explosion at checkpoint time, unlike pickling a list)."""
        return {
            "payload_blob": self._blob[: self._blob_len].copy(),
            "payload_off": self._off[:n].copy(),
            "payload_len": self._len[:n].copy(),
        }

    @staticmethod
    def from_npz_arrays(cap: int, arrays: dict) -> "PayloadArena":
        arena = PayloadArena(cap)
        off = np.asarray(arrays["payload_off"], np.int64)
        arena._off[: len(off)] = off
        ln = np.asarray(arrays["payload_len"], np.int64)
        arena._len[: len(ln)] = ln
        blob = np.asanyarray(arrays["payload_blob"], np.uint8)
        # A DiskStorage-spilled blob arrives memory-mapped: keep the memmap
        # (payloads page in on access, host RAM stays bounded). Appends are
        # safe — copy-on-grow always allocates a NEW in-RAM array because
        # _blob_len == len(blob) here, so the read-only mapping is never
        # written to. Non-mapped blobs are copied out of the npz's buffer.
        arena._blob = blob if isinstance(blob, np.memmap) else blob.copy()
        arena._blob_len = len(arena._blob)
        return arena
