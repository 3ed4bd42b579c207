"""Compact payload storage: one bytes blob + int64 offset/length planes.

The reference stores payloads as FDB values next to each vector
(fdb/FdbVectorStore.java:425-492), so corpus size never pressures process
memory. The list-mode default here keeps one Python object per row — fine to
~1M rows, but 10M payload objects cost GBs of pointer-heavy heap and GC time.
`PayloadArena` replaces the per-row objects with a single append-only
bytearray plus two int64 numpy planes (16 bytes/row fixed overhead);
`__getitem__` materializes a payload only when a result actually returns it.

Semantics match the list exactly: absent payloads are None; clearing a row
(vacuum) drops the reference (blob space is reclaimed when the segment is
compacted — the arena is rebuilt row-by-row into the destination segment).
Enabled per index via VectorIndexConfig.payload_storage="arena".
"""

from __future__ import annotations

import numpy as np


class PayloadArena:
    __slots__ = ("_off", "_len", "_blob")

    def __init__(self, cap: int):
        self._off = np.full(cap, -1, np.int64)
        self._len = np.zeros(cap, np.int64)
        self._blob = bytearray()

    def __len__(self) -> int:
        return len(self._off)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(len(self._off)))]
        o = int(self._off[i])
        if o < 0:
            return None
        return bytes(self._blob[o : o + int(self._len[i])])

    def __setitem__(self, i: int, payload) -> None:
        if payload is None:
            self._off[i] = -1
            self._len[i] = 0
            return
        b = bytes(payload)
        self._off[i] = len(self._blob)
        self._len[i] = len(b)
        self._blob += b

    def nbytes(self) -> int:
        return len(self._blob) + self._off.nbytes + self._len.nbytes

    # ------------------------------------------------------------ persistence

    def to_npz_arrays(self, n: int) -> dict:
        """Planes for embedding into the segment's npz checkpoint (no Python
        object explosion at checkpoint time, unlike pickling a list)."""
        return {
            "payload_blob": np.frombuffer(bytes(self._blob), np.uint8),
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
        arena._blob = bytearray(np.asarray(arrays["payload_blob"], np.uint8).tobytes())
        return arena
