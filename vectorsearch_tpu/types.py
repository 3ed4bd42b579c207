"""Core metadata types: segment lifecycle state machine, segment/index metadata.

Mirrors the wire schema of the reference (src/main/proto/vectorsearch.proto:31-101)
but as plain Python dataclasses — the TPU rebuild's control plane is a host-side
coordinator, so protobuf is unnecessary; persistence uses JSON journals
(see vectorsearch_tpu/core/persist.py).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class ConcurrentWriterError(RuntimeError):
    """Another process holds a live writer lease on this index. The rebuild
    enforces a single mutating process per index (the reference instead makes
    concurrent writers safe via FDB serializable transactions and a
    transactional nextGid counter, fdb/FdbVectorStore.java:575-601). Route
    writes to the lease holder (e.g. cluster write forwarding), wait for the
    lease to lapse, configure writer_conflict_policy="wait", or opt into true
    N-process ingest with writer_conflict_policy="concurrent" (per-writer
    ACTIVE segments + shared gid/segment-id counters, core/store.py)."""


class SegmentState(enum.Enum):
    """Five-state segment lifecycle (reference: vectorsearch.proto:74-101).

    Visibility rules (reference: fdb/FdbVectorIndex.java:631-655):
      - ACTIVE, PENDING  -> searched brute-force (exact)
      - SEALED, COMPACTING -> searched via PQ/ADC + graph traversal + exact re-rank
      - WRITING -> invisible to search (compaction destination under construction)
    """

    ACTIVE = "ACTIVE"
    PENDING = "PENDING"
    SEALED = "SEALED"
    COMPACTING = "COMPACTING"
    WRITING = "WRITING"


#: States that are searched with brute force.
BRUTE_FORCE_STATES = frozenset({SegmentState.ACTIVE, SegmentState.PENDING})
#: States that are searched via the PQ/graph path.
GRAPH_STATES = frozenset({SegmentState.SEALED, SegmentState.COMPACTING})


@dataclasses.dataclass
class SegmentMeta:
    """Per-segment metadata (reference: vectorsearch.proto:74-101).

    count is the number of live (non-tombstoned) vectors; deleted_count the number
    of tombstones still occupying rows. created_at_ms / last_vacuum_at_ms drive the
    compaction planner's age bias and the vacuum cooldown respectively.

    owner stamps the creating process (store.owner_id) so concurrent-writer
    deployments (writer_conflict_policy="concurrent") can tell whose ACTIVE
    segment is whose: a writer only ever appends to segments it owns, and an
    orphaned ACTIVE (owner's lease dead) is rotated to PENDING by whoever
    notices. Absent in pre-r5 checkpoints -> None (single-writer semantics).
    """

    segment_id: int
    state: SegmentState
    count: int = 0
    deleted_count: int = 0
    created_at_ms: int = 0
    last_vacuum_at_ms: int = 0
    owner: Optional[str] = None

    def copy(self) -> "SegmentMeta":
        return dataclasses.replace(self)

    def to_json(self) -> dict:
        d = dataclasses.asdict(self)
        d["state"] = self.state.value
        return d

    @staticmethod
    def from_json(d: dict) -> "SegmentMeta":
        d = dict(d)
        d["state"] = SegmentState(d["state"])
        return SegmentMeta(**d)


@dataclasses.dataclass(frozen=True)
class IndexMeta:
    """Persisted, immutable data-format parameters (reference: vectorsearch.proto:31-67).

    Written once at index creation; reopen validates every field against the
    requested config (reference: fdb/FdbVectorStore.java:124-166). Fields with
    value 0/0.0 fall back to WorkerConfig defaults for global workers
    (reference: config/WorkerConfig.java:282-289).
    """

    name: str
    dimension: int
    metric: str  # "L2" | "COSINE"
    max_segment_size: int
    pq_m: int
    pq_k: int
    graph_degree: int
    oversample: int
    graph_build_breadth: int = 0  # 0 => unknown (fallback to worker defaults)
    graph_alpha: float = 0.0  # 0.0 => unknown

    def to_json(self) -> dict:
        return dataclasses.asdict(self)

    @staticmethod
    def from_json(d: dict) -> "IndexMeta":
        return IndexMeta(**d)


def pack_gid_location(segment_id: int, vector_id: int) -> int:
    """Packs (segId, vecId) into one int for map keys (reference: cache/SegmentCaches.java:137-139)."""
    return (segment_id << 32) | (vector_id & 0xFFFFFFFF)


def unpack_gid_location(packed: int) -> tuple[int, int]:
    return packed >> 32, packed & 0xFFFFFFFF
