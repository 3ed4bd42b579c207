"""vectorsearch_tpu — a TPU-native vector-search framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of panghy/vectorsearch
(a Java DiskANN+PQ engine over FoundationDB; see /root/reference and SURVEY.md):

- Segmented ANN index with online inserts and strict-cap rotation
  (ACTIVE -> PENDING -> SEALED -> COMPACTING / WRITING).
- Background PQ codebook training (per-subspace k-means), PQ encoding, and
  Vamana-style neighbor-graph construction — all as batched XLA/Pallas programs.
- BEST_FIRST graph traversal with ADC lookup-table distances + exact re-rank.
- Tombstone deletes, cooldown-aware vacuum, planner-driven compaction with
  stable 64-bit global ids.

Instead of FoundationDB key ranges, segments are HBM-resident tensor bundles
(raw vectors f32[cap,D], PQ codes u8[cap,M], fixed-degree adjacency i32[cap,R])
shardable over a ``jax.sharding.Mesh``; the lifecycle state machine lives in a
host-side coordinator.
"""

from vectorsearch_tpu.config import (
    GlobalTaskQueueConfig,
    Metric,
    VectorIndexConfig,
    WorkerConfig,
)
from vectorsearch_tpu.params import Mode, SearchParams, SeedStrategy
from vectorsearch_tpu.results import SearchResult
from vectorsearch_tpu.types import (
    ConcurrentWriterError,
    IndexMeta,
    SegmentMeta,
    SegmentState,
)

__version__ = "0.1.0"

__all__ = [
    "ConcurrentWriterError",
    "GlobalTaskQueueConfig",
    "DiskStorage",
    "IndexMeta",
    "IndexStorage",
    "MemoryStorage",
    "Metric",
    "Mode",
    "SearchParams",
    "SearchResult",
    "SeedStrategy",
    "SegmentMeta",
    "SegmentState",
    "VectorIndexConfig",
    "WorkerConfig",
]


def __getattr__(name):
    # Lazy import to avoid pulling jax at package-import time for config-only use.
    if name == "VectorIndex":
        from vectorsearch_tpu.core.index import VectorIndex

        return VectorIndex
    if name in ("DiskStorage", "MemoryStorage", "IndexStorage"):
        # the durability backends users hand to VectorIndexConfig(storage=...)
        import vectorsearch_tpu.core.persist as _persist

        return getattr(_persist, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
