"""Per-call search tuning knobs (reference: api/SearchParams.java:20-163).

SearchParams is the third config tier: data-format params are persisted in
IndexMeta, operational params live in VectorIndexConfig/WorkerConfig, and these
are provided per query call.
"""

from __future__ import annotations

import dataclasses
import enum


class Mode(enum.Enum):
    """Traversal strategy. BEAM is legacy/deprecated; BEST_FIRST is the default."""

    BEAM = "BEAM"  # deprecated (reference logs a one-time warning)
    BEST_FIRST = "BEST_FIRST"


class SeedStrategy(enum.Enum):
    """Seeding behavior for the initial traversal frontier."""

    PQ_SEED_ONLY = "PQ_SEED_ONLY"
    RANDOM_PIVOTS = "RANDOM_PIVOTS"


@dataclasses.dataclass(frozen=True)
class SearchParams:
    """DiskANN-style per-search knobs (reference: api/SearchParams.java:23-42).

    - ef_search: target number of candidates explored via graph before exact rerank
    - beam_width: frontier nodes expanded per iteration
    - max_iters: max frontier expansion iterations (BEAM mode)
    - max_explore: hard cap on explored candidates
    - refine_frontier: consider prior frontier membership when picking next frontier
    - min_hops: minimum hops before early exit (BEAM mode)
    - pivots: number of diversified seed pivots (RANDOM_PIVOTS only)
    - per_segment_limit_multiplier: per-segment fan-in cap = k * multiplier
    - normalize_on_read: cosine normalization during exact rerank
    """

    ef_search: int
    beam_width: int
    max_iters: int = 4
    max_explore: int = 2048
    refine_frontier: bool = True
    min_hops: int = 2
    pivots: int = 2
    seed_strategy: SeedStrategy = SeedStrategy.PQ_SEED_ONLY
    per_segment_limit_multiplier: int = 2
    normalize_on_read: bool = False
    mode: Mode = Mode.BEAM

    def __post_init__(self):
        if self.ef_search <= 0:
            raise ValueError("efSearch must be positive")
        if self.beam_width <= 0:
            raise ValueError("beamWidth must be positive")
        if self.max_iters <= 0:
            raise ValueError("maxIters must be positive")
        if self.max_explore <= 0:
            raise ValueError("maxExplore must be positive")
        if self.mode is None:
            raise ValueError("mode must not be null")

    # ---- factory methods mirroring the reference (api/SearchParams.java:47-82) ----

    @staticmethod
    def of(
        ef_search: int,
        beam_width: int,
        max_iters: int,
        max_explore: int | None = None,
        refine_frontier: bool = True,
        mode: Mode = Mode.BEAM,
    ) -> "SearchParams":
        if max_explore is None:
            max_explore = max(ef_search * 4, 1024)
        return SearchParams(
            ef_search=ef_search,
            beam_width=beam_width,
            max_iters=max_iters,
            max_explore=max_explore,
            refine_frontier=refine_frontier,
            min_hops=2,
            pivots=2,
            seed_strategy=SeedStrategy.PQ_SEED_ONLY,
            per_segment_limit_multiplier=2,
            normalize_on_read=False,
            mode=mode,
        )

    @staticmethod
    def defaults(k: int, oversample: int) -> "SearchParams":
        """BEST_FIRST defaults: ef = max(100, k*oversample*4) (reference :74-82)."""
        ef = max(100, k * max(1, oversample) * 4)
        beam = min(64, max(8, k * 2))
        return SearchParams(
            ef_search=ef,
            beam_width=beam,
            max_iters=6,
            max_explore=max(ef * 4, 4096),
            refine_frontier=True,
            min_hops=2,
            pivots=2,
            seed_strategy=SeedStrategy.PQ_SEED_ONLY,
            per_segment_limit_multiplier=2,
            normalize_on_read=False,
            mode=Mode.BEST_FIRST,
        )

    def replace(self, **kw) -> "SearchParams":
        return dataclasses.replace(self, **kw)

    # ---- wire serialization (parallel/cluster.py router <-> server) ----

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["seed_strategy"] = self.seed_strategy.value
        d["mode"] = self.mode.value
        return d

    @staticmethod
    def from_dict(d: dict) -> "SearchParams":
        d = dict(d)
        d["seed_strategy"] = SeedStrategy(d.get("seed_strategy", "PQ_SEED_ONLY"))
        d["mode"] = Mode(d.get("mode", "BEST_FIRST"))
        return SearchParams(**d)
