"""Search result record (reference: api/SearchResult.java:5-18).

Score is higher-is-better: L2 -> -distance; cosine -> similarity
(distance = 1 - similarity).
"""

from __future__ import annotations

from typing import NamedTuple, Optional


class SearchResult(NamedTuple):
    """NamedTuple (not a dataclass) on purpose: query_batch builds tens of
    thousands of these per batch under the GIL — C-level tuple construction
    is ~5x cheaper and was a measurable share of query throughput."""

    gid: int
    score: float
    distance: float
    payload: Optional[bytes] = None
