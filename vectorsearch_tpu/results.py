"""Search result record (reference: api/SearchResult.java:5-18).

Score is higher-is-better: L2 -> -distance; cosine -> similarity
(distance = 1 - similarity).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SearchResult:
    gid: int
    score: float
    distance: float
    payload: Optional[bytes] = None
