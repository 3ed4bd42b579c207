"""Pins the efSearch contract in flat mode (api/SearchParams.java:20-42).

The graph path spends efSearch as an exploration budget but re-ranks its whole
static ef_buf candidate buffer; flat mode has no exploration phase, so the
contract is configurable (config.flat_ef_semantics):
- "buffer" (default): pool = the full static ef_buf (efSearch bucketed up)
- "strict": pool masked to exactly the auto-tuned ef (literal reference
  semantics, documented recall cost)

The corpus gives every PQ subspace exactly pq_k distinct sub-vectors, so
Lloyd's converges to (near-)zero quantization error and the ADC ranking is
the exact ranking — making pool membership deterministic and the two
contracts separable by deleting the top-ranked rows (deletes are dropped at
re-rank, AFTER pool selection, reference fdb/FdbVectorIndex.java:970-1046).
"""

import numpy as np

from vectorsearch_tpu.params import Mode, SearchParams

from tests.test_index_e2e import make_index, run_builds


def _discrete_corpus(rng, n=100, d=8, sub=2, k_codes=16):
    """Rows whose subspace sub-vectors come from exactly k_codes codewords."""
    m = d // sub
    codewords = rng.normal(size=(m, k_codes, sub)).astype(np.float32) * 2.0
    picks = rng.integers(0, k_codes, size=(n, m))
    x = np.concatenate(
        [codewords[j, picks[:, j]] for j in range(m)], axis=1
    ).astype(np.float32)
    return x


def _one_sealed_segment(storage, rng, name, **cfg):
    idx = make_index(
        storage, name=name, max_segment_size=100, oversample=1,
        pq_m=4, pq_k=16, **cfg,
    )
    x = _discrete_corpus(rng)
    gids = idx.add_all(x)  # exactly the cap: strict-cap rotation seals
    run_builds(idx)
    return idx, x, gids


PARAMS = SearchParams(
    ef_search=1, beam_width=8, per_segment_limit_multiplier=1,
    mode=Mode.BEST_FIRST,
)  # auto-tune: base_ef = max(1, 10*1) = 10, scale=1 at n=100 -> tuned ef 10


def test_flat_buffer_pool_backfills_past_deleted(storage, rng):
    """buffer semantics: the pool is ef_buf (=16 for tuned ef 10), so after
    the top-10 rows are deleted the re-rank still finds the pool's remaining
    alive rows."""
    idx, x, gids = _one_sealed_segment(storage, rng, "buffer")
    q = x[:1]
    first = idx.query_batch(q, 10, PARAMS)[0]
    assert len(first) == 10
    idx.delete_all([r.gid for r in first])
    again = idx.query_batch(q, 10, PARAMS)[0]
    # pool (ADC top-16, unchanged by tombstones) minus the 10 deleted
    assert 4 <= len(again) <= 6
    assert not {r.gid for r in again} & {r.gid for r in first}
    idx.close()


def test_flat_strict_pool_is_exactly_tuned_ef(storage, rng):
    """strict semantics: the pool is masked to the tuned ef (=10), which the
    deletion consumed entirely — the same query now returns (almost) nothing,
    pinning that efSearch literally bounds the flat candidate pool."""
    rng2 = np.random.default_rng(42)
    idx, x, gids = _one_sealed_segment(
        storage, rng2, "strict", flat_ef_semantics="strict"
    )
    q = x[:1]
    first = idx.query_batch(q, 10, PARAMS)[0]
    assert len(first) == 10
    idx.delete_all([r.gid for r in first])
    again = idx.query_batch(q, 10, PARAMS)[0]
    assert len(again) <= 2  # ADC==exact up to reseed jitter; ideally 0
    idx.close()


def test_flat_buffer_ef_search_still_sizes_the_pool(storage, rng):
    """buffer semantics keep efSearch meaningful: it sizes ef_buf. With
    ef_search=64 the pool is 64 wide, so deleting the top-10 still leaves a
    full k of alive candidates."""
    rng2 = np.random.default_rng(42)
    idx, x, gids = _one_sealed_segment(storage, rng2, "wide")
    q = x[:1]
    wide = PARAMS.replace(ef_search=64)
    first = idx.query_batch(q, 10, wide)[0]
    idx.delete_all([r.gid for r in first])
    again = idx.query_batch(q, 10, wide)[0]
    assert len(again) == 10
    idx.close()


def test_flat_ef_semantics_validated(storage):
    import pytest

    from vectorsearch_tpu.config import VectorIndexConfig

    with pytest.raises(ValueError, match="flatEfSemantics"):
        VectorIndexConfig(
            storage=storage, name="bad", dimension=8, pq_m=4, pq_k=16,
            flat_ef_semantics="nope",
        )
