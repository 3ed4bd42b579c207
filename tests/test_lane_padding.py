"""Lane-padded segment allocation (r5, VERDICT r4 #6): segments allocate
vector planes at pad_lane(dim) so non-lane-multiple dims (deep10m's d=96,
glove's d=100) never pay the per-rebuild _pad_dim copies or the exact
kernel's non-lane-multiple fallback; checkpoints/WAL keep the LOGICAL-dim
format (old checkpoints load unchanged)."""

import numpy as np
import pytest

from vectorsearch_tpu.core.segment import Segment, pad_lane
from vectorsearch_tpu.types import SegmentMeta, SegmentState

from tests.test_index_e2e import gaussian, make_index, run_builds


def test_pad_lane_values():
    assert pad_lane(96) == 128
    assert pad_lane(100) == 128
    assert pad_lane(128) == 128
    assert pad_lane(129) == 256
    assert pad_lane(8) == 128


def test_segment_allocates_padded_stores_logical(storage, rng):
    idx = make_index(storage, max_segment_size=64, dimension=96,
                     pq_m=8, sealed_search_mode="exact")
    x = gaussian(rng, 40, d=96)
    idx.add_all(x)
    seg = idx.store.segments[idx.store.current_segment]
    assert seg.vectors_np.shape[1] == 128 and seg.dim == 96
    np.testing.assert_array_equal(seg.vectors_np[:40, :96], x)
    assert (seg.vectors_np[:40, 96:] == 0).all()  # pads stay zero
    # checkpoint stores LOGICAL dim (format identical to pre-r5)
    arrays = seg.to_arrays()
    assert arrays["vectors"].shape[1] == 96
    idx.close()


def test_brute_stack_singleton_zero_copy(storage, rng):
    """The ACTIVE BruteStack — rebuilt per writer batch under churn — must
    be the device mirror itself at any dim: zero feature-dim copies
    (VERDICT r4 #6 done-criterion)."""
    for d in (96, 128):
        idx = make_index(storage, name=f"zc{d}", max_segment_size=256,
                         dimension=d, pq_m=8, sealed_search_mode="exact")
        x = gaussian(rng, 50, d=d)
        idx.add_all(x)
        idx.query_batch(x[:4], 5)  # builds the brute stack
        seg = idx.store.segments[idx.store.current_segment]
        stack = idx._stacks.brute([seg])
        assert stack.vectors is seg._vectors_dev
        assert stack.alive is seg._alive_dev
        assert stack.xn2 is seg.xn2_dev
        idx.close()


def test_checkpoint_roundtrip_old_format(rng):
    """from_arrays must load a pre-r5 record (vectors stored [n, dim]) into
    the padded allocation — old checkpoints keep working."""
    d, cap = 96, 128
    x = rng.normal(size=(40, d)).astype(np.float32)
    rec = {
        "arrays": {
            "vectors": x,  # old format: logical width
            "exists": np.ones(40, bool),
            "alive": np.ones(40, bool),
            "next_row": np.array([40], np.int64),
            "capacity": np.array([cap], np.int64),
            "gids": np.arange(40, dtype=np.int64),
        },
    }
    meta = SegmentMeta(segment_id=0, state=SegmentState.ACTIVE, count=40,
                       deleted_count=0)
    seg = Segment.from_arrays(meta, cap, d, rec)
    assert seg.vectors_np.shape == (128, 128)
    np.testing.assert_array_equal(seg.vectors_np[:40, :96], x)
    assert (seg.vectors_np[:, 96:] == 0).all()


def test_exact_query_correct_at_d96_after_reopen(storage, rng):
    """End-to-end at the deep10m dim: multi-segment exact search + reopen
    from checkpoint keep exact recall with the padded allocation."""
    idx = make_index(storage, max_segment_size=64, dimension=96, pq_m=8,
                     sealed_search_mode="exact",
                     graph_build_mode="skip_for_flat",
                     pq_build_mode="skip_for_exact")
    x = gaussian(rng, 200, d=96)
    gids = idx.add_all(x)
    run_builds(idx)
    res = idx.query_batch(x[:32], 5)
    # self-distance ~sqrt(f32 cancellation of ||q||^2 - s) ~ 0.007 at d=96
    assert all(r[0].gid == gids[i] and r[0].distance < 0.05
               for i, r in enumerate(res))
    idx.close()
    idx = make_index(storage, max_segment_size=64, dimension=96, pq_m=8,
                     sealed_search_mode="exact",
                     graph_build_mode="skip_for_flat",
                     pq_build_mode="skip_for_exact")
    res = idx.query_batch(x[:32], 5)
    assert all(r[0].gid == gids[i] for i, r in enumerate(res))
    idx.close()


@pytest.fixture
def storage():
    from vectorsearch_tpu.core.persist import MemoryStorage

    return MemoryStorage()
