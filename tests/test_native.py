"""Native C++ gid map: semantics, batch ops, fallback parity."""

import numpy as np
import pytest

from vectorsearch_tpu.native import GidMap, PyGidMap, pack_loc, unpack_loc


@pytest.fixture(params=["native", "python"])
def gidmap(request):
    if request.param == "native":
        m = GidMap(16)
        if isinstance(m, PyGidMap):
            pytest.skip("native library unavailable")
        return m
    return PyGidMap(16)


def test_pack_unpack():
    assert unpack_loc(pack_loc(3, 17)) == (3, 17)
    assert unpack_loc(pack_loc(0, 0)) == (0, 0)
    assert unpack_loc(pack_loc(2**20, 2**31 - 1)) == (2**20, 2**31 - 1)
    assert unpack_loc(-1) == (-1, -1)


def test_basic_ops(gidmap):
    m = gidmap
    assert len(m) == 0
    m.put(7, 100)
    assert m.get(7) == 100
    assert m.get(8) == -1
    assert 7 in m and 8 not in m
    m.put(7, 200)  # overwrite
    assert m.get(7) == 200 and len(m) == 1
    assert m.remove(7)
    assert not m.remove(7)
    assert len(m) == 0 and m.get(7) == -1


def test_growth_and_tombstones(gidmap):
    m = gidmap
    keys = np.arange(10_000, dtype=np.int64)
    vals = keys * 7
    m.put_batch(keys, vals)
    assert len(m) == 10_000
    assert np.array_equal(m.get_batch(keys), vals)
    m.remove_batch(keys[::2])
    assert len(m) == 5_000
    out = m.get_batch(keys)
    assert np.all(out[::2] == -1)
    assert np.array_equal(out[1::2], vals[1::2])
    # reinsert over tombstones
    m.put_batch(keys[::2], vals[::2] + 1)
    assert len(m) == 10_000
    assert m.get(0) == 1


def test_items_arrays_roundtrip(gidmap):
    m = gidmap
    keys = np.array([5, 9, 1 << 40], np.int64)
    vals = np.array([50, 90, 1], np.int64)
    m.put_batch(keys, vals)
    k2, v2 = m.items_arrays()
    got = dict(zip(k2.tolist(), v2.tolist()))
    assert got == {5: 50, 9: 90, 1 << 40: 1}


def test_pygidmap_fallback_parity(rng):
    """PyGidMap (the no-compiler fallback) must match GidMap semantics —
    the fallback branch never runs when the C library builds (coverage r4)."""
    from vectorsearch_tpu.native import GidMap, PyGidMap

    for M in (GidMap, PyGidMap):
        m = M(4)
        keys = rng.integers(0, 1 << 40, 500).astype(np.int64)
        keys = np.unique(keys)
        vals = rng.integers(0, 1 << 40, len(keys)).astype(np.int64)
        m.put_batch(keys, vals)
        assert len(m) == len(keys)
        got = m.get_batch(keys)
        np.testing.assert_array_equal(got, vals)
        assert m.get(int(keys[0])) == int(vals[0])
        assert int(keys[1]) in m
        assert m.get(-12345, default=-7) == -7
        assert m.remove(int(keys[2]))
        assert not m.remove(int(keys[2]))  # double-remove branch
        assert m.get(int(keys[2])) == -1
        m.remove_batch(keys[3:5])
        assert len(m) == len(keys) - 3
        ik, iv = m.items_arrays()
        assert len(ik) == len(m)
        # single put after batch ops + growth from tiny capacity exercised
        m.put(999_999_999_999, 42)
        assert m.get(999_999_999_999) == 42


def test_pack_unpack_loc_roundtrip():
    from vectorsearch_tpu.native import pack_loc, unpack_loc

    for seg, vid in ((0, 0), (3, 17), (2**30, 2**31 - 1)):
        assert unpack_loc(pack_loc(seg, vid)) == (seg, vid)
