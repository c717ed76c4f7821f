"""Pure-Python property tests for round-7 sketch/layout math (no Spark —
these pin the ALGEBRA the distributed operators rely on, complementing the
engine-level equality tests in test_streaming.py / test_plans.py)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from udlang_spark.queries.relational import _Z_BITS


def _min_k(values, k):
    return sorted(set(values))[:k]


@given(
    parts=st.lists(
        st.lists(st.integers(min_value=0, max_value=2**48 - 1), max_size=40),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(min_value=1, max_value=16),
)
@settings(max_examples=200, deadline=None)
def test_kmv_min_k_merge_is_lossless(parts, k):
    """The KMV merge law behind s_kmv_stream's mode='min_k' and
    t_kmv_jaccard's union sketch: the k smallest of the union equal the
    k smallest of the union of per-part k-minima — every global k-minimum
    is among its own part's k-minima, so bounded per-part deltas lose
    nothing, under ANY partitioning of the input."""
    whole = _min_k([v for p in parts for v in p], k)
    merged = _min_k([v for p in parts for v in _min_k(p, k)], k)
    assert merged == whole


def _morton(x: int, y: int) -> int:
    z = 0
    for i in range(_Z_BITS):
        z += ((x >> i) & 1) * (1 << (2 * i))
        z += ((y >> i) & 1) * (2 << (2 * i))
    return z


@given(
    x=st.integers(min_value=0, max_value=2**_Z_BITS - 1),
    y=st.integers(min_value=0, max_value=2**_Z_BITS - 1),
)
@settings(max_examples=300, deadline=None)
def test_morton_interleave_is_a_bijection(x, y):
    """q71's z-value is invertible: de-interleaving the bit sum recovers
    (x, y) exactly — no two points share a z-value, so z-sorting is a
    total order on the grid (the property that makes z-range scans
    equivalent to tile unions)."""
    z = _morton(x, y)
    rx = sum(((z >> (2 * i)) & 1) << i for i in range(_Z_BITS))
    ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(_Z_BITS))
    assert (rx, ry) == (x, y)


@given(
    x=st.integers(min_value=0, max_value=2**_Z_BITS - 1),
    y=st.integers(min_value=0, max_value=2**_Z_BITS - 1),
)
@settings(max_examples=300, deadline=None)
def test_morton_cell_is_a_tile(x, y):
    """q71's cell id (z >> 8) depends only on the high nibbles of x and y:
    each cell is exactly the 16×16 tile (x>>4, y>>4) — the guarantee
    behind the zone-map locality assertion in test_plans.py."""
    cell = _morton(x, y) >> 8
    assert cell == _morton(x >> 4, y >> 4)


@given(
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),
            st.integers(min_value=1, max_value=30),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_interval_islands_equal_point_coverage(spans):
    """q72's gaps-and-islands recurrence computes exactly the measure of
    the union of half-open intervals: island total == brute-force count
    of covered integer points (the per-second explode it replaces)."""
    iv = sorted((s, s + d) for s, d in spans)
    # the q72 recurrence: new island when start > running max of prior ends
    total = 0
    cur_s, cur_e = iv[0]
    for s, e in iv[1:]:
        if s > cur_e:
            total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    total += cur_e - cur_s
    covered = set()
    for s, e in iv:
        covered.update(range(s, e))
    assert total == len(covered)
