"""Property-based tests (hypothesis) for the pure-numpy kernel layer.

The example-based suites pin the reference semantics on curated edge packs;
these properties assert the ALGEBRA the engine's joins rely on — prefix
nesting of ids across depths, colrow/id bijection, closed-bbox containment,
ring symmetry, candidate-set soundness, band-blocking completeness — over
randomized inputs, including float32 quantization effects. All numpy, no
Spark session: they run in milliseconds and shrink to minimal
counterexamples on failure.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from geospatial_cuda_spark.functions import cells as C

coords = st.floats(
    min_value=0.0, max_value=999999.9, allow_nan=False, allow_infinity=False
)
depths = st.integers(min_value=1, max_value=13)


@given(st.lists(st.tuples(coords, coords), min_size=1, max_size=50), depths)
@settings(max_examples=60, deadline=None)
def test_id_prefix_nesting(pts, depth):
    """The depth-d id's parent is EXACTLY the depth-(d-1) id for the same
    point — the invariant every rollup/ancestor join in the engine relies
    on (ids are quadkey prefixes, cuda/kernels.cu:517-537 scheme)."""
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    deep = C.encode_cell_ids(x, y, depth)
    shallow = C.encode_cell_ids(x, y, depth - 1)
    assert np.array_equal(C.cell_parent(deep), shallow)
    # and ids land in the disjoint per-depth range [(4^d-1)/3, (4^(d+1)-4)/3]
    # (all-1s digits .. all-4s digits; depth d+1's min is this max + 1)
    lo, hi = (4**depth - 1) // 3, (4 ** (depth + 1) - 4) // 3
    assert deep.min() >= lo and deep.max() <= hi


@given(st.lists(st.tuples(coords, coords), min_size=1, max_size=50), depths)
@settings(max_examples=60, deadline=None)
def test_colrow_id_bijection(pts, depth):
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    ids = C.encode_cell_ids(x, y, depth)
    col, row = C.cell_to_colrow(ids, depth)
    size = 1 << depth
    assert ((col >= 0) & (col < size)).all() and ((row >= 0) & (row < size)).all()
    assert np.array_equal(C.colrow_to_cell(col, row, depth), ids)


@given(st.lists(st.tuples(coords, coords), min_size=1, max_size=30), depths)
@settings(max_examples=60, deadline=None)
def test_closed_bbox_contains_its_point(pts, depth):
    """A point's cell bbox contains the point under CLOSED comparison on the
    float32-quantized coordinate — the containment rule quadrant_search uses
    (cuda/kernels.cu:152-155 is inclusive on every edge)."""
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    ids = C.encode_cell_ids(x, y, depth)
    x1, y1, x2, y2 = C.cell_bbox(ids, depth)
    xq = x.astype(np.float32)
    yq = y.astype(np.float32)
    assert ((xq >= x1) & (xq <= x2) & (yq >= y1) & (yq <= y2)).all()


@given(st.lists(st.tuples(coords, coords), min_size=1, max_size=20),
       st.integers(min_value=1, max_value=8), st.integers(min_value=1, max_value=3))
@settings(max_examples=40, deadline=None)
def test_neighbor_ring_symmetric_and_self(pts, depth, radius):
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    ids = C.encode_cell_ids(x, y, depth)
    ring = C.neighbor_ring(ids, depth, radius)
    for i, a in enumerate(ids):
        r = set(int(v) for v in ring[i] if v >= 0)
        assert int(a) in r  # self
        # symmetry: b in ring(a) ⇒ a in ring(b)
        for b in r:
            rb = C.neighbor_ring(np.array([b]), depth, radius)[0]
            assert int(a) in set(int(v) for v in rb if v >= 0)


@given(st.lists(st.tuples(coords, coords), min_size=1, max_size=30),
       st.integers(min_value=1, max_value=10))
@settings(max_examples=40, deadline=None)
def test_candidate_set_contains_encode_id(pts, depth):
    """Soundness of candidate generation (the quadrant-search equi-join
    feed): the id the categorize rule assigns at every depth d' ≤ d is
    always among the closed-containment candidates."""
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    cand = C.candidate_cell_ids(x, y, depth)
    for d in range(depth + 1):
        want = C.encode_cell_ids(x, y, d)
        for i in range(len(x)):
            assert want[i] in set(cand[i]), (x[i], y[i], d)


@given(st.integers(min_value=0, max_value=0xFFFF), st.integers(min_value=0, max_value=0xFFFF))
@settings(max_examples=300, deadline=None)
def test_simhash_nibble_blocking_complete(a, b):
    """Pigeonhole completeness of the simhash band blocking
    (operators/dedup.near_dup_simhash): any pair with hamming ≤ 3 over 16
    bits MUST share at least one of the 4 nibble bands — so the banded
    equi-join provably misses no qualifying pair."""
    hamming = bin(a ^ b).count("1")
    shares = any(((a >> (4 * n)) & 0xF) == ((b >> (4 * n)) & 0xF) for n in range(4))
    if hamming <= 3:
        assert shares


@given(st.lists(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False), min_size=1, max_size=200))
@settings(max_examples=30, deadline=None)
def test_round_half_away_matches_duckdb(vals):
    """round_half_away is the Arrow kernels' oracle-boundary rounding: it
    must agree with DuckDB round(x, 6) bit-for-bit on arbitrary doubles in
    the cosine range (including exact .5e-6 boundaries, where np.round's
    half-even diverges)."""
    import duckdb

    from geospatial_cuda_spark.util import round_half_away

    # salt in exact boundary cases alongside the random draws
    xs = np.array(vals + [0.1234565, -0.1234565, 0.0000005, -0.0000005, 0.5e-6 * 3])
    got = round_half_away(xs, 6)
    con = duckdb.connect()
    want = np.array(
        [con.execute("SELECT round(CAST(? AS DOUBLE), 6)", [float(v)]).fetchone()[0] for v in xs]
    )
    assert np.array_equal(got, want), (xs[got != want], got[got != want], want[got != want])


@given(
    st.integers(min_value=-5, max_value=4**19),
    st.integers(min_value=0, max_value=18),
)
@settings(max_examples=300, deadline=None)
def test_ancestor_closed_form_equals_iterated_parent(cell_id, k):
    """ancestor_col's closed form floor((id - (4^k-1)/3)/4^k) must equal k
    iterations of (id-1) div 4 for every integer id (including the -1
    sentinel region and past-root underflow) — the r4 O(depth²)→O(depth)
    codegen shrink must be semantics-free."""
    import math

    it = cell_id
    for _ in range(k):
        it = (it - 1) // 4
    c = (4**k - 1) // 3
    cf = cell_id if k == 0 else math.floor((cell_id - c) / (4**k))
    assert it == cf
