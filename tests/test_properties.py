"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY §5 notes it has none): invariants of the geometry, hashing, and
float-semantics kernels that golden tests can't sweep."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from georiva_spark.functions.geo import (
    affine_index, parse_geojson, points_in_geometry,
)
from georiva_spark.functions.units import UNITS, conversion
from georiva_spark.plans.recipe import canonical_json, input_hash, unit_hash

# -- geometry ---------------------------------------------------------------

boxes = st.tuples(st.floats(-50, 50), st.floats(-50, 50),
                  st.floats(0.5, 40), st.floats(0.5, 40))


@given(boxes, st.floats(-60, 60), st.floats(-60, 60))
@settings(max_examples=200, deadline=None)
def test_box_containment_matches_interval_test(box, px, py):
    x0, y0, w, h = box
    x1, y1 = x0 + w, y0 + h
    # %.17g: full double precision — %f would truncate tiny coordinates
    # and test a different polygon than the interval check uses
    geo = parse_geojson(
        '{"type": "Polygon", "coordinates": [[[%.17g, %.17g], [%.17g, %.17g], '
        '[%.17g, %.17g], [%.17g, %.17g], [%.17g, %.17g]]]}'
        % (x0, y0, x1, y0, x1, y1, x0, y1, x0, y0))
    inside = points_in_geometry(np.array([px]), np.array([py]), geo)[0]
    # away from the boundary the even-odd test must equal the interval test
    eps = 1e-9
    if (abs(px - x0) > eps and abs(px - x1) > eps
            and abs(py - y0) > eps and abs(py - y1) > eps):
        want = (x0 < px < x1) and (y0 < py < y1)
        assert inside == want


@given(st.floats(-89, 89), st.floats(-179, 179),
       st.sampled_from([0.05, 0.1, 0.25, 0.5, 1.0, 2.0]))
@settings(max_examples=200, deadline=None)
def test_affine_index_returns_nearest_center(lat, lon, res):
    lat0, lon0 = -90.0, -180.0
    y, x = affine_index(lat0, lon0, res, lat, lon)
    cy = lat0 + res * (y + 0.5)
    cx = lon0 + res * (x + 0.5)
    # the chosen pixel center is within half a cell of the query point
    assert abs(cy - lat) <= res / 2 + 1e-9
    assert abs(cx - lon) <= res / 2 + 1e-9


# -- hashing ----------------------------------------------------------------

unit_dicts = st.dictionaries(
    st.text(min_size=1, max_size=8),
    st.one_of(st.integers(-10**6, 10**6), st.text(max_size=12),
              st.lists(st.integers(0, 99), max_size=4)),
    max_size=6)


@given(unit_dicts)
@settings(max_examples=100, deadline=None)
def test_unit_hash_is_key_order_invariant(d):
    items = list(d.items())
    d2 = dict(reversed(items))
    assert unit_hash(d) == unit_hash(d2)
    assert canonical_json(d) == canonical_json(d2)


@given(st.lists(st.text(min_size=1, max_size=16), min_size=1, max_size=8),
       st.text(min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_input_hash_order_invariant_but_version_sensitive(checksums, ver):
    a = input_hash(checksums, ver)
    b = input_hash(list(reversed(checksums)), ver)
    assert a == b
    assert input_hash(checksums, ver + "x") != a


# -- units ------------------------------------------------------------------

@given(st.sampled_from(sorted(UNITS)), st.floats(-1e6, 1e6))
@settings(max_examples=200, deadline=None)
def test_unit_roundtrip_identity(unit, value):
    peers = [u for u, d in UNITS.items()
             if d.dimension == UNITS[unit].dimension]
    for other in peers:
        f1, o1 = conversion(unit, other)
        f2, o2 = conversion(other, unit)
        back = (value * f1 + o1) * f2 + o2
        assert math.isclose(back, value, rel_tol=1e-9, abs_tol=1e-6)
