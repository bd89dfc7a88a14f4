"""Vincenty ellipsoidal geodesic: published known-answer line,
closed-form consistency checks, and the Spark column surface."""

import numpy as np
from pyspark.sql import functions as F

from proj_spark.operators.geodesic import (
    vincenty_inverse,
    with_geodesic_distance,
)


def test_vincenty_published_line_grs80():
    """Vincenty's classic test line (GDA technical manual): Flinders
    Peak -> Buninyong on GRS80 = 54972.271 m (published to mm)."""
    lat1 = -(37 + 57 / 60 + 3.72030 / 3600)
    lon1 = 144 + 25 / 60 + 29.52440 / 3600
    lat2 = -(37 + 39 / 60 + 10.15610 / 3600)
    lon2 = 143 + 55 / 60 + 35.38390 / 3600
    s = vincenty_inverse(np.array([lon1]), np.array([lat1]),
                         np.array([lon2]), np.array([lat2]),
                         a=6378137.0, f=1 / 298.257222101)
    assert abs(float(s[0]) - 54972.271) < 1e-3


def test_vincenty_closed_form_consistency():
    """Three independent anchors: meridian arcs must match the
    engine's own mlfn series (a completely separate derivation),
    equatorial arcs are exactly a*dlam, and f=0 reduces bit-exactly
    to the spherical great circle."""
    from proj_spark import kernels as K

    f = 1 / 298.257223563
    es = 2 * f - f * f
    en = K._enfn(es)
    for p1, p2 in [(0.0, 10.0), (20.0, 45.0), (-30.0, 60.0)]:
        s = vincenty_inverse(np.array([5.0]), np.array([p1]),
                             np.array([5.0]), np.array([p2]))
        phi = np.radians([p1, p2])
        M = K._mlfn(phi, np.sin(phi), np.cos(phi), en) * 6378137.0
        assert abs(float(s[0]) - abs(M[1] - M[0])) < 1e-4, (p1, p2)
    s_eq = vincenty_inverse(np.array([0.0]), np.array([0.0]),
                            np.array([10.0]), np.array([0.0]))
    assert abs(float(s_eq[0]) - 6378137.0 * np.radians(10.0)) < 1e-8
    # sphere reduction == haversine exactly
    R = 6371000.0
    s_sp = vincenty_inverse(np.array([2.0]), np.array([48.0]),
                            np.array([13.0]), np.array([52.0]), a=R, f=0.0)
    la1, la2 = np.radians(48.0), np.radians(52.0)
    dlo = np.radians(11.0)
    hav = 2 * R * np.arcsin(np.sqrt(
        np.sin((la2 - la1) / 2) ** 2
        + np.cos(la1) * np.cos(la2) * np.sin(dlo / 2) ** 2))
    assert abs(float(s_sp[0]) - hav) < 1e-9


def test_vincenty_edge_rows():
    s = vincenty_inverse(np.array([10.0]), np.array([10.0]),
                         np.array([10.0]), np.array([10.0]))
    assert float(s[0]) == 0.0
    # symmetry
    a = vincenty_inverse(np.array([1.0]), np.array([2.0]),
                         np.array([50.0]), np.array([-30.0]))
    b = vincenty_inverse(np.array([50.0]), np.array([-30.0]),
                         np.array([1.0]), np.array([2.0]))
    assert abs(float(a[0]) - float(b[0])) < 1e-8


def test_geodesic_column_surface(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "lon": [0.0, 100.0], "lat": [0.0, 30.0],
        "lon2": [10.0, 100.0], "lat2": [0.0, 31.0],
    }))
    out = with_geodesic_distance(df).collect()
    got = {(r.lon, r.lat): r.geodesic_m for r in out}
    assert abs(got[(0.0, 0.0)] - 6378137.0 * np.radians(10.0)) < 1e-6
    ref = vincenty_inverse(np.array([100.0]), np.array([30.0]),
                           np.array([100.0]), np.array([31.0]))
    assert abs(got[(100.0, 30.0)] - float(ref[0])) < 1e-9


def test_vincenty_antimeridian_wrap():
    """A pair straddling the antimeridian (|dlon| > 180) must take the
    short way around, equal to the unwrapped-equivalent pair, and must
    NOT trip the non-convergence guard (pre-fix this returned NaN)."""
    s1 = vincenty_inverse(np.array([-179.95]), np.array([-10.0]),
                          np.array([179.95]), np.array([-10.0]))
    assert np.isfinite(s1[0])
    # 0.1 deg apart across the antimeridian == 0.1 deg apart anywhere
    s2 = vincenty_inverse(np.array([0.05]), np.array([-10.0]),
                          np.array([-0.05]), np.array([-10.0]))
    assert abs(float(s1[0]) - float(s2[0])) < 1e-6
    # Paris from the far Pacific: finite, ~15.6 Mm, matches the
    # equivalent +360-shifted longitude exactly
    a = vincenty_inverse(np.array([-179.95]), np.array([-84.95]),
                         np.array([2.3522]), np.array([48.8566]))
    b = vincenty_inverse(np.array([180.05]), np.array([-84.95]),
                         np.array([2.3522]), np.array([48.8566]))
    assert np.isfinite(a[0]) and abs(float(a[0]) - float(b[0])) < 1e-6


def test_geodesic_area_identities(spark):
    """Geodesic polygon area (authalic-sphere spherical excess):
    (a) authalic radius == the published WGS84 value 6371007.1810 m;
    (b) an octant (great-circle edges) == pi/2 R_A^2 EXACTLY;
    (c) the 8 octants tile the ellipsoid: sum == 4 pi R_A^2;
    (d) Rect rows use the exact parallel-bounded band closed form;
    (e) holes subtract; (f) the Spark column path agrees with the
    local function."""
    import numpy as np
    from pyspark.sql import functions as F

    from proj_spark.operators.geodesic import (authalic_radius,
                                               geom_area_m2,
                                               with_geodesic_area)
    from proj_spark.operators.geometry import (GEOMETRY_DDL, geom_polygon,
                                               geom_rect)

    RA = authalic_radius()
    assert abs(RA - 6371007.1810) < 1e-3
    tri = [[0.0, 0.0], [90.0, 0.0], [0.0, 90.0]]
    A = geom_area_m2("Triangle", [tri], None)
    assert abs(A - 0.5 * np.pi * RA * RA) < 1e-3
    total = 0.0
    for sx in (0.0, 90.0, 180.0, -90.0):
        for sy in (1.0, -1.0):
            total += geom_area_m2(
                "Triangle", [[[sx, 0.0], [sx + 90.0, 0.0], [sx, sy * 90.0]]],
                None)
    assert abs(total - 4.0 * np.pi * RA * RA) < 1.0  # tiles the ellipsoid
    # Rect: exact ellipsoid lat-band area via the authalic q function
    from proj_spark import kernels as K

    a = 6378137.0
    es = 1.0 - (1.0 - 1.0 / 298.257223563) ** 2
    e, one_es = np.sqrt(es), 1.0 - es
    want = 0.5 * a * a * np.radians(20.0) * (
        float(K._qsfn(np.sin(np.radians(45.0)), e, one_es))
        - float(K._qsfn(np.sin(np.radians(20.0)), e, one_es)))
    got = geom_area_m2("Rect", [[[10.0, 20.0], [30.0, 45.0]]], None)
    # es here is 1-(1-f)^2 vs the operator's f*(2-f): ulp-equal only,
    # which is 1e-15 relative = ~0.01 m^2 at this magnitude
    assert abs(got - want) < 0.05
    # holes subtract
    outer = [[0, 0], [10, 0], [10, 10], [0, 10]]
    hole = [[2, 2], [4, 2], [4, 4], [2, 4]]
    a1 = geom_area_m2("Polygon", [outer], None)
    ah = geom_area_m2("Polygon", [hole], None)
    a2 = geom_area_m2("Polygon", [outer, hole], None)
    assert abs(a1 - ah - a2) < 1e-4
    # Spark column path
    df = spark.createDataFrame(
        [(0, geom_polygon([outer, hole])), (1, geom_rect((10, 20), (30, 45)))],
        f"gid long, geom struct<{GEOMETRY_DDL}>")
    rows = {r["gid"]: r["area_m2"]
            for r in with_geodesic_area(df).collect()}
    assert abs(rows[0] - a2) < 1e-4
    assert abs(rows[1] - want) < 0.05


def test_geodesic_length_anchors(spark):
    """geom_length_m: a meridian segment equals the engine's own
    meridian-arc series (independent derivation), an equator segment
    equals a*dlam exactly, a polygon ring closes (perimeter includes
    the closing edge), and the Spark column path agrees."""
    import numpy as np

    from proj_spark import kernels as K
    from proj_spark.operators.geodesic import (geom_length_m,
                                               with_geodesic_length)
    from proj_spark.operators.geometry import GEOMETRY_DDL, geom_linestring, geom_polygon

    a = 6378137.0
    es = 1.0 - (1.0 - 1 / 298.257223563) ** 2
    en = K._enfn(es)
    # meridian segment 10N -> 40N
    got = geom_length_m("LineString", [[[5.0, 10.0], [5.0, 40.0]]], None)
    p1, p2 = np.radians(10.0), np.radians(40.0)
    arc = a * float(K._mlfn(p2, np.sin(p2), np.cos(p2), en)
                    - K._mlfn(p1, np.sin(p1), np.cos(p1), en))
    assert abs(got - arc) < 1e-3
    # equator segment: exactly a * dlam
    got = geom_length_m("LineString", [[[0.0, 0.0], [10.0, 0.0]]], None)
    assert abs(got - a * np.radians(10.0)) < 1e-8
    # polygon perimeter closes the ring
    tri = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]]
    open_len = geom_length_m("LineString", [tri], None)
    closed_len = geom_length_m("Polygon", [tri], None)
    from proj_spark.operators.geodesic import vincenty_inverse
    closing = float(vincenty_inverse(
        np.array([0.0]), np.array([10.0]), np.array([0.0]), np.array([0.0]))[0])
    assert abs(closed_len - open_len - closing) < 1e-6
    # Spark column path
    df = spark.createDataFrame(
        [(0, geom_linestring([(5.0, 10.0), (5.0, 40.0)])),
         (1, geom_polygon([tri]))],
        f"gid long, geom struct<{GEOMETRY_DDL}>")
    rows = {r["gid"]: r["length_m"]
            for r in with_geodesic_length(df).collect()}
    assert abs(rows[0] - arc) < 1e-3
    assert abs(rows[1] - closed_len) < 1e-9


def test_geodesic_area_pole_enclosing_ring():
    """Code-review regression: a ring circling a pole used to report
    the equator-to-ring BELT instead of the enclosed cap.  A 360-gon
    at 80 N must give ~the north polar cap area (inscribed-polygon
    deficit < 0.1%), likewise at 80 S — NOT the ~16x-larger belt."""
    import numpy as np

    from proj_spark.operators.geodesic import (_authalic_beta,
                                               authalic_radius,
                                               geom_area_m2)

    RA = authalic_radius()
    es = (1.0 / 298.257223563) * (2.0 - 1.0 / 298.257223563)
    # winding rings report the SMALLER bounded region (the cap),
    # independent of pole and traversal direction
    lons_e = np.linspace(-180, 179, 360)
    for sgn, lons in ((1.0, lons_e), (1.0, lons_e[::-1]),
                      (-1.0, lons_e), (-1.0, lons_e[::-1])):
        ring = [[float(lon), sgn * 80.0] for lon in lons]
        got = geom_area_m2("Polygon", [ring], None)
        beta = float(_authalic_beta(np.radians(sgn * 80.0), es))
        cap = 2.0 * np.pi * (1.0 - np.sin(abs(beta))) * RA * RA
        belt = 2.0 * np.pi * np.sin(abs(beta)) * RA * RA
        assert abs(got - cap) / cap < 1e-3, sgn
        assert belt / got > 10.0  # nowhere near the pre-fix belt value


def test_geodesic_area_antipodal_longitude_edge_rejected():
    """Round-4 ADVICE: an edge spanning exactly 180 deg of longitude is
    geometrically ambiguous (infinitely many shortest great-circle
    arcs) — it must raise, not return an arbitrary-signed excess; a
    densified version of the same ring must work."""
    import numpy as np
    import pytest

    from proj_spark.operators.geodesic import geom_area_m2

    bad = [[0.0, 10.0], [180.0, 10.0], [90.0, 40.0], [0.0, 10.0]]
    with pytest.raises(ValueError, match="180 deg"):
        geom_area_m2("Polygon", [bad], None)
    # densifying the offending edge removes the ambiguity
    dens = [[0.0, 10.0], [90.0, 10.0], [180.0, 10.0], [90.0, 40.0],
            [0.0, 10.0]]
    got = geom_area_m2("Polygon", [dens], None)
    assert np.isfinite(got) and got > 0


def test_geodesic_length_rect_matches_area_semantics():
    """Rect length and Rect area describe the SAME boundary (meridians
    + parallels): perimeter = 2 meridian arcs + the two parallel-arc
    lengths, each checked against its closed form."""
    import numpy as np

    from proj_spark import kernels as K
    from proj_spark.operators.geodesic import geom_length_m, vincenty_inverse

    a = 6378137.0
    es = (1.0 / 298.257223563) * (2.0 - 1.0 / 298.257223563)
    got = geom_length_m("Rect", [[[0.0, 60.0], [120.0, 70.0]]], None)
    mer = float(vincenty_inverse(np.array([0.0]), np.array([60.0]),
                                 np.array([0.0]), np.array([70.0]))[0])

    def par(lat):
        phi = np.radians(lat)
        return np.radians(120.0) * a * np.cos(phi) / np.sqrt(
            1.0 - es * np.sin(phi) ** 2)

    assert abs(got - (2.0 * mer + par(60.0) + par(70.0))) < 1e-6
    # sanity: clearly LONGER than the old great-circle-edge reading
    # (geodesic edges are the SHORTEST paths between the corners)
    assert got > 12_000_000.0
    import pytest

    with pytest.raises(ValueError):
        geom_length_m("Nonsense", [[[0, 0], [1, 1]]], None)
    assert geom_length_m("Point", [[[3.0, 4.0]]], None) == 0.0
