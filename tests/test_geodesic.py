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
