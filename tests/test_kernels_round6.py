"""Round-6 projection kernels: nsper/tpers, tcea, collg, cc, goode,
ob_tran — defining-property KATs (the round-4/5 pattern: each
projection is pinned by the mathematical property that defines it,
plus fp-tight roundtrips)."""

import numpy as np
import pytest

from proj_spark import kernels as K
from proj_spark.crs import ProjError, Transform

R = "+R=6371009"


def _rt(projstr, lon, lat, tol_m=1e-6):
    t = Transform.new(projstr)
    lam = np.radians(np.atleast_1d(np.asarray(lon, dtype=np.float64)))
    phi = np.radians(np.atleast_1d(np.asarray(lat, dtype=np.float64)))
    x, y = t.project_array(lam.copy(), phi.copy())
    l2, p2 = t.project_array(x.copy(), y.copy(), inverse=True)
    err = np.maximum(np.abs(np.degrees(l2) - np.asarray(lon)),
                     np.abs(np.degrees(p2) - np.asarray(lat))) * 111320.0
    assert np.all(err < tol_m), err.max()
    return x, y


def _jacobian_area(projstr, lon, lat, h=1e-5):
    """Numerical |J| of the unit-sphere forward at (lon, lat) deg."""
    t = Transform.new(projstr)

    def f(lo, la):
        x, y = t.project_array(np.radians(np.array([lo])).copy(),
                               np.radians(np.array([la])).copy())
        return x[0], y[0]

    x0, y0 = f(lon, lat)
    xl, yl = f(lon + h, lat)
    xp, yp = f(lon, lat + h)
    dh = np.radians(h)
    return ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (dh * dh)


# ---------------------------------------------------------------------------
# nsper / tpers
# ---------------------------------------------------------------------------
def test_nsper_roundtrip_and_horizon():
    _rt(f"+proj=nsper +h=35785831 +lon_0=-120 +lat_0=35 {R}",
        [-118.0, -125.0, -100.0], [34.0, 20.0, 50.0])
    # horizon: cos(c) >= 1/P defines visibility (Snyder 23-20)
    t = Transform.new(f"+proj=nsper +h=1000000 +lon_0=0 +lat_0=0 {R}")
    p = 1.0 + 1000000.0 / 6371009.0
    c_lim = np.degrees(np.arccos(1.0 / p))  # ~31.8 deg
    x, y, err = t.project_array(
        np.radians([c_lim - 1.0, c_lim + 1.0]).copy(),
        np.array([0.0, 0.0]), errors="mask")
    assert err[0] is None and err[1] is not None
    assert np.isfinite(x[0]) and np.isnan(x[1])


def test_nsper_converges_to_ortho_at_large_h():
    """As h -> inf the perspective view becomes orthographic."""
    big = f"+proj=nsper +h=1e15 +lon_0=10 +lat_0=45 {R}"
    orth = f"+proj=ortho +lon_0=10 +lat_0=45 {R}"
    lam = np.radians([12.0, -20.0, 40.0])
    phi = np.radians([47.0, 30.0, 60.0])
    xa, ya = Transform.new(big).project_array(lam.copy(), phi.copy())
    xo, yo = Transform.new(orth).project_array(lam.copy(), phi.copy())
    assert np.allclose(xa, xo, atol=1e-3) and np.allclose(ya, yo, atol=1e-3)


def test_nsper_center_scale():
    """At the projection center, k = 1 (true scale): x ~= R*dlam*cos(lat_0)."""
    t = Transform.new(f"+proj=nsper +h=5000000 +lon_0=0 +lat_0=40 {R}")
    d = 1e-6
    x, y = t.project_array(np.radians([d]).copy(), np.radians([40.0]).copy())
    assert abs(x[0] - 6371009.0 * np.radians(d) * np.cos(np.radians(40.0))) \
        < 1e-6


def test_tpers_zero_tilt_is_nsper_and_tilt_roundtrips():
    lam = np.radians([-74.0, -76.0])
    phi = np.radians([40.7, 39.0])
    a = Transform.new(f"+proj=tpers +h=5500000 +lat_0=40 +lon_0=-75 "
                      f"+tilt=0 +azi=0 {R}")
    b = Transform.new(f"+proj=nsper +h=5500000 +lat_0=40 +lon_0=-75 {R}")
    xa, ya = a.project_array(lam.copy(), phi.copy())
    xb, yb = b.project_array(lam.copy(), phi.copy())
    assert np.array_equal(xa, xb) and np.array_equal(ya, yb)
    _rt(f"+proj=tpers +h=5500000 +lat_0=40 +lon_0=-75 +tilt=25 +azi=20 {R}",
        [-74.0, -76.0, -75.5], [40.7, 39.0, 41.2])


def test_nsper_requires_h():
    with pytest.raises((ProjError, KeyError, ValueError)):
        Transform.new(f"+proj=nsper +lat_0=0 {R}")


# ---------------------------------------------------------------------------
# tcea
# ---------------------------------------------------------------------------
def test_tcea_equal_area_and_roundtrip():
    ps = f"+proj=tcea +lat_0=33 +lon_0=-116 {R}"
    for lon, lat in ((-116.0, 33.0), (-110.0, 50.0), (-120.0, 10.0)):
        # equal-area: |J| == R^2 * cos(phi) for k0=1
        j = _jacobian_area(ps, lon, lat)
        want = 6371009.0 ** 2 * np.cos(np.radians(lat))
        assert abs(j / want - 1.0) < 1e-4, (lon, lat, j / want)
    _rt(ps, [-118.0, -114.0, -116.0], [32.6, 34.3, 33.0])


def test_tcea_transverse_relation():
    """On the central meridian tcea's y is the meridian arc R*(phi-phi0)
    and x = 0 (the transverse aspect of Lambert's cylindrical)."""
    t = Transform.new(f"+proj=tcea +lat_0=0 +lon_0=0 {R}")
    x, y = t.project_array(np.array([0.0]), np.radians([37.0]).copy())
    assert abs(x[0]) < 1e-9
    assert abs(y[0] - 6371009.0 * np.radians(37.0)) < 1e-6


def test_tcea_k0():
    t1 = Transform.new(f"+proj=tcea +k_0=0.9 {R}")
    t0 = Transform.new(f"+proj=tcea {R}")
    lam, phi = np.radians([20.0]), np.radians([30.0])
    x1, y1 = t1.project_array(lam.copy(), phi.copy())
    x0, y0 = t0.project_array(lam.copy(), phi.copy())
    assert abs(x1[0] - x0[0] / 0.9) < 1e-6
    assert abs(y1[0] - y0[0] * 0.9) < 1e-6


# ---------------------------------------------------------------------------
# collg
# ---------------------------------------------------------------------------
def test_collg_equal_area_apex_and_roundtrip():
    ps = f"+proj=collg {R}"
    for lon, lat in ((0.0, 0.0), (120.0, 45.0), (-60.0, -70.0)):
        j = _jacobian_area(ps, lon, lat)
        want = 6371009.0 ** 2 * np.cos(np.radians(lat))
        assert abs(j / want - 1.0) < 1e-4
    # the north pole is the triangle apex: one point for every lon
    t = Transform.new(ps)
    x, y = t.project_array(np.radians([-150.0, 0.0, 150.0]).copy(),
                           np.radians([90.0, 90.0, 90.0]).copy())
    assert np.allclose(x, 0.0, atol=1e-6)
    assert np.allclose(y, y[0])
    # equator width: x spans 2/sqrt(pi) * lam * sqrt(2)?  at phi=0,
    # sqrt(1-sin phi)=1 -> x = R * (2/sqrt(pi)) * lam
    x, y = t.project_array(np.radians([90.0]).copy(), np.array([0.0]))
    assert abs(x[0] - 6371009.0 * (2.0 / np.sqrt(np.pi))
               * np.radians(90.0)) < 1e-6
    _rt(ps, [10.0, -170.0, 80.0], [20.0, -60.0, 75.0])


# ---------------------------------------------------------------------------
# cc
# ---------------------------------------------------------------------------
def test_cc_tan_law_and_pole_mask():
    t = Transform.new(f"+proj=cc {R}")
    x, y = t.project_array(np.radians([45.0]).copy(), np.radians([60.0]).copy())
    assert abs(x[0] - 6371009.0 * np.radians(45.0)) < 1e-9
    assert abs(y[0] - 6371009.0 * np.tan(np.radians(60.0))) < 1e-6
    _, _, err = t.project_array(np.array([0.0]), np.radians([90.0]).copy(),
                                errors="mask")
    assert err[0] is not None
    _rt(f"+proj=cc {R}", [100.0, -30.0], [60.0, -84.0])


# ---------------------------------------------------------------------------
# goode
# ---------------------------------------------------------------------------
def test_goode_matches_halves_and_seam_continuity():
    ps = f"+proj=goode {R}"
    t = Transform.new(ps)
    lim = np.degrees(K._IGH_PHI0)
    # below the seam: exactly sinusoidal
    xs, ys = Transform.new(f"+proj=sinu {R}").project_array(
        np.radians([25.0]).copy(), np.radians([30.0]).copy())
    xg, yg = t.project_array(np.radians([25.0]).copy(),
                             np.radians([30.0]).copy())
    assert abs(xg[0] - xs[0]) < 1e-9 and abs(yg[0] - ys[0]) < 1e-9
    # above: Mollweide shifted down by the seam correction
    xm, ym = Transform.new(f"+proj=moll {R}").project_array(
        np.radians([25.0]).copy(), np.radians([60.0]).copy())
    xg, yg = t.project_array(np.radians([25.0]).copy(),
                             np.radians([60.0]).copy())
    assert abs(xg[0] - xm[0]) < 1e-9
    assert abs(yg[0] - (ym[0] - 6371009.0 * K._IGH_Y0)) < 1e-6
    # seam: y and x continuous across phi_lim (the seam DEFINES Y_COR)
    eps = 1e-7
    xb, yb = t.project_array(np.radians([40.0]).copy(),
                             np.radians([lim - eps]).copy())
    xa, ya = t.project_array(np.radians([40.0]).copy(),
                             np.radians([lim + eps]).copy())
    assert abs(ya[0] - yb[0]) < 0.15  # meters, at 1e-7 deg across
    assert abs(xa[0] - xb[0]) < 0.15
    _rt(ps, [25.0, -130.0, 60.0], [30.0, 65.0, -55.0])


def test_goode_equal_area_both_sides():
    ps = f"+proj=goode {R}"
    for lat in (20.0, 70.0, -75.0):
        j = _jacobian_area(ps, 15.0, lat)
        want = 6371009.0 ** 2 * np.cos(np.radians(lat))
        assert abs(j / want - 1.0) < 1e-4, lat


# ---------------------------------------------------------------------------
# ob_tran
# ---------------------------------------------------------------------------
def test_ob_tran_identity_pole():
    a = Transform.new(f"+proj=ob_tran +o_proj=moll +o_lat_p=90 "
                      f"+o_lon_p=0 {R}")
    b = Transform.new(f"+proj=moll {R}")
    lam, phi = np.radians([33.0, -80.0]), np.radians([44.0, -12.0])
    xa, ya = a.project_array(lam.copy(), phi.copy())
    xb, yb = b.project_array(lam.copy(), phi.copy())
    assert np.array_equal(xa, xb) and np.array_equal(ya, yb)


def test_ob_tran_rotation_is_isometry():
    P = K.ob_tran_setup({"proj": "ob_tran", "o_proj": "eqc",
                         "o_lat_p": 37.0, "o_lon_p": -55.0},
                        6371009.0, 0.0)
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 50)
    lat = rng.uniform(-89, 89, 50)
    l1, p1 = K._ob_rotate_fwd(np.radians(lon), np.radians(lat), P)
    # pairwise angular distances unchanged by the rotation

    def cosang(l, p):
        return (np.sin(p[:, None]) * np.sin(p[None]) +
                np.cos(p[:, None]) * np.cos(p[None])
                * np.cos(l[:, None] - l[None]))

    d0 = cosang(np.radians(lon), np.radians(lat))
    d1 = cosang(l1, p1)
    assert np.abs(d0 - d1).max() < 1e-12
    # and the rotation inverts exactly
    l2, p2 = K._ob_rotate_inv(l1, p1, P)
    assert np.abs(K.adjlon(l2 - np.radians(lon))).max() < 1e-9
    assert np.abs(p2 - np.radians(lat)).max() < 1e-9


def test_ob_tran_two_point_pole_is_orthogonal():
    """The two-point form's pole must be 90 deg from both points."""
    P = K.ob_tran_setup(
        {"proj": "ob_tran", "o_proj": "eqc", "o_lon_1": -20.0,
         "o_lat_1": 30.0, "o_lon_2": 40.0, "o_lat_2": 50.0},
        6371009.0, 0.0)
    # rotated latitude of each defining point must be 0 (on the
    # rotated equator)
    for lon, lat in ((-20.0, 30.0), (40.0, 50.0)):
        _, pr = K._ob_rotate_fwd(np.radians([lon]), np.radians([lat]), P)
        assert abs(pr[0]) < 1e-9, (lon, lat, pr[0])


def test_ob_tran_full_roundtrip_and_errors():
    _rt(f"+proj=ob_tran +o_proj=moll +o_lat_p=45 +o_lon_p=-90 {R}",
        [17.0, -140.0, 95.0], [33.0, -70.0, 5.0], tol_m=1e-5)
    with pytest.raises((ProjError, ValueError)):
        Transform.new(f"+proj=ob_tran +o_lat_p=45 {R}")  # no o_proj
    with pytest.raises((ProjError, ValueError)):
        Transform.new(f"+proj=ob_tran +o_proj=ob_tran +o_lat_p=45 {R}")
    with pytest.raises((ProjError, ValueError)):
        Transform.new(f"+proj=ob_tran +o_proj=eqc {R}")  # no pole spec
