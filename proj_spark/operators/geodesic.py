"""Ellipsoidal geodesic distance (Vincenty inverse, 1975).

The engine's spatial joins use spherical haversine (exactness-guarded
by the chord bound) — correct for ranking, but a training-data /
measurement pipeline also wants the true ellipsoidal distance.
Vincenty's inverse formulas (public: Vincenty, Survey Review XXIII
No 176, 1975) converge to sub-mm for all but near-antipodal pairs.

Design for oracle replication: the iteration runs a FIXED number of
steps (no data-dependent early exit), so the DuckDB twin
(``oracle.chain_vincenty_inverse``) can unroll the same steps as chain
CTEs and match values to the ulp.  12 iterations is far past
convergence (double-precision fixpoint is typically reached in 4-6)
for non-antipodal geometry; near-antipodal pairs (lambda > pi after
update) are reported as NaN rather than a wrong number — callers at
100 TB want a maskable error, not a silent 20000-km-off result.

All math is vectorized numpy over Arrow batches — one kernel call per
batch (the engine's O7 batching convention), no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf

from proj_spark.geodesy import inverse_core

__all__ = ["vincenty_inverse", "geodesic_distance_udf",
           "with_geodesic_distance", "authalic_radius",
           "geom_area_m2", "with_geodesic_area", "sphere_ring_excess",
           "geom_length_m", "with_geodesic_length"]

_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563


def vincenty_inverse(lon1, lat1, lon2, lat2,
                     a: float = _WGS84_A, f: float = _WGS84_F,
                     iters: int = 12):
    """Ellipsoidal inverse problem: distance in meters between
    (lon1, lat1) and (lon2, lat2) in degrees.  Vectorized; fixed
    ``iters`` Vincenty iterations; NaN for non-converging
    (near-antipodal) rows and exact 0.0 for coincident rows.

    Thin degree-interface wrapper over ``geodesy.inverse_core`` (the
    radians core shared with the aeqd projection kernel); the argument
    preparation below is numerically identical, term for term, to the
    pre-refactor form and to the SQL twin
    (``oracle.chain_vincenty_inverse``)."""
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    s, _alpha1 = inverse_core(
        np.radians(lon2 - lon1), np.radians(lat1), np.radians(lat2),
        a=a, f=f, iters=iters)
    return s


def geodesic_distance_udf(a: float = _WGS84_A, f: float = _WGS84_F,
                          iters: int = 12):
    """Arrow-batched pandas UDF: (lon1, lat1, lon2, lat2) degrees ->
    ellipsoidal distance in meters."""

    @pandas_udf("double")
    def _dist(lon1: pd.Series, lat1: pd.Series,
              lon2: pd.Series, lat2: pd.Series) -> pd.Series:
        return pd.Series(vincenty_inverse(
            lon1.to_numpy(), lat1.to_numpy(),
            lon2.to_numpy(), lat2.to_numpy(), a=a, f=f, iters=iters))

    return _dist


def with_geodesic_distance(df: DataFrame,
                           lon1: str = "lon", lat1: str = "lat",
                           lon2: str = "lon2", lat2: str = "lat2",
                           out: str = "geodesic_m",
                           a: float = _WGS84_A, f: float = _WGS84_F) -> DataFrame:
    udf = geodesic_distance_udf(a=a, f=f)
    return df.withColumn(
        out, udf(F.col(lon1), F.col(lat1), F.col(lon2), F.col(lat2)))


# ---------------------------------------------------------------------------
# geodesic polygon area
# ---------------------------------------------------------------------------
def _authalic_qp(es: float) -> float:
    from proj_spark.kernels import _qsfn

    if es == 0.0:
        return 2.0
    return float(_qsfn(np.array(1.0), np.sqrt(es), 1.0 - es))


def authalic_radius(a: float = _WGS84_A, f: float = _WGS84_F) -> float:
    """Radius of the sphere with the ellipsoid's surface area
    (WGS84: 6371007.1810 m)."""
    es = f * (2.0 - f)
    return a * np.sqrt(_authalic_qp(es) / 2.0)


def _authalic_beta(phi: np.ndarray, es: float) -> np.ndarray:
    """Geodetic -> authalic latitude (area-preserving sphere mapping).
    Computed on |phi| with the sign restored: q's log term is odd only
    analytically — evaluating both signs directly leaves an ulp-level
    asymmetry that shows up as ~1e-8 relative area error on
    south-pole-touching rings — and |sin phi| = 1 now lands on
    beta = pi/2 EXACTLY (q(1)/qp == 1 by construction)."""
    from proj_spark.kernels import _qsfn

    if es == 0.0:
        return phi
    qp = _authalic_qp(es)
    q = _qsfn(np.abs(np.sin(phi)), np.sqrt(es), 1.0 - es)
    return np.sign(phi) * np.arcsin(np.clip(q / qp, 0.0, 1.0))


def sphere_ring_excess(lam: np.ndarray, beta: np.ndarray) -> float:
    """Signed spherical excess of a closed ring whose vertices are
    joined by GREAT-CIRCLE edges (GeographicLib's spherical edge
    accumulation): per edge, E = 2 atan2(tan(dl/2)(t1 + t2),
    1 + t1 t2) with t = tan(beta/2); area = excess * R^2.

    Pole-enclosing rings (total longitude winding != 0) get the
    standard 2*pi*winding transit correction: without it a ring
    circling a pole reports the equator-to-ring BELT instead of a
    region the ring actually bounds (GeographicLib's pole-crossing
    adjustment).  Because the engine's rings carry no orientation
    contract, a winding ring deterministically reports the SMALLER of
    the two regions it bounds (the polar cap), independent of
    traversal direction.

    Edges spanning EXACTLY 180 degrees of longitude are rejected: two
    vertices at antipodal longitudes are joined by infinitely many
    great-circle arcs (both half-meridians through either pole are
    shortest), so the bounded region — and the per-edge excess sign —
    is genuinely undefined; tan(dl/2) also blows up to ~1e16 there.
    Callers must densify such rings so no single edge spans a half
    circle (round-4 ADVICE)."""
    lam = np.asarray(lam, dtype=np.float64)
    beta = np.asarray(beta, dtype=np.float64)
    if lam[0] != lam[-1] or beta[0] != beta[-1]:
        lam = np.append(lam, lam[0])
        beta = np.append(beta, beta[0])
    t = np.tan(0.5 * beta)
    dl = np.diff(lam)
    dl = (dl + np.pi) % (2.0 * np.pi) - np.pi  # shortest-arc edges
    if np.any(np.isclose(np.abs(dl), np.pi, rtol=0.0, atol=1e-12)):
        raise ValueError(
            "ring edge spans exactly 180 deg of longitude: the "
            "great-circle arc between antipodal longitudes is ambiguous "
            "— densify the ring so no edge spans a half circle")
    e = 2.0 * np.arctan2(np.tan(0.5 * dl) * (t[:-1] + t[1:]),
                         1.0 + t[:-1] * t[1:])
    winding = np.round(np.sum(dl) / (2.0 * np.pi))
    excess = float(np.sum(e) - winding * 2.0 * np.pi)
    if winding != 0:
        # orientation-free: report the smaller bounded region (cap)
        a4pi = 4.0 * np.pi
        amt = abs(excess) % a4pi
        return min(amt, a4pi - amt)
    return excess


def _lat_band_area(lon_w, lon_e, lat_s, lat_n, a, es) -> float:
    """EXACT ellipsoid area of a lon/lat rectangle (edges = meridians
    and PARALLELS): a^2/2 * dlam * (q(lat_n) - q(lat_s))."""
    from proj_spark.kernels import _qsfn

    dlam = np.radians(lon_e - lon_w)
    if es == 0.0:
        return float(a * a * dlam
                     * (np.sin(np.radians(lat_n)) - np.sin(np.radians(lat_s))))
    e, one_es = np.sqrt(es), 1.0 - es
    qn = float(_qsfn(np.sin(np.radians(lat_n)), e, one_es))
    qs = float(_qsfn(np.sin(np.radians(lat_s)), e, one_es))
    return float(0.5 * a * a * dlam * (qn - qs))


def geom_area_m2(kind: str, parts, offsets,
                 a: float = _WGS84_A, f: float = _WGS84_F) -> float:
    """Area in m^2 of one geometry struct row.

    Semantics: polygon vertices are joined by GREAT-CIRCLE edges
    (the geodesic-area convention); the computation runs on the
    authalic sphere (geodetic -> authalic latitude, radius
    ``authalic_radius``), which preserves the ellipsoid's total and
    zonal areas — the standard spherical-excess approach.  ``Rect``
    rows are lat/lon rectangles bounded by PARALLELS and use the exact
    closed-form ellipsoid band area instead."""
    es = f * (2.0 - f)
    if kind == "Rect":
        (x1, y1), (x2, y2) = parts[0][0], parts[0][1]
        return _lat_band_area(min(x1, x2), max(x1, x2),
                              min(y1, y2), max(y1, y2), a, es)
    r2 = authalic_radius(a, f) ** 2

    def ring_area(ring) -> float:
        # Arrow hands rings over as object arrays of per-point arrays;
        # stack point-wise instead of a single asarray (which chokes
        # on nested object dtype)
        arr = np.stack([np.asarray(pt, dtype=np.float64) for pt in ring])
        lam = np.radians(arr[:, 0])
        beta = _authalic_beta(np.radians(arr[:, 1]), es)
        return abs(sphere_ring_excess(lam, beta)) * r2

    if kind in ("Polygon", "Triangle"):
        rings = [ring_area(r) for r in parts]
        return rings[0] - sum(rings[1:])
    if kind == "MultiPolygon":
        offs = list(offsets) + [len(parts)]
        total = 0.0
        for i in range(len(offs) - 1):
            rings = [ring_area(r) for r in parts[offs[i]:offs[i + 1]]]
            total += rings[0] - sum(rings[1:])
        return total
    raise ValueError(f"geodesic area undefined for kind {kind!r}")


def with_geodesic_area(df: DataFrame, geom_col: str = "geom",
                       out: str = "area_m2",
                       a: float = _WGS84_A, f: float = _WGS84_F) -> DataFrame:
    """Arrow-batched geodesic polygon area over a geometry struct
    column.  Per batch: one Python call over the ragged ring arrays —
    linear, shuffle-free (the O7 batching convention)."""

    @pandas_udf("double")
    def _area(kind: pd.Series, parts: pd.Series,
              offsets: pd.Series) -> pd.Series:
        out_v = np.empty(len(kind), dtype=np.float64)
        for i in range(len(kind)):
            out_v[i] = geom_area_m2(kind.iloc[i], parts.iloc[i],
                                    offsets.iloc[i], a=a, f=f)
        return pd.Series(out_v)

    g = F.col(geom_col)
    return df.withColumn(out, _area(g["kind"], g["parts"], g["offsets"]))


def geom_length_m(kind: str, parts, offsets,
                  a: float = _WGS84_A, f: float = _WGS84_F) -> float:
    """Geodesic length in meters of one geometry struct row: the sum
    of fixed-iteration Vincenty segment distances.  LineString /
    MultiLineString sum their open parts; Polygon / MultiPolygon sum
    CLOSED ring perimeters (exterior + holes)."""
    if kind in ("Point", "MultiPoint"):
        return 0.0
    if kind not in ("LineString", "MultiLineString", "Polygon",
                    "MultiPolygon", "Triangle", "Rect"):
        raise ValueError(f"geodesic length undefined for kind {kind!r}")
    if kind == "Rect":
        # consistent with geom_area_m2's Rect semantics (edges are
        # meridians and PARALLELS): 2 meridian arcs (the meridian IS
        # the geodesic) + the two parallel-arc lengths
        (x1, y1), (x2, y2) = parts[0][0], parts[0][1]
        lon_w, lon_e = min(x1, x2), max(x1, x2)
        lat_s, lat_n = min(y1, y2), max(y1, y2)
        es = f * (2.0 - f)
        mer = float(vincenty_inverse(
            np.array([lon_w]), np.array([lat_s]),
            np.array([lon_w]), np.array([lat_n]), a=a, f=f)[0])

        def par_len(lat):
            phi = np.radians(lat)
            return float(np.radians(lon_e - lon_w) * a * np.cos(phi)
                         / np.sqrt(1.0 - es * np.sin(phi) ** 2))

        return 2.0 * mer + par_len(lat_s) + par_len(lat_n)
    closed = kind in ("Polygon", "MultiPolygon", "Triangle")
    total = 0.0
    for part in parts:
        arr = np.stack([np.asarray(pt, dtype=np.float64) for pt in part])
        if closed and (arr[0] != arr[-1]).any():
            arr = np.vstack([arr, arr[:1]])
        if len(arr) < 2:
            continue
        s = vincenty_inverse(arr[:-1, 0], arr[:-1, 1],
                             arr[1:, 0], arr[1:, 1], a=a, f=f)
        total += float(np.sum(s))
    return total


def with_geodesic_length(df: DataFrame, geom_col: str = "geom",
                         out: str = "length_m",
                         a: float = _WGS84_A, f: float = _WGS84_F) -> DataFrame:
    """Arrow-batched geodesic line length / ring perimeter over a
    geometry struct column (one Python call per batch)."""

    @pandas_udf("double")
    def _length(kind: pd.Series, parts: pd.Series,
                offsets: pd.Series) -> pd.Series:
        out_v = np.empty(len(kind), dtype=np.float64)
        for i in range(len(kind)):
            out_v[i] = geom_length_m(kind.iloc[i], parts.iloc[i],
                                     offsets.iloc[i], a=a, f=f)
        return pd.Series(out_v)

    g = F.col(geom_col)
    return df.withColumn(out, _length(g["kind"], g["parts"], g["offsets"]))
