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

__all__ = ["vincenty_inverse", "geodesic_distance_udf",
           "with_geodesic_distance"]

_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563


def vincenty_inverse(lon1, lat1, lon2, lat2,
                     a: float = _WGS84_A, f: float = _WGS84_F,
                     iters: int = 12):
    """Ellipsoidal inverse problem: distance in meters between
    (lon1, lat1) and (lon2, lat2) in degrees.  Vectorized; fixed
    ``iters`` Vincenty iterations; NaN for non-converging
    (near-antipodal) rows and exact 0.0 for coincident rows."""
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    b = a * (1.0 - f)
    # wrap dlon into [-pi, pi): Vincenty's L is the geodesically short
    # way around; without the wrap an antimeridian-straddling pair
    # (|dlon| > 180) trips the non-convergence guard (same closed form
    # in the SQL twin, floor-based so both engines agree exactly)
    Lr = np.radians(lon2 - lon1)
    L = Lr - 2.0 * np.pi * np.floor((Lr + np.pi) / (2.0 * np.pi))
    U1 = np.arctan((1.0 - f) * np.tan(np.radians(lat1)))
    U2 = np.arctan((1.0 - f) * np.tan(np.radians(lat2)))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    # loop state (kept identical, step for step, with the SQL twin)
    for _ in range(iters):
        sinLam, cosLam = np.sin(lam), np.cos(lam)
        sinSigma = np.sqrt(
            (cosU2 * sinLam) ** 2
            + (cosU1 * sinU2 - sinU1 * cosU2 * cosLam) ** 2)
        cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLam
        sigma = np.arctan2(sinSigma, cosSigma)
        sinAlpha = np.where(sinSigma != 0.0,
                            cosU1 * cosU2 * sinLam
                            / np.where(sinSigma != 0.0, sinSigma, 1.0),
                            0.0)
        cos2Alpha = 1.0 - sinAlpha * sinAlpha
        cos2SigmaM = np.where(cos2Alpha != 0.0,
                              cosSigma - 2.0 * sinU1 * sinU2
                              / np.where(cos2Alpha != 0.0, cos2Alpha, 1.0),
                              0.0)
        C = f / 16.0 * cos2Alpha * (4.0 + f * (4.0 - 3.0 * cos2Alpha))
        lam = L + (1.0 - C) * f * sinAlpha * (
            sigma + C * sinSigma * (
                cos2SigmaM
                + C * cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM)))

    # final evaluation with the converged lambda
    sinLam, cosLam = np.sin(lam), np.cos(lam)
    sinSigma = np.sqrt(
        (cosU2 * sinLam) ** 2
        + (cosU1 * sinU2 - sinU1 * cosU2 * cosLam) ** 2)
    cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLam
    sigma = np.arctan2(sinSigma, cosSigma)
    sinAlpha = np.where(sinSigma != 0.0,
                        cosU1 * cosU2 * sinLam
                        / np.where(sinSigma != 0.0, sinSigma, 1.0),
                        0.0)
    cos2Alpha = 1.0 - sinAlpha * sinAlpha
    cos2SigmaM = np.where(cos2Alpha != 0.0,
                          cosSigma - 2.0 * sinU1 * sinU2
                          / np.where(cos2Alpha != 0.0, cos2Alpha, 1.0),
                          0.0)
    u2 = cos2Alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    dSigma = B * sinSigma * (
        cos2SigmaM + B / 4.0 * (
            cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM)
            - B / 6.0 * cos2SigmaM * (-3.0 + 4.0 * sinSigma * sinSigma)
            * (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM)))
    s = b * A * (sigma - dSigma)
    # non-convergence marker: |lam| should stay <= pi for valid pairs
    s = np.where(np.abs(lam) > np.pi, np.nan, s)
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
