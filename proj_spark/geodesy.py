"""Pure-numpy ellipsoidal geodesic solvers (Vincenty 1975), shared by
the DataFrame-level distance operator (``operators.geodesic``) and the
azimuthal-equidistant projection kernel (``kernels.aeqd_*``).

Both problems run a FIXED number of iterations (no data-dependent
early exit) so the DuckDB oracle can unroll the identical steps as
chain CTEs and match values to the ulp — the same design contract as
``operators.geodesic`` (q53) established.

Public sources: T. Vincenty, "Direct and inverse solutions of
geodesics on the ellipsoid with application of nested equations",
Survey Review XXIII No 176 (1975).  The reference delegates the
equivalent machinery to libproj's geodesic module
(/root/reference/src/proj.rs wraps proj_trans; aeqd lives in libproj
proper) — this is a from-scratch reimplementation of the published
algorithm, not a translation.
"""

from __future__ import annotations

import numpy as np

__all__ = ["inverse_core", "direct_core", "WGS84_A", "WGS84_F"]

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563


def inverse_core(Lr, phi1, phi2, a: float = WGS84_A, f: float = WGS84_F,
                 iters: int = 12):
    """Inverse problem in radians: raw longitude difference ``Lr``
    (lam2 - lam1, pre-wrap) and latitudes ``phi1``/``phi2`` ->
    ``(s_meters, alpha1)`` where ``alpha1`` is the forward azimuth at
    point 1 (radians, east of north).  NaN distance marks the
    non-convergence (near-antipodal) region, matching
    ``operators.geodesic.vincenty_inverse``'s contract."""
    Lr = np.asarray(Lr, dtype=np.float64)
    phi1 = np.asarray(phi1, dtype=np.float64)
    phi2 = np.asarray(phi2, dtype=np.float64)
    b = a * (1.0 - f)
    # floor-based wrap into [-pi, pi) — identical closed form to
    # kernels.adjlon and the SQL twin, so every caller agrees exactly
    L = Lr - 2.0 * np.pi * np.floor((Lr + np.pi) / (2.0 * np.pi))
    U1 = np.arctan((1.0 - f) * np.tan(phi1))
    U2 = np.arctan((1.0 - f) * np.tan(phi2))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
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
    s = np.where(np.abs(lam) > np.pi, np.nan, s)
    alpha1 = np.arctan2(cosU2 * sinLam,
                        cosU1 * sinU2 - sinU1 * cosU2 * cosLam)
    return s, alpha1


def direct_core(phi1, alpha1, s, a: float = WGS84_A, f: float = WGS84_F,
                iters: int = 12):
    """Direct problem in radians: from latitude ``phi1``, forward
    azimuth ``alpha1`` and distance ``s`` meters -> ``(dlam, phi2)``
    where ``dlam`` is the longitude increment east of the start point.
    Fixed ``iters`` sigma iterations (double-precision fixpoint is
    reached in 3-4; the margin keeps the SQL twin trivially exact)."""
    phi1 = np.asarray(phi1, dtype=np.float64)
    alpha1 = np.asarray(alpha1, dtype=np.float64)
    s = np.asarray(s, dtype=np.float64)
    b = a * (1.0 - f)
    sinA1, cosA1 = np.sin(alpha1), np.cos(alpha1)
    tanU1 = (1.0 - f) * np.tan(phi1)
    cosU1 = 1.0 / np.sqrt(1.0 + tanU1 * tanU1)
    sinU1 = tanU1 * cosU1
    sigma1 = np.arctan2(tanU1, cosA1)
    sinAlpha = cosU1 * sinA1
    cos2Alpha = 1.0 - sinAlpha * sinAlpha
    u2 = cos2Alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))

    sigma0 = s / (b * A)
    sigma = sigma0.copy() if hasattr(sigma0, "copy") else np.asarray(
        sigma0, dtype=np.float64)
    for _ in range(iters):
        cos2SigmaM = np.cos(2.0 * sigma1 + sigma)
        sinSigma, cosSigma = np.sin(sigma), np.cos(sigma)
        dSigma = B * sinSigma * (
            cos2SigmaM + B / 4.0 * (
                cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM)
                - B / 6.0 * cos2SigmaM * (-3.0 + 4.0 * sinSigma * sinSigma)
                * (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM)))
        sigma = sigma0 + dSigma

    cos2SigmaM = np.cos(2.0 * sigma1 + sigma)
    sinSigma, cosSigma = np.sin(sigma), np.cos(sigma)
    phi2 = np.arctan2(
        sinU1 * cosSigma + cosU1 * sinSigma * cosA1,
        (1.0 - f) * np.sqrt(
            sinAlpha * sinAlpha
            + (sinU1 * sinSigma - cosU1 * cosSigma * cosA1) ** 2))
    lam = np.arctan2(sinSigma * sinA1,
                     cosU1 * cosSigma - sinU1 * sinSigma * cosA1)
    C = f / 16.0 * cos2Alpha * (4.0 + f * (4.0 - 3.0 * cos2Alpha))
    dlam = lam - (1.0 - C) * f * sinAlpha * (
        sigma + C * sinSigma * (
            cos2SigmaM
            + C * cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM)))
    return dlam, phi2
