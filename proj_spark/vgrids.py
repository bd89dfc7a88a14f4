"""GTX vertical (geoid) grids and the ``+proj=vgridshift`` step's
evaluation math — the vertical component of the reference's grid
capability class.

The reference carries z through every call (``PJ_COORD`` is always
x/y/z/t: /root/reference/src/proj.rs:951-957, 1022-1030) and its
libproj backend ships geoid height grids (EGM96/GEOID18-class) in the
GTX format.  This module implements that published format directly:

  * **GTX binary layout** (NOAA/NGS VDatum, also read by libproj):
    a 40-byte big-endian header — ``ll_lat, ll_lon, delta_lat,
    delta_lon`` as float64 then ``nrows, ncols`` as int32 — followed by
    ``nrows*ncols`` big-endian float32 undulation values in meters,
    row-major from the SOUTH-WEST corner, longitude fastest, longitudes
    positive EAST (0..360 in real files; this reader normalizes query
    longitudes onto the header's range);
  * vectorized **bilinear interpolation** of the undulation N(lon,lat)
    (NaN outside the grid — maskable, the engine's row-wise error
    model);
  * a deterministic **synthetic geoid fixture** with closed-form node
    values so the checked-in file is byte-reproducible and the DuckDB
    oracle recomputes identical float32 nodes from the formula.

Shift semantics (pinned by tests, matching PROJ's vgridshift):
forward ADDS the interpolated value times ``+multiplier`` (default
1.0) — the grid stores the shift from the vertical datum to the
ellipsoid, so forward is orthometric->ellipsoidal ``h = H + N`` and
inverse is ``H = h - N``.  The horizontal position is unchanged, so
the inverse is exact (no fixed-point iteration needed).

Scale shape: like horizontal grids, a GTX file is a few MB of float32
loaded ONCE per Python worker and applied to whole numpy columns.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np

from . import grids as G

__all__ = [
    "GtxGrid",
    "write_gtx",
    "read_gtx",
    "read_gtx_bytes",
    "load_geoid",
    "geoid_undulation",
    "synthetic_geoid_field",
    "synthetic_geoid_spec",
    "write_synthetic_geoid_fixture",
]


@dataclass(frozen=True)
class GtxGrid:
    """One parsed GTX grid.  ``ll_lat``/``ll_lon`` are the SW corner in
    degrees (lon positive east, possibly 0..360); ``values`` is
    (nrows, ncols) float32 meters, row 0 at ``ll_lat``, col 0 at
    ``ll_lon``."""

    ll_lat: float
    ll_lon: float
    dlat: float
    dlon: float
    values: np.ndarray  # (nrows, ncols) float32

    @property
    def nrows(self) -> int:
        return self.values.shape[0]

    @property
    def ncols(self) -> int:
        return self.values.shape[1]


def write_gtx(path: str, grid: GtxGrid) -> None:
    """Write the published big-endian GTX layout."""
    nrows, ncols = grid.values.shape
    hdr = struct.pack(">4d2i", grid.ll_lat, grid.ll_lon,
                      grid.dlat, grid.dlon, nrows, ncols)
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(grid.values.astype(">f4").tobytes())


def read_gtx(path: str) -> GtxGrid:
    with open(path, "rb") as f:
        raw = f.read()
    return read_gtx_bytes(raw, path)


def read_gtx_bytes(raw: bytes, path: str = "<bytes>") -> GtxGrid:
    if len(raw) < 40:
        raise ValueError(f"not a GTX file (too short): {path!r}")
    ll_lat, ll_lon, dlat, dlon, nrows, ncols = struct.unpack_from(
        ">4d2i", raw, 0)
    if not (1 <= nrows <= 10 ** 6 and 1 <= ncols <= 10 ** 6
            and 0 < dlat <= 90 and 0 < dlon <= 90
            and -90 <= ll_lat <= 90):
        raise ValueError(f"GTX header implausible in {path!r}: "
                         f"{(ll_lat, ll_lon, dlat, dlon, nrows, ncols)}")
    count = nrows * ncols
    if 40 + 4 * count > len(raw):
        raise ValueError(f"GTX node block truncated in {path!r}")
    vals = np.frombuffer(raw, dtype=">f4", count=count, offset=40)
    return GtxGrid(ll_lat=ll_lat, ll_lon=ll_lon, dlat=dlat, dlon=dlon,
                   values=np.ascontiguousarray(
                       vals.reshape(nrows, ncols), dtype="<f4"))


_GEOID_CACHE: dict[str, GtxGrid] = {}


def load_geoid(name_or_path: str) -> GtxGrid:
    """Resolve + parse a GTX geoid, cached per process (per Python
    worker, the O23 pattern).  Same resolution order as horizontal
    grids: package data -> search paths -> --py-files zip -> network."""
    g = _GEOID_CACHE.get(name_or_path)
    if g is not None:
        return g
    g = read_gtx_bytes(G.read_resource_bytes(name_or_path), name_or_path)
    _GEOID_CACHE[name_or_path] = g
    return g


def geoid_undulation(grid: GtxGrid, lon_deg, lat_deg) -> np.ndarray:
    """Bilinear N(lon, lat) in meters; NaN outside the grid.  Query
    longitudes normalize onto the header's range (real GTX files use
    0..360 east)."""
    lon = np.atleast_1d(np.asarray(lon_deg, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat_deg, dtype=np.float64))
    # shift lon by whole turns onto [ll_lon, ll_lon+360)
    lon = lon - 360.0 * np.floor((lon - grid.ll_lon) / 360.0)
    fc = (lon - grid.ll_lon) / grid.dlon
    fr = (lat - grid.ll_lat) / grid.dlat
    inside = ((fc >= 0.0) & (fc <= grid.ncols - 1)
              & (fr >= 0.0) & (fr <= grid.nrows - 1))
    fc_s = np.where(inside, fc, 0.0)
    fr_s = np.where(inside, fr, 0.0)
    c0 = np.clip(np.floor(fc_s).astype(np.int64), 0, grid.ncols - 2)
    r0 = np.clip(np.floor(fr_s).astype(np.int64), 0, grid.nrows - 2)
    tx = fc_s - c0
    ty = fr_s - r0
    v = grid.values.astype(np.float64)
    interp = (v[r0, c0] * (1 - ty) * (1 - tx)
              + v[r0, c0 + 1] * (1 - ty) * tx
              + v[r0 + 1, c0] * ty * (1 - tx)
              + v[r0 + 1, c0 + 1] * ty * tx)
    return np.where(inside, interp, np.nan)


# ---------------------------------------------------------------------------
# synthetic fixture — closed-form undulation the SQL oracle replicates
# ---------------------------------------------------------------------------
def synthetic_geoid_field(lon_deg, lat_deg):
    """Closed-form undulation (meters): smooth, -40..+10 m — the
    magnitude class of real EGM96 values over CONUS.  Mirrored
    verbatim by the SQL oracle."""
    lr = np.radians(np.asarray(lon_deg, dtype=np.float64))
    pr = np.radians(np.asarray(lat_deg, dtype=np.float64))
    return (-32.5 + 6.0 * np.sin(2.0 * lr) * np.cos(3.0 * pr)
            + 2.5 * np.cos(5.0 * lr) * np.sin(4.0 * pr))


def synthetic_geoid_spec():
    """Extent of the checked-in fixture: the California test domain
    (120W..112W, 31N..36N) at 0.1 deg, lon stored 0..360 east like
    real GTX files."""
    return {"ll_lat": 31.0, "ll_lon": 240.0, "dlat": 0.1, "dlon": 0.1,
            "nrows": 51, "ncols": 81}


def write_synthetic_geoid_fixture(path: str | None = None) -> str:
    """(Re)generate the deterministic fixture; returns the path.
    Byte-reproducible: node values are float32(closed form at node)."""
    spec = synthetic_geoid_spec()
    lon = spec["ll_lon"] + np.arange(spec["ncols"]) * spec["dlon"]
    lat = spec["ll_lat"] + np.arange(spec["nrows"]) * spec["dlat"]
    LON, LAT = np.meshgrid(lon, lat)
    vals = synthetic_geoid_field(LON - 360.0, LAT)  # field takes -180..180
    grid = GtxGrid(ll_lat=spec["ll_lat"], ll_lon=spec["ll_lon"],
                   dlat=spec["dlat"], dlon=spec["dlon"],
                   values=vals.astype("<f4"))
    if path is None:
        os.makedirs(G.GRID_DIR, exist_ok=True)
        path = os.path.join(G.GRID_DIR, "synthetic_geoid.gtx")
    write_gtx(path, grid)
    return path
