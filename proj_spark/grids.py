"""NTv2-style horizontal grid datum shifts (the ``+nadgrids=`` /
``+proj=hgridshift`` capability class).

The reference delegates grid shifts to libproj + downloaded grid files
(builder knobs /root/reference/src/proj.rs:370-440; the OSTN15 demo at
/root/reference/src/proj.rs:1632-1638 shows grid-vs-ballpark moving a
point measurably).  This module implements the on-disk format and the
interpolation math directly:

  * a **NTv2 (.gsb) binary reader/writer** — the published record
    layout (11 x 16-byte overview records, then per subgrid 11 x
    16-byte header records + ``GS_COUNT`` nodes of four float32:
    lat shift, lon shift, two accuracies, all in arc-seconds with
    longitudes POSITIVE WEST, nodes ordered longitude-fastest from the
    south-east corner).  Both byte orders are accepted (the original
    Canadian grids are big-endian; most modern redistributions are
    little-endian) — detected from the NUM_OREC value.  Multi-subgrid
    files (parent/child hierarchies like NTv2_0.gsb / OSTN15) parse
    fully, and evaluation resolves each point to the DENSEST containing
    subgrid (the NTv2 parent->child walk; for well-formed files where
    children nest inside their parent the two rules coincide);
  * vectorized **bilinear interpolation** of the shift at arbitrary
    points (the standard NTv2 evaluation; points outside the grid are
    NaN — a maskable error in the engine's error model);
  * a deterministic **synthetic shift field** with closed-form node
    values, so the checked-in fixture is reproducible byte-for-byte
    and the DuckDB oracle can recompute the identical float32 node
    values from the formula instead of reading the file.

Shift semantics (documented convention, pinned by tests): forward
applies source->target as stored —

    lat' = lat + dlat_sec / 3600
    lon' = lon - dlon_west_sec / 3600   (positive-west shift)

and the inverse iterates the fixed point ``src = tgt - shift(src)``
(4 iterations, the standard NTv2 reverse evaluation).

Scale shape: a grid is a few MB of float32 loaded ONCE per Python
worker (module-level cache, the O23 per-worker pattern) and applied to
whole numpy columns — no per-row work, no shuffle.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np

__all__ = [
    "NTv2Grid",
    "NTv2File",
    "write_ntv2",
    "write_ntv2_file",
    "read_ntv2",
    "load_grid",
    "resolve_grid_name",
    "grid_shift",
    "synthetic_shift_field",
    "synthetic_grid_spec",
    "write_synthetic_fixture",
    "write_synthetic_multigrid_fixture",
    "GRID_DIR",
]

GRID_DIR = os.path.join(os.path.dirname(__file__), "data")


@dataclass(frozen=True)
class NTv2Grid:
    """One parsed NTv2 subgrid.  Extents/increments in arc-seconds,
    longitudes positive WEST (the NTv2 convention); shift arrays are
    (nrows, ncols) float32 with row 0 at ``s_lat`` and col 0 at
    ``e_long`` (the south-east corner), longitude increasing westward."""

    name: str
    s_lat: float
    n_lat: float
    e_long: float
    w_long: float
    lat_inc: float
    long_inc: float
    dlat_sec: np.ndarray       # (nrows, ncols) float32
    dlon_west_sec: np.ndarray  # (nrows, ncols) float32
    parent: str = "NONE"

    @property
    def nrows(self) -> int:
        return self.dlat_sec.shape[0]

    @property
    def ncols(self) -> int:
        return self.dlat_sec.shape[1]


@dataclass(frozen=True)
class NTv2File:
    """A parsed .gsb file: one or more subgrids.  ``subgrids`` is kept
    densest-first (smallest cell area) so point resolution can take the
    first containing subgrid — the NTv2 parent->child rule for
    well-formed files (children are denser than, and nested inside,
    their parent).  Attribute access for the single-subgrid profile
    delegates to the root subgrid, so ``read_ntv2(path).dlat_sec`` keeps
    meaning "the (only) grid" for the synthetic fixture."""

    subgrids: tuple          # tuple[NTv2Grid, ...], densest-first
    root_index: int = 0      # position of the top-level (coarsest) grid

    @property
    def root(self) -> NTv2Grid:
        return self.subgrids[self.root_index]

    def __getattr__(self, item):
        # delegate NTv2Grid fields (name, nrows, dlat_sec, ...) to root
        return getattr(object.__getattribute__(self, "subgrids")[
            object.__getattribute__(self, "root_index")], item)

    def __len__(self) -> int:
        return len(self.subgrids)


def _rec_str(name: str, value: str) -> bytes:
    return name.encode("ascii").ljust(8) + value.encode("ascii").ljust(8)


def _rec_f64(name: str, value: float) -> bytes:
    return name.encode("ascii").ljust(8) + struct.pack("<d", float(value))


def _rec_i32(name: str, value: int) -> bytes:
    return (name.encode("ascii").ljust(8)
            + struct.pack("<i", int(value)) + b"\x00" * 4)


def _subgrid_block(grid: NTv2Grid) -> list[bytes]:
    nrows, ncols = grid.dlat_sec.shape
    out = [
        _rec_str("SUB_NAME", grid.name[:8]),
        _rec_str("PARENT", (grid.parent or "NONE")[:8]),
        _rec_str("CREATED", "00000000"),
        _rec_str("UPDATED", "00000000"),
        _rec_f64("S_LAT", grid.s_lat),
        _rec_f64("N_LAT", grid.n_lat),
        _rec_f64("E_LONG", grid.e_long),
        _rec_f64("W_LONG", grid.w_long),
        _rec_f64("LAT_INC", grid.lat_inc),
        _rec_f64("LONG_INC", grid.long_inc),
        _rec_i32("GS_COUNT", nrows * ncols),
    ]
    nodes = np.zeros((nrows * ncols, 4), dtype="<f4")
    nodes[:, 0] = grid.dlat_sec.reshape(-1)
    nodes[:, 1] = grid.dlon_west_sec.reshape(-1)
    out.append(nodes.tobytes())
    return out


def write_ntv2_file(path: str, grids: list,
                    system_f: str = "SRC", system_t: str = "TGT",
                    major: float = 6378137.0,
                    minor: float = 6356752.3141) -> None:
    """Write a (possibly multi-subgrid) NTv2 .gsb file (little-endian).
    ``grids[i].parent`` names each subgrid's parent ("NONE" = top)."""
    out = [
        _rec_i32("NUM_OREC", 11),
        _rec_i32("NUM_SREC", 11),
        _rec_i32("NUM_FILE", len(grids)),
        _rec_str("GS_TYPE", "SECONDS"),
        _rec_str("VERSION", "NTv2.0"),
        _rec_str("SYSTEM_F", system_f),
        _rec_str("SYSTEM_T", system_t),
        _rec_f64("MAJOR_F", major),
        _rec_f64("MINOR_F", minor),
        _rec_f64("MAJOR_T", major),
        _rec_f64("MINOR_T", minor),
    ]
    for g in grids:
        out.extend(_subgrid_block(g))
    with open(path, "wb") as f:
        f.write(b"".join(out))


def write_ntv2(path: str, grid: NTv2Grid, **kw) -> None:
    """Write a single-subgrid NTv2 .gsb file (little-endian)."""
    write_ntv2_file(path, [grid], **kw)


def read_ntv2(path: str) -> NTv2File:
    """Parse an NTv2 .gsb file (either byte order, any subgrid count)."""
    with open(path, "rb") as f:
        raw = f.read()
    return read_ntv2_bytes(raw, path)


_SANE_REC_MAX = 64  # NTv2 uses 11; anything near is fine, 1.8e8 is not


def read_ntv2_bytes(raw: bytes, path: str = "<bytes>") -> NTv2File:
    """Parse NTv2 from raw bytes (the zip-shipped resource path).

    Byte order is detected from NUM_OREC: a big-endian file (the
    original Canadian grids; libproj accepts both orders) reads as
    ~1.8e8 little-endian, so whichever interpretation yields a sane
    record count (== 11 in every published file) wins.  Record counts
    and GS_COUNT are bounds-checked against the buffer so a corrupt
    header fails fast with a clear error instead of a runaway loop."""

    def name_at(off: int) -> str:
        return raw[off:off + 8].decode("ascii", "replace").strip()

    if name_at(0) != "NUM_OREC":
        raise ValueError(f"not an NTv2 file: {path!r}")
    end = "<"
    n_orec = struct.unpack_from("<i", raw, 8)[0]
    if not (1 <= n_orec <= _SANE_REC_MAX):
        n_orec_be = struct.unpack_from(">i", raw, 8)[0]
        if 1 <= n_orec_be <= _SANE_REC_MAX:
            end, n_orec = ">", n_orec_be
        else:
            raise ValueError(
                f"NTv2 NUM_OREC implausible in {path!r}: "
                f"{n_orec} (LE) / {n_orec_be} (BE)")
    n_srec = struct.unpack_from(end + "i", raw, 24)[0]
    n_file = 1
    if name_at(32) == "NUM_FILE":
        n_file = struct.unpack_from(end + "i", raw, 40)[0]
    if not (1 <= n_srec <= _SANE_REC_MAX) or not (1 <= n_file <= 4096):
        raise ValueError(
            f"NTv2 header counts implausible in {path!r}: "
            f"NUM_SREC={n_srec} NUM_FILE={n_file}")
    off = 16 * n_orec
    subgrids: list[NTv2Grid] = []
    f4 = np.dtype(end + "f4")
    for _ in range(n_file):
        hdr: dict[str, object] = {}
        for _ in range(n_srec):
            if off + 16 > len(raw):
                raise ValueError(f"truncated NTv2 subgrid header in {path!r}")
            key = name_at(off)
            if key in ("S_LAT", "N_LAT", "E_LONG", "W_LONG",
                       "LAT_INC", "LONG_INC"):
                hdr[key] = struct.unpack_from(end + "d", raw, off + 8)[0]
            elif key == "GS_COUNT":
                hdr[key] = struct.unpack_from(end + "i", raw, off + 8)[0]
            else:
                hdr[key] = raw[off + 8:off + 16].decode(
                    "ascii", "replace").strip()
            off += 16
        count = int(hdr["GS_COUNT"])  # type: ignore[arg-type]
        if count <= 0 or off + 16 * count > len(raw):
            raise ValueError(
                f"NTv2 GS_COUNT={count} exceeds file size in {path!r}")
        nodes = np.frombuffer(raw, dtype=f4, count=count * 4,
                              offset=off).reshape(count, 4)
        off += 16 * count
        ncols = int(round((float(hdr["W_LONG"]) - float(hdr["E_LONG"]))
                          / float(hdr["LONG_INC"]))) + 1
        nrows = count // ncols
        if nrows * ncols != count:
            raise ValueError(f"NTv2 grid shape mismatch in {path!r}")
        subgrids.append(NTv2Grid(
            name=str(hdr.get("SUB_NAME", "")),
            s_lat=float(hdr["S_LAT"]), n_lat=float(hdr["N_LAT"]),
            e_long=float(hdr["E_LONG"]), w_long=float(hdr["W_LONG"]),
            lat_inc=float(hdr["LAT_INC"]), long_inc=float(hdr["LONG_INC"]),
            dlat_sec=np.ascontiguousarray(
                nodes[:, 0].reshape(nrows, ncols), dtype="<f4"),
            dlon_west_sec=np.ascontiguousarray(
                nodes[:, 1].reshape(nrows, ncols), dtype="<f4"),
            parent=str(hdr.get("PARENT", "NONE")) or "NONE",
        ))
    # densest-first so evaluation takes the first containing subgrid
    order = sorted(range(len(subgrids)),
                   key=lambda i: (subgrids[i].lat_inc * subgrids[i].long_inc,
                                  i))
    sorted_grids = tuple(subgrids[i] for i in order)
    roots = [j for j, g in enumerate(sorted_grids) if g.parent == "NONE"]
    # the ROOT is the top-level (coarsest) grid; with several PARENT=
    # NONE subgrids (legal per the spec) the densest-first ordering
    # puts the coarsest root LAST
    return NTv2File(subgrids=sorted_grids,
                    root_index=roots[-1] if roots else len(sorted_grids) - 1)


_GRID_CACHE: dict[str, NTv2File] = {}
_EXTRA_SEARCH: list[str] = []  # TransformBuilder.set_search_paths appends


def resolve_grid_name(name_or_path: str) -> str:
    """Resolve a grid reference to the name a UDF closure should SHIP
    to executors.  Package-data grids keep the bare name (they ride the
    --py-files zip and re-resolve per worker through the zip importer);
    anything found through driver-local state — cwd, builder search
    paths (``set_search_paths`` fills a driver-side module global that
    does NOT exist on executors) — is pinned to its absolute path so
    executors open the same file the driver validated."""
    if os.path.isabs(name_or_path):
        return name_or_path
    # same precedence as read_resource_bytes: cwd-relative first, then
    # package data, then builder search paths
    if os.path.exists(name_or_path):
        return os.path.abspath(name_or_path)
    if os.path.exists(os.path.join(GRID_DIR, name_or_path)):
        return name_or_path  # package data: ships inside the zip
    for base in _EXTRA_SEARCH:
        cand = os.path.join(base, name_or_path)
        if os.path.exists(cand):
            return os.path.abspath(cand)
    try:
        # zip-only package data (driver itself running from the
        # --py-files zip): the grid ships with the job, so it wins over
        # a network fetch — same precedence as read_resource_bytes
        from importlib import resources

        if (resources.files("proj_spark") / "data"
                / name_or_path).is_file():
            return name_or_path
    except (ModuleNotFoundError, OSError):
        pass
    from . import network

    if network.is_network_enabled():
        # fetch ONCE on the driver at construction time and pin the
        # cache path — Python UDF workers are separate processes whose
        # network module state is fresh (off), so they must never need
        # to re-fetch; they open the file the driver cached (point
        # PROJ_SPARK_GRID_CACHE at a shared filesystem on a cluster)
        try:
            return network.fetch_grid(name_or_path)
        except network.DownloadError:
            pass  # fall through: maybe zip-only package data
    return name_or_path  # zip-only package data: bare name


def read_resource_bytes(name_or_path: str) -> bytes:
    """Resolve a grid reference to raw bytes: cwd/absolute path, then
    ``proj_spark/data`` on disk, builder-registered search paths, the
    --py-files zip importer (spark-submit executors — the package lives
    INSIDE the zip where os.path.exists cannot see; importlib.resources
    reads through the zip importer, pinned by the real spark-submit
    test), and finally the network fetcher's bounded on-disk cache when
    networking is enabled (reference O22, src/network.rs)."""
    path = name_or_path
    if not os.path.isabs(path) and not os.path.exists(path):
        for base in [GRID_DIR, *_EXTRA_SEARCH]:
            cand = os.path.join(base, name_or_path)
            if os.path.exists(cand):
                path = cand
                break
    if os.path.exists(path):
        with open(path, "rb") as f:
            return f.read()
    if not os.path.isabs(name_or_path):
        try:
            from importlib import resources

            return (resources.files("proj_spark") / "data"
                    / name_or_path).read_bytes()
        except (FileNotFoundError, ModuleNotFoundError, OSError):
            pass
        from . import network

        if network.is_network_enabled():
            try:
                cached = network.fetch_grid(name_or_path)
            except network.DownloadError as e:
                # documented contract: a missing grid is a
                # FileNotFoundError regardless of the network toggle
                raise FileNotFoundError(
                    f"grid {name_or_path!r} not found (searched cwd, "
                    f"{GRID_DIR}, {_EXTRA_SEARCH}, package data, and "
                    f"the network endpoint: {e})") from e
            with open(cached, "rb") as f:
                return f.read()
    raise FileNotFoundError(
        f"grid {name_or_path!r} not found (searched cwd, {GRID_DIR}, "
        f"{_EXTRA_SEARCH} and package data"
        f"{' and network' if _network_hint() else ''})")


def _network_hint() -> bool:
    try:
        from . import network

        return network.is_network_enabled()
    except Exception:
        return False


def load_grid(name_or_path: str) -> NTv2File:
    """Resolve + parse a grid, cached per process (per Python worker on
    executors — the reference's per-thread context pattern, O23).
    Bare names resolve against ``proj_spark/data`` (so a grid checked
    into the package ships inside the ``--py-files`` zip), any
    builder-registered search paths, and — when ``enable_network`` is
    on — the bounded network grid cache (O22)."""
    g = _GRID_CACHE.get(name_or_path)
    if g is not None:
        return g
    g = read_ntv2_bytes(read_resource_bytes(name_or_path), name_or_path)
    _GRID_CACHE[name_or_path] = g
    return g


def grid_shift(grid, lon_deg, lat_deg):
    """Bilinear shift at (lon_deg positive-east, lat_deg) ->
    (dlon_east_deg, dlat_deg); NaN outside every subgrid.

    ``grid`` is an :class:`NTv2File` or a bare :class:`NTv2Grid`.  For
    multi-subgrid files each point resolves to the DENSEST subgrid
    containing it (parent/child hierarchies like NTv2_0.gsb / OSTN15:
    the child's finer nodes win inside the child box, the parent covers
    the rest) — one vectorized pass per subgrid, first-containing wins."""
    lon = np.atleast_1d(np.asarray(lon_deg, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat_deg, dtype=np.float64))
    subgrids = grid.subgrids if isinstance(grid, NTv2File) else (grid,)
    if len(subgrids) == 1:
        return _grid_shift_one(subgrids[0], lon, lat)
    out_dlon = np.full(lon.shape, np.nan)
    out_dlat = np.full(lon.shape, np.nan)
    unassigned = np.ones(lon.shape, dtype=bool)
    for g in subgrids:  # densest-first (NTv2File ordering contract)
        if not unassigned.any():
            break
        dlon, dlat = _grid_shift_one(g, lon, lat)
        take = unassigned & ~np.isnan(dlat)
        out_dlon[take] = dlon[take]
        out_dlat[take] = dlat[take]
        unassigned &= ~take
    return out_dlon, out_dlat


def _grid_shift_one(grid: NTv2Grid, lon, lat):
    lon_w_sec = -lon * 3600.0
    lat_sec = lat * 3600.0
    fc = (lon_w_sec - grid.e_long) / grid.long_inc
    fr = (lat_sec - grid.s_lat) / grid.lat_inc
    inside = ((fc >= 0.0) & (fc <= grid.ncols - 1)
              & (fr >= 0.0) & (fr <= grid.nrows - 1))
    fc_s = np.where(inside, fc, 0.0)
    fr_s = np.where(inside, fr, 0.0)
    c0 = np.minimum(np.floor(fc_s).astype(np.int64), grid.ncols - 2)
    r0 = np.minimum(np.floor(fr_s).astype(np.int64), grid.nrows - 2)
    c0 = np.maximum(c0, 0)
    r0 = np.maximum(r0, 0)
    tx = fc_s - c0
    ty = fr_s - r0
    out = []
    for vals in (grid.dlat_sec, grid.dlon_west_sec):
        v = vals.astype(np.float64)
        v00 = v[r0, c0]
        v01 = v[r0, c0 + 1]
        v10 = v[r0 + 1, c0]
        v11 = v[r0 + 1, c0 + 1]
        interp = (v00 * (1 - ty) * (1 - tx) + v01 * (1 - ty) * tx
                  + v10 * ty * (1 - tx) + v11 * ty * tx)
        out.append(np.where(inside, interp, np.nan))
    dlat_sec, dlon_west_sec = out
    return -dlon_west_sec / 3600.0, dlat_sec / 3600.0


# ---------------------------------------------------------------------------
# synthetic fixture — smooth deterministic field with a closed form the
# DuckDB oracle can recompute (float32-rounded, like the file nodes)
# ---------------------------------------------------------------------------
def synthetic_shift_field(lon_deg, lat_deg):
    """Closed-form shift field (arc-seconds): smooth, O(1 arcsec) —
    the magnitude class of real NAD27->NAD83 / OSTN15 corrections.
    Mirrored verbatim by the SQL oracle."""
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    lr, pr = np.radians(lon), np.radians(lat)
    dlat_sec = 0.9 + 0.35 * np.sin(3.0 * lr) * np.cos(4.0 * pr)
    dlon_west_sec = -1.2 + 0.5 * np.sin(2.0 * lr) * np.sin(3.0 * pr)
    return dlat_sec, dlon_west_sec


def synthetic_grid_spec():
    """Extent of the checked-in fixture: covers the engine's California
    test domain (120W..112W, 31N..36N) at 0.25 deg spacing."""
    return {
        "s_lat": 31.0 * 3600.0, "n_lat": 36.0 * 3600.0,
        "e_long": 112.0 * 3600.0, "w_long": 120.0 * 3600.0,
        "lat_inc": 900.0, "long_inc": 900.0,
    }


def _field_grid(spec: dict, field, name: str, parent: str = "NONE"
                ) -> NTv2Grid:
    ncols = int(round((spec["w_long"] - spec["e_long"])
                      / spec["long_inc"])) + 1
    nrows = int(round((spec["n_lat"] - spec["s_lat"])
                      / spec["lat_inc"])) + 1
    lon_w_sec = spec["e_long"] + np.arange(ncols) * spec["long_inc"]
    lat_sec = spec["s_lat"] + np.arange(nrows) * spec["lat_inc"]
    LONW, LAT = np.meshgrid(lon_w_sec, lat_sec)
    dlat, dlonw = field(-LONW / 3600.0, LAT / 3600.0)
    return NTv2Grid(
        name=name, parent=parent, dlat_sec=dlat.astype("<f4"),
        dlon_west_sec=dlonw.astype("<f4"), **spec)


def write_synthetic_fixture(path: str | None = None) -> str:
    """(Re)generate the deterministic fixture; returns the path.
    Byte-reproducible: node values are float32(closed form at node)."""
    grid = _field_grid(synthetic_grid_spec(), synthetic_shift_field,
                       "SYNSHIFT")
    if path is None:
        os.makedirs(GRID_DIR, exist_ok=True)
        path = os.path.join(GRID_DIR, "synthetic_shift.gsb")
    write_ntv2(path, grid)
    return path


# ---- two-subgrid fixture: coarse parent + dense child (the NTv2_0 /
# OSTN15 parent/child shape, reference anchor /root/reference/src/
# proj.rs:1632-1638) ---------------------------------------------------------
def synthetic_child_spec():
    """Child subgrid: 5x denser (0.05 deg) over a sub-box of the parent
    extent, node-aligned with the parent lattice."""
    return {
        "s_lat": 33.0 * 3600.0, "n_lat": 35.0 * 3600.0,
        "e_long": 116.0 * 3600.0, "w_long": 119.0 * 3600.0,
        "lat_inc": 180.0, "long_inc": 180.0,
    }


def synthetic_shift_field_child(lon_deg, lat_deg):
    """The child's refined field: the parent field plus a finer
    harmonic — the refinement a real child subgrid encodes.  Mirrored
    verbatim by the SQL oracle (float32 node literals)."""
    dlat_sec, dlon_west_sec = synthetic_shift_field(lon_deg, lat_deg)
    lr = np.radians(np.asarray(lon_deg, dtype=np.float64))
    pr = np.radians(np.asarray(lat_deg, dtype=np.float64))
    dlat_sec = dlat_sec + 0.2 * np.sin(7.0 * lr) * np.cos(6.0 * pr)
    dlon_west_sec = dlon_west_sec + 0.15 * np.cos(5.0 * lr) * np.sin(8.0 * pr)
    return dlat_sec, dlon_west_sec


def write_synthetic_multigrid_fixture(path: str | None = None) -> str:
    """(Re)generate the two-subgrid fixture (parent coarse over the
    full box, child dense over the sub-box); returns the path."""
    parent = _field_grid(synthetic_grid_spec(), synthetic_shift_field,
                         "SYNSHIFT")
    child = _field_grid(synthetic_child_spec(),
                        synthetic_shift_field_child,
                        "SYNCHILD", parent="SYNSHIFT")
    if path is None:
        os.makedirs(GRID_DIR, exist_ok=True)
        path = os.path.join(GRID_DIR, "synthetic_shift2.gsb")
    write_ntv2_file(path, [parent, child])
    return path
