"""NTv2 grid datum shifts: format round-trip, bilinear evaluation,
pipeline-step semantics, and the reference's grid-vs-ballpark accuracy
demonstration (/root/reference/src/proj.rs:1632-1638: applying a real
grid moves a point measurably away from the ballpark answer)."""

import numpy as np
import pandas as pd
import pytest

from proj_spark import grids as G
from proj_spark.crs import ProjCreateError, Transform


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    # regenerate in a temp dir and ALSO assert the checked-in fixture
    # matches the generator byte-for-byte (reproducibility contract)
    p = tmp_path_factory.mktemp("grids") / "syn.gsb"
    G.write_synthetic_fixture(str(p))
    import os

    checked_in = os.path.join(G.GRID_DIR, "synthetic_shift.gsb")
    assert os.path.exists(checked_in)
    assert open(checked_in, "rb").read() == open(str(p), "rb").read()
    return str(p)


def test_ntv2_write_read_roundtrip(fixture_path):
    g = G.read_ntv2(fixture_path)
    assert g.name == "SYNSHIFT"
    assert (g.nrows, g.ncols) == (21, 33)
    assert g.s_lat == 31.0 * 3600 and g.w_long == 120.0 * 3600
    # node values are float32(closed form at the node)
    lon0 = -(g.e_long + 5 * g.long_inc) / 3600.0
    lat0 = (g.s_lat + 7 * g.lat_inc) / 3600.0
    want_dlat, want_dlonw = G.synthetic_shift_field(lon0, lat0)
    assert g.dlat_sec[7, 5] == np.float32(want_dlat)
    assert g.dlon_west_sec[7, 5] == np.float32(want_dlonw)


def test_bilinear_between_nodes(fixture_path):
    g = G.read_ntv2(fixture_path)
    # manual bilinear from the four float32 corners at a mid-cell point
    lon, lat = -118.125, 33.625  # halfway in both axes on the 0.25 grid
    dlon, dlat = G.grid_shift(g, lon, lat)
    r0 = int((lat * 3600 - g.s_lat) / g.lat_inc)
    c0 = int((-lon * 3600 - g.e_long) / g.long_inc)
    corners = g.dlat_sec[r0:r0 + 2, c0:c0 + 2].astype(np.float64)
    assert abs(dlat[0] * 3600.0 - corners.mean()) < 1e-12
    # interpolation error vs the smooth analytic field is small but
    # NONZERO off-node (bilinear of a curved field)
    want_dlat, _ = G.synthetic_shift_field(lon, lat)
    assert abs(dlat[0] * 3600.0 - want_dlat) < 5e-4


def test_outside_grid_is_nan_and_maskable(fixture_path):
    g = G.read_ntv2(fixture_path)
    dlon, dlat = G.grid_shift(g, np.array([-150.0, -118.0]),
                              np.array([33.0, 33.0]))
    assert np.isnan(dlon[0]) and not np.isnan(dlon[1])


def test_hgridshift_step_fwd_inv_and_ballpark_delta():
    """The reference's OSTN15 demo shape: with-grid vs ballpark
    (no-grid) answers differ by the grid's correction — here the
    synthetic field, ~1 arcsec (tens of meters) — and the inverse
    recovers the input to sub-mm."""
    t = Transform.new(
        "+proj=pipeline +step +proj=hgridshift +grids=synthetic_shift.gsb")
    lon, lat = -117.7321, 33.8765  # off-node interior point
    x, y = t.project_array(np.radians([lon]).copy(),
                           np.radians([lat]).copy())
    glon, glat = np.degrees(x[0]), np.degrees(y[0])
    dlon_want, dlat_want = G.grid_shift(
        G.load_grid("synthetic_shift.gsb"), lon, lat)
    # ballpark (identity) vs grid: moves by the interpolated correction
    assert abs((glon - lon) - dlon_want[0]) < 1e-12
    assert abs((glat - lat) - dlat_want[0]) < 1e-12
    assert 10.0 < abs(glat - lat) * 111320.0 < 60.0  # measurably moved
    # inverse fixed point
    l2, p2 = t.project_array(x.copy(), y.copy(), inverse=True)
    assert abs(np.degrees(l2[0]) - lon) * 111320.0 < 1e-4
    assert abs(np.degrees(p2[0]) - lat) * 111320.0 < 1e-4


def test_hgridshift_requires_grids_param():
    with pytest.raises(ProjCreateError, match="grids"):
        Transform.new("+proj=pipeline +step +proj=hgridshift")
    with pytest.raises(FileNotFoundError):
        Transform.new(
            "+proj=pipeline +step +proj=hgridshift +grids=missing.gsb")


def test_hgridshift_spark_surface(spark):
    """The step through the vectorized UDF surface: interior points
    shift, outside points mask to err rows (row-wise error model)."""
    from pyspark.sql import functions as F

    from proj_spark.functions.transform import projstring_udf

    df = spark.createDataFrame(pd.DataFrame({
        "id": [0, 1, 2],
        "lon": [-118.0, -115.3, 10.0],   # last one outside the grid
        "lat": [33.0, 34.2, 50.0]}))
    udf = projstring_udf(
        "+proj=pipeline +step +proj=hgridshift +grids=synthetic_shift.gsb",
        input_units="deg")
    out = df.select("id", udf(F.col("lon"), F.col("lat")).alias("t")) \
            .select("id", "t.x", "t.y", "t.err").collect()
    rows = {r["id"]: r for r in out}
    # output is in the pipeline's units (radians here)
    got_lon = np.degrees(rows[0]["x"])
    assert rows[0]["err"] is None and abs(got_lon - (-118.0)) < 1e-2
    assert abs(got_lon - (-118.0)) > 1e-5  # actually shifted
    assert rows[2]["err"] is not None  # outside grid -> masked row


# ---------------------------------------------------------------------------
# round 6: multi-subgrid files, byte-order detection, executor-safe
# search-path resolution
# ---------------------------------------------------------------------------
def test_multigrid_fixture_child_priority():
    """Two-subgrid file (parent coarse / child dense, the NTv2_0 /
    OSTN15 hierarchy shape): points inside the child box take the
    child's finer field, parent-only points the parent's, outside NaN
    — and the checked-in fixture is generator-reproducible."""
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "syn2.gsb")
        G.write_synthetic_multigrid_fixture(p)
        checked_in = os.path.join(G.GRID_DIR, "synthetic_shift2.gsb")
        assert open(checked_in, "rb").read() == open(p, "rb").read()
    f = G.load_grid("synthetic_shift2.gsb")
    assert len(f.subgrids) == 2
    assert [g.name for g in f.subgrids] == ["SYNCHILD", "SYNSHIFT"]
    assert f.root.name == "SYNSHIFT"  # delegation targets the top grid
    lon = np.array([-117.5, -113.0, -150.0])
    lat = np.array([34.0, 32.0, 10.0])
    dlon, dlat = G.grid_shift(f, lon, lat)
    parent_only = G.load_grid("synthetic_shift.gsb")
    dlon_p, dlat_p = G.grid_shift(parent_only, lon, lat)
    assert abs(dlat[0] - dlat_p[0]) > 1e-6     # child refinement applied
    assert dlat[1] == dlat_p[1]                # parent region identical
    assert np.isnan(dlat[2]) and np.isnan(dlon[2])
    # the child field evaluated directly agrees with the file lookup
    want_dlat, want_dlonw = G.synthetic_shift_field_child(lon[0], lat[0])
    # node-exact check at an exact child node
    nlon, nlat = -117.50, 34.00   # multiples of 0.05 inside the child
    dl, dp = G.grid_shift(f, np.array([nlon]), np.array([nlat]))
    wdlat, wdlonw = G.synthetic_shift_field_child(nlon, nlat)
    assert abs(dp[0] * 3600.0 - np.float32(wdlat)) < 1e-6
    assert abs(-dl[0] * 3600.0 - np.float32(wdlonw)) < 1e-6


def test_big_endian_ntv2_reads():
    """Byte-swapped NTv2 (the original Canadian grid byte order) parses
    to the identical grid — detected from NUM_OREC."""
    import os
    import struct

    raw = open(os.path.join(G.GRID_DIR, "synthetic_shift.gsb"), "rb").read()
    out = bytearray(raw)
    for i in range(22):  # 11 overview + 11 subgrid records
        o = 16 * i
        k = raw[o:o + 8].decode("ascii", "replace").strip()
        if k in ("NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT"):
            out[o + 8:o + 12] = raw[o + 8:o + 12][::-1]
        elif k in ("MAJOR_F", "MINOR_F", "MAJOR_T", "MINOR_T", "S_LAT",
                   "N_LAT", "E_LONG", "W_LONG", "LAT_INC", "LONG_INC"):
            out[o + 8:o + 16] = raw[o + 8:o + 16][::-1]
    out[352:] = np.frombuffer(raw, dtype="<f4", offset=352) \
        .byteswap().tobytes()
    f_le = G.read_ntv2_bytes(raw, "le")
    f_be = G.read_ntv2_bytes(bytes(out), "be")
    assert np.array_equal(f_be.dlat_sec, f_le.dlat_sec)
    assert f_be.s_lat == f_le.s_lat


def test_corrupt_header_fails_fast():
    """Implausible record counts fail with a clear error instead of a
    runaway record loop (the big-endian NUM_SREC=1.8e8 failure mode)."""
    import os

    raw = open(os.path.join(G.GRID_DIR, "synthetic_shift.gsb"), "rb").read()
    bad = raw[:8] + b"\xff\xff\xff\x7f" + raw[12:]
    with pytest.raises(ValueError, match="implausible"):
        G.read_ntv2_bytes(bad, "corrupt")
    # truncated node block
    with pytest.raises(ValueError, match="GS_COUNT|truncated"):
        G.read_ntv2_bytes(raw[: len(raw) // 2], "trunc")


def test_search_path_grid_pins_absolute_path(tmp_path):
    """A grid resolved through TransformBuilder.set_search_paths (a
    driver-side global that does NOT exist on executors) must ship its
    ABSOLUTE path in the step, so executor workers re-resolve without
    the driver's search state (round-6 fix; package-data grids keep
    the bare name so they ride the --py-files zip)."""
    import os

    p = tmp_path / "local_shift.gsb"
    G.write_synthetic_fixture(str(p))
    G._EXTRA_SEARCH.append(str(tmp_path))
    try:
        t = Transform.new(
            "+proj=pipeline +step +proj=hgridshift +grids=local_shift.gsb")
        step = t._steps[0]
        assert os.path.isabs(step.grids_name)
        assert step.grids_name == str(p)
        # package-data grids keep the bare zip-resolvable name
        t2 = Transform.new(
            "+proj=pipeline +step +proj=hgridshift "
            "+grids=synthetic_shift.gsb")
        assert t2._steps[0].grids_name == "synthetic_shift.gsb"
    finally:
        G._EXTRA_SEARCH.remove(str(tmp_path))


def test_missing_grid_is_file_not_found_even_with_network_on(monkeypatch):
    """The documented contract: a missing grid raises FileNotFoundError
    regardless of the network toggle (DownloadError never escapes
    read_resource_bytes)."""
    from proj_spark import network as N

    monkeypatch.setattr(N, "_ENABLED", True)
    monkeypatch.setattr(
        N, "request_with_retries",
        lambda url, timeout=30.0: (_ for _ in ()).throw(
            N.DownloadError(404, url, 0)))
    with pytest.raises(FileNotFoundError) as ei:
        G.read_resource_bytes("definitely_missing.gsb")
    assert "network endpoint" in str(ei.value)


def test_resolve_prefers_packaged_grid_over_network(monkeypatch):
    """A grid that ships as package data must never trigger a fetch,
    even with networking enabled (zip-importer precedence)."""
    from proj_spark import network as N

    monkeypatch.setattr(N, "_ENABLED", True)

    def boom(name, timeout=30.0):
        raise AssertionError("network fetch attempted for packaged grid")

    monkeypatch.setattr(N, "fetch_grid", boom)
    assert G.resolve_grid_name("synthetic_shift.gsb") == \
        "synthetic_shift.gsb"


def test_multi_root_ntv2_root_is_coarsest(tmp_path):
    """Several PARENT=NONE subgrids (legal per the NTv2 spec): the file
    root must be the top-level COARSEST grid, not an arbitrary dense
    one."""
    def mk(name, inc, n):
        return G.NTv2Grid(
            name=name, s_lat=120000.0, n_lat=120000.0 + inc * (n - 1),
            e_long=420000.0, w_long=420000.0 + inc * (n - 1),
            lat_inc=inc, long_inc=inc,
            dlat_sec=np.full((n, n), 0.5, dtype="<f4"),
            dlon_west_sec=np.full((n, n), -0.25, dtype="<f4"),
            parent="NONE")

    p = str(tmp_path / "two_roots.gsb")
    # write the DENSE root first so parse order cannot mask the bug
    G.write_ntv2_file(p, [mk("DENSE", 60.0, 11), mk("COARSE", 300.0, 5)])
    f = G.read_ntv2(p)
    root = f.subgrids[f.root_index]
    assert root.name.strip() == "COARSE"
    assert root.lat_inc == 300.0
    # evaluation still picks the densest containing subgrid
    lon_deg = -(420000.0 + 200.0) / 3600.0
    lat_deg = (120000.0 + 200.0) / 3600.0
    dlon, dlat = G.grid_shift(f, lon_deg, lat_deg)
    assert np.isfinite(dlon[0]) and np.isfinite(dlat[0])
