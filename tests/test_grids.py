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
