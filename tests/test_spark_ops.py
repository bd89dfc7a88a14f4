"""Spark-surface tests: transform UDFs, cell index, tiles, spatial joins.

Strategy mirrors the reference's KAT style (SURVEY.md §5) but at the
DataFrame level: known answers for the UDF path, bit-parity between the
JVM Column math and the numpy mirrors, and brute-force oracles for the
join operators.
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from proj_spark.functions.transform import proj_udf, with_transformed
from proj_spark.operators import cells as C
from proj_spark.operators import tiles as T
from proj_spark.operators.joins import (
    haversine_col,
    knn_join,
    pip_anti_join,
    pip_join,
)


def test_transform_udf_kat(spark):
    # the Presidio KAT through the Arrow UDF path
    # (/root/reference/src/proj.rs:1780-1789)
    df = spark.createDataFrame(
        [(1, 4760096.421921, 3744293.729449), (2, 4760197.421921, 3744394.729449)],
        "id int, x double, y double",
    )
    out = with_transformed(df, "EPSG:2230", "EPSG:26946",
                           x_col="x", y_col="y", out_x="mx", out_y="my")
    rows = {r["id"]: r for r in out.collect()}
    assert abs(rows[1]["mx"] - 1450880.2910605022) < 1e-6
    assert abs(rows[1]["my"] - 1141263.0111604782) < 1e-6
    assert abs(rows[2]["my"] - 1141293.7960220438) < 1e-6
    assert rows[1]["proj_err"] is None


def test_transform_udf_rowwise_errors(spark):
    # row-wise error columns: bad rows NaN + message, good rows fine
    df = spark.createDataFrame(
        [(1, -122.4, 37.7), (2, -122.4, 95.0)], "id int, lon double, lat double"
    )
    udf = proj_udf("EPSG:4326", "EPSG:3857")
    out = df.select("id", udf("lon", "lat").alias("t")).select(
        "id", "t.x", "t.err"
    ).collect()
    byid = {r["id"]: r for r in out}
    assert byid[1]["err"] is None and math.isfinite(byid[1]["x"])
    assert byid[2]["err"] == "Invalid coordinate"


def test_cell_column_matches_numpy(spark):
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-89.9, 89.9, 500)
    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    df = spark.createDataFrame(pdf)
    for level in (2, 8, 15, 26):
        got = np.array(
            df.select(C.cell_col(F.col("lon"), F.col("lat"), level).alias("c"))
            .toPandas()["c"]
        )
        want = C.np_cell(lon, lat, level)
        assert (got == want).all(), f"level {level}"


def test_cell_parent_and_decode_roundtrip(spark):
    rng = np.random.default_rng(8)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-89, 89, 200)
    cell = C.np_cell(lon, lat, 12)
    # parent hierarchy: parent at L' contains the same point encoded at L'
    par = C.np_cell_parent(cell, 5)
    direct = C.np_cell(lon, lat, 5)
    assert (par == direct).all()
    # Column parent matches numpy parent
    df = spark.createDataFrame(pd.DataFrame({"cell": cell}))
    got = np.array(
        df.select(C.cell_parent_col(F.col("cell"), 12, 5).alias("p")).toPandas()["p"]
    )
    assert (got == par).all()
    # decode roundtrip: center of the cell re-encodes to the same cell
    clon, clat = C.np_cell_to_lonlat(cell)
    assert (C.np_cell(clon, clat, 12) == cell).all()


def test_cell_ring_matches_numpy(spark):
    rng = np.random.default_rng(9)
    lon = rng.uniform(-179, 179, 50)
    lat = rng.uniform(-80, 80, 50)
    cell = C.np_cell(lon, lat, 7)
    df = spark.createDataFrame(pd.DataFrame({"cell": cell}))
    got = (
        df.select(F.col("cell"), C.cell_ring_col(F.col("cell"), 7, 1).alias("ring"))
        .toPandas()
    )
    want = C.np_cell_ring(cell, 1)
    for i in range(len(cell)):
        w = set(int(v) for v in want[i] if v >= 0)
        g = set(int(v) for v in got["ring"][i])
        assert g == w


def test_tiles_match_numpy_and_bounds(spark):
    rng = np.random.default_rng(10)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-85, 85, 300)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    out = T.with_tiles(df, zoom=7).toPandas()
    tx, ty = T.np_tile(lon, lat, 7)
    assert (out["tile_x"].to_numpy() == tx).all()
    assert (out["tile_y"].to_numpy() == ty).all()
    # every point falls inside its tile's bounds
    for i in range(0, 300, 37):
        w, s, e, n = T.tile_bounds(7, int(tx[i]), int(ty[i]))
        assert w - 1e-9 <= lon[i] <= e + 1e-9
        assert s - 1e-9 <= lat[i] <= n + 1e-9


def test_tile_rollup(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"lon": [0.1, 0.2, 120.0], "lat": [0.1, 0.2, 45.0]})
    )
    roll = T.tile_rollup(T.with_tiles(df, zoom=3)).toPandas()
    total = roll[roll["zoom"].isna()]["n"]
    assert int(total.iloc[0]) == 3


def _random_convex_polygon(rng, cx, cy, r, n=8):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    xs = cx + r * np.cos(ang)
    ys = cy + r * 0.7 * np.sin(ang)
    ring = [[float(x), float(y)] for x, y in zip(xs, ys)]
    ring.append(ring[0])
    return ring


def test_pip_join_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    npts = 2000
    lon = rng.uniform(-20, 20, npts)
    lat = rng.uniform(-20, 20, npts)
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(npts), "lon": lon, "lat": lat})
    )
    polys = []
    for i in range(6):
        ring = _random_convex_polygon(rng, rng.uniform(-15, 15), rng.uniform(-15, 15), 4.0)
        polys.append({"poly_id": f"p{i}", "rings": [ring]})
    polys_df = spark.createDataFrame(pd.DataFrame(polys))

    got = (
        pip_join(pts, polys_df, level=6)
        .select("point_id", "poly_id")
        .toPandas()
        .sort_values(["point_id", "poly_id"])
        .reset_index(drop=True)
    )
    # brute force numpy oracle
    from proj_spark.operators.joins import _np_point_in_rings

    rows = []
    for p in polys:
        inside = _np_point_in_rings(lon, lat, [np.array(p["rings"][0])])
        for pid in np.nonzero(inside)[0]:
            rows.append((int(pid), p["poly_id"]))
    want = (
        pd.DataFrame(rows, columns=["point_id", "poly_id"])
        .sort_values(["point_id", "poly_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(want) > 50
    assert (got["point_id"].values == want["point_id"].values).all()
    assert (got["poly_id"].values == want["poly_id"].values).all()


def test_pip_join_with_hole_and_anti(spark):
    # square with a square hole: points in the hole are NOT contained
    outer = [[-10.0, -10.0], [10.0, -10.0], [10.0, 10.0], [-10.0, 10.0], [-10.0, -10.0]]
    hole = [[-2.0, -2.0], [2.0, -2.0], [2.0, 2.0], [-2.0, 2.0], [-2.0, -2.0]]
    polys = spark.createDataFrame(
        pd.DataFrame([{"poly_id": "donut", "rings": [outer, hole]}])
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            {"point_id": [0, 1, 2], "lon": [0.0, 5.0, 50.0], "lat": [0.0, 5.0, 5.0]}
        )
    )
    hits = pip_join(pts, polys, level=5).select("point_id").toPandas()
    assert set(hits["point_id"]) == {1}
    anti = pip_anti_join(pts, polys, level=5).select("point_id").toPandas()
    assert set(anti["point_id"]) == {0, 2}


def test_knn_join_matches_bruteforce(spark):
    rng = np.random.default_rng(12)
    npts, nq, k = 3000, 40, 5
    lon = rng.uniform(-30, 30, npts)
    lat = rng.uniform(-30, 30, npts)
    qlon = rng.uniform(-25, 25, nq)
    qlat = rng.uniform(-25, 25, nq)
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(npts), "lon": lon, "lat": lat})
    )
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(nq), "lon": qlon, "lat": qlat})
    )
    got = (
        knn_join(pts, qs, k=k, level=6, ring=1)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    # numpy haversine brute force
    R = 6371008.8
    p1 = np.radians(lat)[None, :]
    p2 = np.radians(qlat)[:, None]
    dphi = (p1 - p2) / 2
    dlam = (np.radians(lon)[None, :] - np.radians(qlon)[:, None]) / 2
    h = np.sin(dphi) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlam) ** 2
    dist = 2 * R * np.arcsin(np.minimum(1.0, np.sqrt(h)))
    assert len(got) == nq * k
    for qi in range(nq):
        order = np.lexsort((np.arange(npts), dist[qi]))
        want_ids = list(order[:k])
        got_ids = list(got[got["query_id"] == qi]["point_id"])
        assert got_ids == want_ids, f"query {qi}"


def test_knn_exact_fallback_sparse(spark):
    # fewer points than ring candidates can supply: fallback must kick in
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": [0, 1, 2], "lon": [0.0, 90.0, -90.0],
                      "lat": [0.0, 45.0, -45.0]})
    )
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "lon": [10.0], "lat": [10.0]})
    )
    got = knn_join(pts, qs, k=3, level=8, ring=1).toPandas()
    assert len(got) == 3
    assert set(got["point_id"]) == {0, 1, 2}
    assert list(got.sort_values("rank")["point_id"]) == [0, 1, 2]


def test_haversine_known_value(spark):
    # Paris -> London ~ 343.5 km
    df = spark.createDataFrame([(2.3522, 48.8566, -0.1276, 51.5072)],
                               "lon1 double, lat1 double, lon2 double, lat2 double")
    d = df.select(
        haversine_col(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d")
    ).collect()[0]["d"]
    assert abs(d - 343_500) < 1_500
