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


def test_knn_polar_queries_match_bruteforce(spark):
    """Round-7 guard refinement: pole-reaching blocks used to get a
    ~0 m longitude-wall bound (cos(max|lat|) -> 0), so polar queries
    could never prove exact in round 1.  The latitude-split bound must
    stay a TRUE lower bound: polar-query results must still equal the
    haversine brute force exactly."""
    rng = np.random.default_rng(77)
    npts, k = 4000, 5
    lon = rng.uniform(-180, 180, npts)
    lat = rng.uniform(-89.5, 89.5, npts)
    qlon = np.array([-169.7, -156.0, 12.0, 179.0, 0.0])
    qlat = np.array([-79.8, -73.5, 84.2, -88.0, 87.9])
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(npts), "lon": lon, "lat": lat}))
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(len(qlon)), "lon": qlon,
                      "lat": qlat}))
    got = (
        knn_join(pts, qs, k=k, level=5, ring=1)
        .select("query_id", "point_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    R = 6371008.8
    p1 = np.radians(lat)[None, :]
    p2 = np.radians(qlat)[:, None]
    dphi = (p1 - p2) / 2
    dlam = (np.radians(lon)[None, :] - np.radians(qlon)[:, None]) / 2
    h = np.sin(dphi) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlam) ** 2
    dist = 2 * R * np.arcsin(np.minimum(1.0, np.sqrt(h)))
    assert len(got) == len(qlon) * k
    for qi in range(len(qlon)):
        order = np.lexsort((np.arange(npts), dist[qi]))
        want_ids = list(order[:k])
        got_ids = list(got[got["query_id"] == qi]["point_id"])
        assert got_ids == want_ids, f"polar query {qi}"


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


def _np_haversine(lon1, lat1, lon2, lat2):
    R = 6371008.8
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi = (p2 - p1) / 2
    dlam = (np.radians(lon2) - np.radians(lon1)) / 2
    h = np.sin(dphi) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlam) ** 2
    return 2 * R * np.arcsin(np.minimum(1.0, np.sqrt(h)))


def test_knn_guard_is_conservative_adversarial(spark):
    """The exactness guard must LOWER-bound the true distance to every
    point outside the ring block — probed at cell edges, high latitude,
    and across the antimeridian (the round-1 guard used a flat 111320
    m/deg and could overstate by ~0.1%)."""
    from proj_spark.operators.joins import _block_guard_col

    cases = [  # (lon, lat, level, ring)
        (179.999999, 0.000001, 16, 1),
        (-179.999999, 50.0000001, 16, 1),
        (11.25, 50.625, 5, 1),          # exactly on a level-5 cell corner
        (0.0, 89.0, 8, 1),              # near-pole, tiny cos(lat)
        (-122.4, 37.7, 12, 1),
        (10.0000001, 49.9999999, 16, 2),
        (45.0, -89.5, 10, 1),
    ]
    for lon, lat, level, ring in cases:
        df = spark.createDataFrame([(lon, lat)], "lon double, lat double")
        guard = df.select(
            _block_guard_col(F.col("lon"), F.col("lat"), level, ring).alias("g")
        ).collect()[0]["g"]
        # reconstruct the block and sample just-outside points densely
        n = 1 << level
        ix = min(max(math.floor((lon + 180.0) / 360.0 * n), 0), n - 1)
        iy = min(max(math.floor((lat + 90.0) / 180.0 * n), 0), n - 1)
        west = (ix - ring) * 360.0 / n - 180.0
        east = (ix + ring + 1) * 360.0 / n - 180.0
        south = (iy - ring) * 180.0 / n - 90.0
        north = (iy + ring + 1) * 180.0 / n - 90.0
        eps = 1e-9
        samples = []
        ts = np.linspace(0.0, 1.0, 4001)
        if south > -90.0:
            samples.append((west + ts * (east - west), np.full_like(ts, south - eps)))
        if north < 90.0:
            samples.append((west + ts * (east - west), np.full_like(ts, north + eps)))
        lat_lo, lat_hi = max(south, -90.0), min(north, 90.0)
        samples.append((np.full_like(ts, west - eps), lat_lo + ts * (lat_hi - lat_lo)))
        samples.append((np.full_like(ts, east + eps), lat_lo + ts * (lat_hi - lat_lo)))
        slon = np.concatenate([s[0] for s in samples])
        slat = np.clip(np.concatenate([s[1] for s in samples]), -90.0, 90.0)
        # wrap sampled lon into [-180, 180] (haversine is wrap-periodic)
        slon = (slon + 180.0) % 360.0 - 180.0
        true_min = _np_haversine(lon, lat, slon, slat).min()
        assert guard <= true_min + 1e-6, (
            f"guard {guard} exceeds true boundary distance {true_min} "
            f"at lon={lon} lat={lat} level={level} ring={ring}"
        )


def test_knn_antimeridian_wrap(spark):
    # nearest neighbors straddle the antimeridian: the candidate ring
    # must wrap in longitude and the result must stay exact
    rng = np.random.default_rng(13)
    lon = np.concatenate([rng.uniform(179.3, 180.0, 60),
                          rng.uniform(-180.0, -179.3, 60),
                          rng.uniform(-30, 30, 400)])
    lat = np.concatenate([rng.uniform(-5, 5, 120), rng.uniform(-60, 60, 400)])
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(len(lon)), "lon": lon, "lat": lat})
    )
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": [0, 1], "lon": [-179.95, 179.97],
                      "lat": [0.3, -0.2]})
    )
    got = (
        knn_join(pts, qs, k=7, level=7, ring=1)
        .select("query_id", "point_id", "rank")
        .toPandas().sort_values(["query_id", "rank"])
    )
    for qi, (qlo, qla) in enumerate([(-179.95, 0.3), (179.97, -0.2)]):
        d = _np_haversine(qlo, qla, lon, lat)
        want = list(np.lexsort((np.arange(len(lon)), d))[:7])
        assert list(got[got["query_id"] == qi]["point_id"]) == want


def test_knn_adaptive_level_and_two_phase_parity(spark):
    rng = np.random.default_rng(14)
    npts, nq, k = 2500, 30, 4
    lon = rng.uniform(-40, 40, npts)
    lat = rng.uniform(-40, 40, npts)
    qlon = rng.uniform(-35, 35, nq)
    qlat = rng.uniform(-35, 35, nq)
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(npts), "lon": lon, "lat": lat})
    ).repartition(8)
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(nq), "lon": qlon, "lat": qlat})
    )
    base = (
        knn_join(pts, qs, k=k)  # adaptive level
        .select("query_id", "point_id", "rank").toPandas()
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(base) == nq * k
    # exactness vs numpy brute force
    d = _np_haversine(qlon[:, None], qlat[:, None], lon[None, :], lat[None, :])
    for qi in range(nq):
        want = list(np.lexsort((np.arange(npts), d[qi]))[:k])
        assert list(base[base["query_id"] == qi]["point_id"]) == want
    # the two-phase (pre-reduced) top-k returns the identical result
    tp = (
        knn_join(pts, qs, k=k, two_phase=True)
        .select("query_id", "point_id", "rank").toPandas()
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert (tp["point_id"].values == base["point_id"].values).all()


def test_knn_near_pole_exact(spark):
    # cos(max|lat|) ~ 0 kills the longitude guard near the pole; the
    # operator must still return exact results via fallback
    rng = np.random.default_rng(15)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(85.0, 90.0, 300)
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(300), "lon": lon, "lat": lat})
    )
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "lon": [12.0], "lat": [89.9]})
    )
    got = knn_join(pts, qs, k=5, level=6, ring=1).toPandas()
    d = _np_haversine(12.0, 89.9, lon, lat)
    want = list(np.lexsort((np.arange(300), d))[:5])
    assert list(got.sort_values("rank")["point_id"]) == want


def test_pip_join_many_polygons_executor_side(spark):
    """10^5 polygons must expand to covering cells on executors (the
    round-1 driver-side toPandas+iterrows path stalls here)."""
    n_poly = 100_000
    polys = spark.range(n_poly).select(
        F.concat(F.lit("r"), F.col("id")).alias("poly_id"),
        F.expr(
            "array(array("
            "array((id % 3600) * 0.1 - 180.0, ((id * 7) % 1700) * 0.1 - 85.0),"
            "array((id % 3600) * 0.1 - 180.0 + 0.08, ((id * 7) % 1700) * 0.1 - 85.0),"
            "array((id % 3600) * 0.1 - 180.0 + 0.08, ((id * 7) % 1700) * 0.1 - 85.0 + 0.08),"
            "array((id % 3600) * 0.1 - 180.0, ((id * 7) % 1700) * 0.1 - 85.0 + 0.08),"
            "array((id % 3600) * 0.1 - 180.0, ((id * 7) % 1700) * 0.1 - 85.0)"
            "))"
        ).alias("rings"),
    )
    rng = np.random.default_rng(16)
    lon = rng.uniform(-180, 179.9, 400)
    lat = rng.uniform(-85, 84.9, 400)
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(400), "lon": lon, "lat": lat})
    )
    got = pip_join(pts, polys, level=8).select("point_id", "poly_id").toPandas()
    # numpy oracle: strict-interior test of each point against its rects
    ids = np.arange(n_poly)
    lon0 = (ids % 3600) * 0.1 - 180.0
    lat0 = ((ids * 7) % 1700) * 0.1 - 85.0
    inside = (
        (lon[:, None] > lon0[None, :]) & (lon[:, None] < lon0[None, :] + 0.08)
        & (lat[:, None] > lat0[None, :]) & (lat[:, None] < lat0[None, :] + 0.08)
    )
    want = {(int(p), f"r{int(r)}") for p, r in zip(*np.nonzero(inside))}
    assert {(int(r["point_id"]), r["poly_id"]) for _, r in got.iterrows()} == want


def test_haversine_known_value(spark):
    # Paris -> London ~ 343.5 km
    df = spark.createDataFrame([(2.3522, 48.8566, -0.1276, 51.5072)],
                               "lon1 double, lat1 double, lon2 double, lat2 double")
    d = df.select(
        haversine_col(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d")
    ).collect()[0]["d"]
    assert abs(d - 343_500) < 1_500


def test_with_cell_matches_cell_col(spark):
    # the chained-projection encoding is bit-for-bit the nested form
    rng = np.random.default_rng(17)
    pdf = pd.DataFrame({"lon": rng.uniform(-180, 180, 400),
                        "lat": rng.uniform(-90, 90, 400)})
    df = spark.createDataFrame(pdf)
    for level in (0, 3, 12, 26):
        a = C.with_cell(df, "lon", "lat", level, out="c").select("c").toPandas()
        b = df.select(C.cell_col(F.col("lon"), F.col("lat"), level).alias("c")).toPandas()
        assert (a["c"].values == b["c"].values).all(), level


def test_pip_join_left_and_empty_edges(spark):
    polys = spark.createDataFrame(pd.DataFrame([{
        "poly_id": "box",
        "rings": [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0],
                   [0.0, 0.0]]],
    }]))
    pts = spark.createDataFrame(pd.DataFrame({
        "point_id": [0, 1], "lon": [5.0, 50.0], "lat": [5.0, 5.0]}))
    left = pip_join(pts, polys, level=6, how="left").toPandas()
    byid = left.set_index("point_id")
    assert byid.loc[0, "poly_id"] == "box"
    assert pd.isna(byid.loc[1, "poly_id"])
    # empty polygon side: inner empty, left keeps all points with nulls
    empty = polys.limit(0)
    assert pip_join(pts, empty, level=6).count() == 0
    l2 = pip_join(pts, empty, level=6, how="left").toPandas()
    assert len(l2) == 2 and l2["poly_id"].isna().all()


def test_knn_join_empty_queries(spark):
    pts = spark.createDataFrame(pd.DataFrame({
        "point_id": [0, 1], "lon": [5.0, 50.0], "lat": [5.0, 5.0]}))
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": [], "lon": [], "lat": []}),
        schema="query_id long, lon double, lat double")
    assert knn_join(pts, qs, k=2, level=6).count() == 0


def test_pip_join_chunked_matches_unchunked(spark):
    # auto partition-and-union above the broadcast byte threshold must
    # be invisible in the results (inner, anti AND left)
    rng = np.random.default_rng(31)
    rows = []
    for i in range(60):
        cx, cy = rng.uniform(-50, 50), rng.uniform(-50, 50)
        rows.append({"poly_id": f"p{i}",
                     "rings": [_random_convex_polygon(rng, cx, cy, 3.0)]})
    polys = spark.createDataFrame(pd.DataFrame(rows))
    pts = spark.createDataFrame(pd.DataFrame({
        "point_id": np.arange(1500),
        "lon": rng.uniform(-55, 55, 1500),
        "lat": rng.uniform(-55, 55, 1500),
    }))

    def _set(df):
        return {(int(r["point_id"]), r["poly_id"])
                for r in df.select("point_id", "poly_id").collect()}

    one = _set(pip_join(pts, polys, level=6))
    # 60 polys x ~9 edges x 32 B ~ 17 kB -> a 2 kB cap forces ~9 chunks
    many = _set(pip_join(pts, polys, level=6, max_broadcast_bytes=2048))
    assert one == many and len(one) > 0
    left_many = pip_join(pts, polys, level=6, how="left",
                         max_broadcast_bytes=2048)
    matched = left_many.where(F.col("poly_id").isNotNull())
    assert _set(matched) == one
    anti_one = {int(r["point_id"]) for r in
                pip_anti_join(pts, polys, level=6).select("point_id").collect()}
    anti_many = {int(r["point_id"]) for r in
                 pip_anti_join(pts, polys, level=6, max_broadcast_bytes=2048)
                 .select("point_id").collect()}
    assert anti_one == anti_many


def test_radius_join_exact_vs_bruteforce(spark):
    """Range join exactness: identical pair set to the brute-force
    cross join at two radii, including polar and antimeridian query
    points (the ring bound must never drop an in-radius point)."""
    import numpy as np
    import pandas as pd

    from proj_spark.operators.joins import EARTH_RADIUS_M, radius_join

    rng = np.random.default_rng(5)
    pts = pd.DataFrame({"point_id": range(2500),
                        "lon": rng.uniform(-180, 180, 2500),
                        "lat": rng.uniform(-90, 90, 2500)})
    qs = pd.DataFrame({"query_id": range(8),
                       "lon": [0.0, 179.9, -179.9, 10.0, -60.0, 120.0,
                               0.0, 33.0],
                       "lat": [0.0, 45.0, -45.0, 88.5, -88.0, 30.0,
                               89.9, -89.9]})
    P, Q = spark.createDataFrame(pts), spark.createDataFrame(qs)
    la1 = np.radians(qs["lat"].to_numpy())[:, None]
    lo1 = np.radians(qs["lon"].to_numpy())[:, None]
    la2 = np.radians(pts["lat"].to_numpy())[None, :]
    lo2 = np.radians(pts["lon"].to_numpy())[None, :]
    h = (np.sin((la2 - la1) / 2) ** 2
         + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2) ** 2)
    d = 2 * EARTH_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(h)))
    for radius in (300_000.0, 1_500_000.0):
        got = radius_join(P, Q, radius).toPandas()
        want = {(q, p) for q in range(8) for p in range(2500)
                if d[q, p] <= radius}
        gotset = set(zip(got["query_id"].astype(int),
                         got["point_id"].astype(int)))
        assert gotset == want, radius
    # plan shape: the points side joins via a broadcast of the
    # exploded query rings — no shuffle of the big table
    plan = radius_join(P, Q, 300_000.0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_asof_join_matches_merge_asof(spark):
    """asof_join == pandas merge_asof (backward, inclusive), with and
    without tolerance, over the real events table."""
    import pandas as pd
    from pyspark.sql import functions as F

    from proj_spark.operators.events import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    right = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("err_id"))
    lp = ev.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts").rename(columns={"ts": "ts_r"})
    for tol_us, tol_pd in ((None, None), (60_000_000, pd.Timedelta("60s"))):
        out = asof_join(ev, right, by="user_id", right_cols=("err_id",),
                        tolerance_us=tol_us).toPandas()
        ref = pd.merge_asof(lp, rp, left_on="ts", right_on="ts_r",
                            by="user_id", direction="backward",
                            tolerance=tol_pd)
        g = out.sort_values("event_id").reset_index(drop=True)
        r = ref.sort_values("event_id").reset_index(drop=True)
        a = g["err_id_right"].astype("float64").fillna(-1).to_numpy()
        b = r["err_id"].astype("float64").fillna(-1).to_numpy()
        assert (g["event_id"].to_numpy() == r["event_id"].to_numpy()).all()
        assert (a == b).all(), tol_us
    # right-side tie dedup: two right rows at the same (user, ts) must
    # resolve to the max payload deterministically
    tie = spark.createDataFrame(pd.DataFrame([
        {"user_id": 1, "ts": pd.Timestamp("2024-01-01 10:00:00"),
         "err_id": 5},
        {"user_id": 1, "ts": pd.Timestamp("2024-01-01 10:00:00"),
         "err_id": 9},
    ]))
    left1 = spark.createDataFrame(pd.DataFrame([
        {"event_id": 100, "user_id": 1,
         "ts": pd.Timestamp("2024-01-01 11:00:00")}]))
    got = asof_join(left1, tie, by="user_id",
                    right_cols=("err_id",)).collect()[0]
    assert int(got["err_id_right"]) == 9


def test_radius_join_small_radius_near_pole(spark):
    """Code-review regression: the 89.99-deg clamp used to SHRINK the
    longitude ring for small radii near the poles — two points 180 deg
    apart in longitude but ~160 m apart across the pole must pair."""
    import numpy as np
    import pandas as pd

    from proj_spark.operators.joins import radius_join

    pts = pd.DataFrame({"point_id": [0, 1, 2],
                        "lon": [180.0, 0.0, 90.0],
                        "lat": [89.9995, 89.0, -89.9995]})
    qs = pd.DataFrame({"query_id": [0, 1],
                       "lon": [0.0, -90.0],
                       "lat": [89.999, -89.999]})
    out = radius_join(spark.createDataFrame(pts), spark.createDataFrame(qs),
                      1000.0).toPandas()
    got = set(zip(out["query_id"].astype(int), out["point_id"].astype(int)))
    assert (0, 0) in got   # across the north pole, dlon = 180
    assert (1, 2) in got   # across the south pole
    assert (0, 1) not in got  # ~111 km away


def test_radius_join_broadcast_guard_falls_back_to_shuffle(spark):
    """Round-4 ADVICE: an exploded query-ring set past the broadcast
    budget must fall back to a shuffle join (with a warning naming the
    cause) rather than broadcast unconditionally — and the result set
    must be identical on both plans."""
    import warnings

    import numpy as np
    import pandas as pd

    from proj_spark.operators.joins import radius_join

    rng = np.random.default_rng(11)
    pts = pd.DataFrame({"point_id": range(500),
                        "lon": rng.uniform(-10, 10, 500),
                        "lat": rng.uniform(-10, 10, 500)})
    qs = pd.DataFrame({"query_id": range(4),
                       "lon": [0.0, 1.0, 2.0, 3.0],
                       "lat": [0.0, 1.0, 2.0, 3.0]})
    P, Q = spark.createDataFrame(pts), spark.createDataFrame(qs)
    bc = radius_join(P, Q, 200_000.0)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        sh = radius_join(P, Q, 200_000.0, max_broadcast_rows=3)
    assert any("max_broadcast_rows" in str(w.message) for w in caught)
    # the FORCED broadcast hint is gone (AQE may still pick a broadcast
    # from real size stats — the guard only stops forcing one past the
    # driver budget); the hinted plan carries ResolvedHint, the
    # fallback must not
    assert "ResolvedHint" in bc._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in sh._jdf.queryExecution().analyzed().toString()
    a = {(r.query_id, r.point_id) for r in bc.collect()}
    b = {(r.query_id, r.point_id) for r in sh.collect()}
    assert a == b and len(a) > 0


def test_radius_join_broadcast_override_is_lazy(spark):
    """Round-6 ADVICE fix: broadcast_queries=True must not run ANY
    Spark action at plan-construction time (fully lazy composition);
    False forces the shuffle plan; both agree with the default plan."""
    import pandas as pd

    from proj_spark.operators.joins import radius_join

    pts = pd.DataFrame({"point_id": range(200),
                        "lon": [(i % 40) / 4.0 for i in range(200)],
                        "lat": [(i % 25) / 2.5 for i in range(200)]})
    qs = pd.DataFrame({"query_id": [0, 1],
                       "lon": [1.0, 5.0], "lat": [2.0, 6.0]})
    P, Q = spark.createDataFrame(pts), spark.createDataFrame(qs)

    # a queries side whose evaluation EXPLODES if anything touches it
    # at plan time: an action-at-construction would raise here
    from pyspark.sql import functions as F

    bomb = Q.withColumn(
        "lat", F.when(F.lit(True),
                      F.col("lat")).otherwise(F.raise_error("boom")))
    forced = radius_join(P, bomb, 150_000.0, broadcast_queries=True)
    assert "ResolvedHint" in forced._jdf.queryExecution().analyzed().toString()

    got_f = {(r.query_id, r.point_id)
             for r in radius_join(P, Q, 150_000.0,
                                  broadcast_queries=True).collect()}
    got_s = {(r.query_id, r.point_id)
             for r in radius_join(P, Q, 150_000.0,
                                  broadcast_queries=False).collect()}
    got_d = {(r.query_id, r.point_id)
             for r in radius_join(P, Q, 150_000.0).collect()}
    assert got_f == got_s == got_d and len(got_d) > 0
