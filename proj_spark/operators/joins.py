"""Distributed spatial joins: point-in-polygon, kNN, cell equi-join.

The reference is a scalar transform library with NO relational
operators (SURVEY.md §2.2) — this module is the distributed layer the
north rule adds (BASELINE.json:14): cell-indexed joins with explicit
broadcast/partitioning/skew decisions.

Scale design (10^12-point table, 1000 executors):
  * polygons / query points are the SMALL side -> always broadcast;
    the big point table is never shuffled for PIP.
  * candidate pruning is a JVM-side equi-join on the cell column —
    predicate-pushdown friendly and AQE-skew-splittable.
  * the exact geometric test runs vectorized per Arrow batch, grouped
    in-batch by polygon id (no per-row Python; input_hint contract).
  * kNN correctness is guaranteed by a distance bound: a query's top-k
    from ring-r candidates is provably exact when its kth distance is
    below a conservative lower bound of the distance to the ring
    boundary; unguaranteed queries (rare) fall back to a broadcast
    brute-force pass, keeping the operator exact at any density.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from .cells import cell_col, cell_ring_col, np_cell, np_cell_ring

__all__ = [
    "EARTH_RADIUS_M",
    "haversine_col",
    "pip_join",
    "knn_join",
    "cell_equi_join",
    "pip_anti_join",
]

EARTH_RADIUS_M = 6371008.8  # mean Earth radius (IUGG)

# conservative per-degree meters (lower bounds) for the kNN guarantee
_MIN_M_PER_DEG_LAT = 110567.0


def haversine_col(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters — pure JVM Column math so the
    kNN hot path stays in whole-stage codegen."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = (p2 - p1) / F.lit(2.0)
    dlam = (F.radians(lon2) - F.radians(lon1)) / F.lit(2.0)
    h = F.sin(dphi) * F.sin(dphi) + F.cos(p1) * F.cos(p2) * F.sin(dlam) * F.sin(dlam)
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.least(F.lit(1.0), F.sqrt(h)))


# ---------------------------------------------------------------------------
# point-in-polygon
# ---------------------------------------------------------------------------
def _np_point_in_rings(px: np.ndarray, py: np.ndarray, rings) -> np.ndarray:
    """Vectorized even-odd ray cast over all rings (holes flip parity).

    Geometry model mirrors the reference's polygon = exterior ring +
    interior rings, each a closed LineString
    (/root/reference/src/geo_types.rs:170-186).
    """
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        pts = np.array([np.asarray(p, dtype=np.float64) for p in ring])
        if len(pts) < 3:
            continue
        x1, y1 = pts[:-1, 0], pts[:-1, 1]
        x2, y2 = pts[1:, 0], pts[1:, 1]
        # edges x points: (E, N) via broadcasting
        py_ = py[None, :]
        px_ = px[None, :]
        cond = (y1[:, None] > py_) != (y2[:, None] > py_)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1)[:, None] * (py_ - y1[:, None]) / (y2 - y1)[:, None] + x1[:, None]
        crossed = cond & (px_ < xint)
        inside ^= (crossed.sum(axis=0) % 2).astype(bool)
    return inside


def _make_pip_test_udf():
    """Exact containment test, vectorized per polygon group WITHIN each
    Arrow batch (one numpy ray-cast per (polygon, batch), never per
    row).  Built lazily: pandas_udf return-type parsing needs an active
    session."""

    @pandas_udf("boolean")
    def _pip_test_udf(lon: pd.Series, lat: pd.Series, poly_id: pd.Series,
                      rings: pd.Series) -> pd.Series:
        out = np.zeros(len(lon), dtype=bool)
        px = lon.to_numpy(dtype=np.float64)
        py = lat.to_numpy(dtype=np.float64)
        groups = pd.Series(range(len(poly_id))).groupby(poly_id.values).groups
        for _pid, idx in groups.items():
            ii = np.asarray(idx)
            r = rings.iloc[ii[0]]
            out[ii] = _np_point_in_rings(px[ii], py[ii], r)
        return pd.Series(out)

    return _pip_test_udf


def _poly_covering_cells(polys_pdf: pd.DataFrame, level: int,
                         rings_col: str) -> pd.DataFrame:
    """Driver-side: bbox-covering cells per polygon (polygons are the
    small/broadcast side; this never touches the big table)."""
    rows = []
    n = 1 << level
    for _, row in polys_pdf.iterrows():
        rings = row[rings_col]
        ext = np.array([np.asarray(p, dtype=np.float64) for p in rings[0]])
        lon0, lat0 = ext[:, 0].min(), ext[:, 1].min()
        lon1, lat1 = ext[:, 0].max(), ext[:, 1].max()
        ix0 = int(np.clip(math.floor((lon0 + 180.0) / 360.0 * n), 0, n - 1))
        ix1 = int(np.clip(math.floor((lon1 + 180.0) / 360.0 * n), 0, n - 1))
        iy0 = int(np.clip(math.floor((lat0 + 90.0) / 180.0 * n), 0, n - 1))
        iy1 = int(np.clip(math.floor((lat1 + 90.0) / 180.0 * n), 0, n - 1))
        cells = set()
        for ix in range(ix0, ix1 + 1):
            for iy in range(iy0, iy1 + 1):
                lon_c = (ix + 0.5) / n * 360.0 - 180.0
                lat_c = (iy + 0.5) / n * 180.0 - 90.0
                cells.add(int(np_cell(lon_c, lat_c, level)))
        d = row.to_dict()
        for c in cells:
            rows.append({**d, "cell": c})
    return pd.DataFrame(rows)


def pip_join(
    points: DataFrame,
    polys: DataFrame,
    level: int = 8,
    lon_col: str = "lon",
    lat_col: str = "lat",
    poly_id_col: str = "poly_id",
    rings_col: str = "rings",
    how: str = "inner",
) -> DataFrame:
    """Point-in-polygon join.

    Plan shape: big side gets a JVM-computed cell column; small side is
    expanded to (polygon x covering-cell) rows on the driver and
    BROADCAST; equi-join on cell prunes candidates; an Arrow-batched
    even-odd test keeps exact hits.  The big table is never shuffled.

    ``how``: "inner" (default) or "left" (unmatched points kept with
    null poly_id).
    """
    spark = points.sparkSession
    polys_pdf = polys.toPandas()
    cov = _poly_covering_cells(polys_pdf, level, rings_col)
    if cov.empty:
        if how == "left":
            return points.withColumn(poly_id_col, F.lit(None).cast("string"))
        return points.limit(0).withColumn(poly_id_col, F.lit(None).cast("string"))
    cov_sdf = spark.createDataFrame(cov[[poly_id_col, rings_col, "cell"]])

    pts = points.withColumn("cell", cell_col(F.col(lon_col), F.col(lat_col), level))
    cand = pts.join(F.broadcast(cov_sdf), "cell", "inner")
    pip_test = _make_pip_test_udf()
    hits = cand.where(
        pip_test(F.col(lon_col), F.col(lat_col),
                 F.col(poly_id_col), F.col(rings_col))
    ).drop(rings_col)
    if how == "inner":
        return hits
    if how == "left":
        matched = hits.select(*points.columns, poly_id_col)
        unmatched = points.join(
            hits.select(*points.columns).distinct(), points.columns, "left_anti"
        ).withColumn(poly_id_col, F.lit(None).cast("string"))
        return matched.unionByName(unmatched)
    raise ValueError(f"unsupported how={how!r}")


def pip_anti_join(points: DataFrame, polys: DataFrame, **kwargs) -> DataFrame:
    """Points contained in NO polygon (set-ops coverage, SURVEY.md §2.2):
    candidate-prune + exact test, then LEFT ANTI against the hits."""
    hits = pip_join(points, polys, how="inner", **kwargs)
    key_cols = [c for c in points.columns]
    return points.join(hits.select(*key_cols).distinct(), key_cols, "left_anti")


def cell_equi_join(
    left: DataFrame, right: DataFrame, level: int,
    lon_col: str = "lon", lat_col: str = "lat",
    broadcast_right: bool = True,
) -> DataFrame:
    """Co-locate two point sets by shared cell id (the basic spatial
    equi-join; broadcast the small side, else shuffle-hash on cell)."""
    l = left.withColumn("cell", cell_col(F.col(lon_col), F.col(lat_col), level))
    r = right.withColumn("cell", cell_col(F.col(lon_col), F.col(lat_col), level))
    r = F.broadcast(r) if broadcast_right else r
    return l.join(r, "cell")


# ---------------------------------------------------------------------------
# kNN via cell-ring expansion
# ---------------------------------------------------------------------------
def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    level: int = 6,
    ring: int = 1,
    lon_col: str = "lon",
    lat_col: str = "lat",
    point_id_col: str = "point_id",
    query_id_col: str = "query_id",
    exact_fallback: bool = True,
) -> DataFrame:
    """k nearest points for every query point (great-circle meters).

    Phase 1: queries (small side) explode their ring-r candidate cells
    (JVM bit math) and BROADCAST; equi-join on the big table's cell
    column; per-query window top-k — shuffle only on query_id, with
    candidate counts bounded by ring size x local density.

    Phase 2 (exactness): a query's result is provably exact iff it has
    k hits and its kth distance <= a conservative lower bound of the
    distance from the query to its ring-block boundary.  Queries
    failing the bound rerun brute-force against the full point table
    (broadcast of the failing queries only).  The operator is exact at
    any density while the fast path does ~(2r+1)^2 cells of work.

    Output: query columns + point_id + dist_m + rank (1..k).
    """
    # ring expansion runs on the SMALL (query) side only; a numpy UDF is
    # used instead of Column bit math because the compact->re-spread
    # Column expression tree grows ~32x per nesting level and Catalyst
    # analysis of the (2r+1)^2 ring expressions dominates runtime
    @pandas_udf("array<long>")
    def _ring_udf(cell: pd.Series) -> pd.Series:
        arr = np_cell_ring(cell.to_numpy(np.int64), ring)
        return pd.Series([row[row >= 0].tolist() for row in arr])

    q = queries.withColumn("cell0", cell_col(F.col(lon_col), F.col(lat_col), level))
    q = q.withColumn("cand_cell", F.explode(_ring_udf(F.col("cell0"))))
    q = q.select(
        F.col(query_id_col),
        F.col(lon_col).alias("q_lon"),
        F.col(lat_col).alias("q_lat"),
        "cand_cell",
    )

    pts = points.withColumn("cell", cell_col(F.col(lon_col), F.col(lat_col), level))
    cand = pts.join(F.broadcast(q), pts["cell"] == q["cand_cell"], "inner")
    cand = cand.withColumn(
        "dist_m",
        haversine_col(F.col(lon_col), F.col(lat_col), F.col("q_lon"), F.col("q_lat")),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("dist_m").asc(),
                                                 F.col(point_id_col).asc())
    topk = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "q_lon", "q_lat", point_id_col, "dist_m", "rank")
    )
    if not exact_fallback:
        return topk
    # the fast-path result feeds three consumers (stats, anti-join,
    # union); checkpoint it so the candidate join runs once
    topk = topk.localCheckpoint(eager=False)

    # -- exactness guarantee ------------------------------------------
    # lower bound of distance from query to ring-block boundary
    n = 1 << level
    cell_h_deg = 180.0 / n
    # block extends `ring` whole cells beyond the query's own cell in
    # each direction; distance to boundary >= ring * cell_size - 0 but
    # the query can sit at its cell edge, so use (ring) cells minus the
    # in-cell offset; conservative: (ring) * cell_size * margin where
    # margin accounts for worst in-cell position => use (ring)*size -
    # size = (ring-1)*size when ring>=1 ... compute exactly instead:
    qa = queries.select(
        F.col(query_id_col),
        F.col(lon_col).alias("q_lon"),
        F.col(lat_col).alias("q_lat"),
    )
    ix = F.floor((F.col("q_lon") + 180.0) / 360.0 * n)
    iy = F.floor((F.col("q_lat") + 90.0) / 180.0 * n)
    west = (ix - ring) * F.lit(360.0 / n) - 180.0
    east = (ix + ring + 1) * F.lit(360.0 / n) - 180.0
    south = (iy - ring) * F.lit(180.0 / n) - 90.0
    north = (iy + ring + 1) * F.lit(180.0 / n) - 90.0
    # meters lower bounds: meridian scale for lat; parallel scale at the
    # widest |lat| in the block for lon
    max_abs_lat = F.greatest(F.abs(south), F.abs(north))
    m_per_deg_lon = F.lit(111320.0) * F.cos(F.radians(F.least(max_abs_lat, F.lit(89.9999))))
    guard = F.least(
        (F.col("q_lat") - south) * _MIN_M_PER_DEG_LAT,
        (north - F.col("q_lat")) * _MIN_M_PER_DEG_LAT,
        (F.col("q_lon") - west) * m_per_deg_lon,
        (east - F.col("q_lon")) * m_per_deg_lon,
    )
    qa = qa.withColumn("guard_m", guard)

    stats = topk.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("n_hits"), F.max("dist_m").alias("kth_dist")
    )
    bad = (
        qa.join(stats, query_id_col, "left")
        .where(
            F.col("n_hits").isNull()
            | (F.col("n_hits") < k)
            | (F.col("kth_dist") > F.col("guard_m"))
        )
        .select(query_id_col, "q_lon", "q_lat")
    )
    # broadcast brute-force pass for the (rare) unguaranteed queries
    brute = points.crossJoin(F.broadcast(bad))
    brute = brute.withColumn(
        "dist_m",
        haversine_col(F.col(lon_col), F.col(lat_col), F.col("q_lon"), F.col("q_lat")),
    )
    brute_topk = (
        brute.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "q_lon", "q_lat", point_id_col, "dist_m", "rank")
    )
    good_topk = topk.join(F.broadcast(bad.select(query_id_col)), query_id_col, "left_anti")
    return good_topk.unionByName(brute_topk)
