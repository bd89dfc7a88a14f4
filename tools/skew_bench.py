"""Skew evidence for the two round-4 join operators (verdict ask #8).

Runs each join twice at the same row count — once with uniform keys,
once with a planted hot key — and reports the ratio:

  * asof_join: one user owns 10 % of a 5M-row events table (the by-key
    window's worst case: a single giant sort partition).
  * radius_join: 10 % of a 5M-point table packed inside one query's
    500 km disc (one ring-cell bucket owns 10 % of the probe side).

Usage: python tools/skew_bench.py [--rows N] -> one JSON line.
The kept number per variant is the steady-state best of 3 (host noise
protocol, see bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _sink, make_spark  # noqa: E402


def _best(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def gen_events(spark, n, users, hot_pct=0):
    """Deterministic events: id -> user round-robin; with hot_pct, that
    percentage of ALL rows is reassigned to user 0 (evenly over time,
    so the hot user's window is one long ordered run)."""
    from pyspark.sql import functions as F

    user = F.pmod(F.col("id"), F.lit(users))
    if hot_pct:
        user = F.when(F.pmod(F.col("id"), F.lit(100)) < hot_pct,
                      F.lit(0)).otherwise(user)
    return spark.range(0, n, 1, 64).select(
        F.col("id").alias("event_id"),
        user.alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + F.pmod(F.col("id") * 7919, F.lit(864000))
        ).alias("ts"),
        (F.pmod(F.col("id"), F.lit(13)) == 0).alias("is_err"),
    )


def run_asof(spark, n, users=100_000, hot_pct=0):
    from pyspark.sql import functions as F

    from proj_spark.operators.events import asof_join

    ev = gen_events(spark, n, users, hot_pct).cache()
    ev.count()
    errs = ev.where("is_err").select(
        "user_id", "ts", F.col("event_id").alias("err_id"))
    sec = _best(lambda: _sink(
        asof_join(ev, errs, by="user_id", right_cols=("err_id",))))
    ev.unpersist()
    return sec


# hot target: query 12 of the 25-query bench set (mid-latitude, so the
# 500 km disc is a normal-sized cell ring, not a polar cap)
_HOT_LON = -170.0 + 12 * 13.7 + 0.318
_HOT_LAT = -80.0 + 12 * 6.33 + 0.177


def gen_points(spark, n, hot_pct=0):
    """Uniform world points; with hot_pct, that percentage relocates
    to within ~2 deg of the hot query's centre (inside its 500 km
    disc), concentrating one ring-cell bucket."""
    from pyspark.sql import functions as F

    lon_u = F.expr("(id % 3600000) * 1e-4 - 180.0 + 0.00005")
    lat_u = F.expr("(id % 1700000) * 1e-4 - 85.0 + 0.00005")
    if hot_pct:
        is_hot = F.pmod(F.col("id"), F.lit(100)) < hot_pct
        lon = F.when(is_hot, F.lit(_HOT_LON - 2.0)
                     + F.expr("(id % 40000) * 1e-4")).otherwise(lon_u)
        lat = F.when(is_hot, F.lit(_HOT_LAT - 2.0)
                     + F.expr("(id % 40000) * 1e-4")).otherwise(lat_u)
    else:
        lon, lat = lon_u, lat_u
    return spark.range(0, n, 1, 64).select(
        F.col("id").alias("point_id"),
        lon.alias("lon"), lat.alias("lat"))


def run_radius(spark, n, hot_pct=0):
    import pandas as pd

    from proj_spark.operators.joins import radius_join

    qs = spark.createDataFrame(pd.DataFrame({
        "query_id": list(range(25)),
        "lon": [-170.0 + i * 13.7 + 0.318 for i in range(25)],
        "lat": [-80.0 + i * 6.33 + 0.177 for i in range(25)],
    }))
    pts = gen_points(spark, n, hot_pct).cache()
    pts.count()
    sec = _best(lambda: _sink(
        radius_join(pts, qs, 500_000.0, point_id_col="point_id")))
    pts.unpersist()
    return sec


def main():
    n = int(os.environ.get("SPARK_GRAFT_SKEW_ROWS", 5_000_000))
    spark = make_spark(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        out = {"rows": n}
        # warm pass at full size (JIT + first-touch pages)
        run_asof(spark, n)
        out["asof_uniform_sec"] = run_asof(spark, n, hot_pct=0)
        out["asof_hot10_sec"] = run_asof(spark, n, hot_pct=10)
        out["asof_ratio"] = round(
            out["asof_hot10_sec"] / out["asof_uniform_sec"], 3)
        run_radius(spark, n)
        out["radius_uniform_sec"] = run_radius(spark, n, hot_pct=0)
        out["radius_hot10_sec"] = run_radius(spark, n, hot_pct=10)
        out["radius_ratio"] = round(
            out["radius_hot10_sec"] / out["radius_uniform_sec"], 3)
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in out.items()}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
