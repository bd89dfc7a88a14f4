"""Explicit partitioning / salting operators (north-rule knobs)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from proj_spark.operators.cells import np_cell
from proj_spark.plans.partitioning import (
    explode_salts,
    repartition_by_cell_range,
    salt_hot_keys,
    skewed_cell_counts,
)


def _pts(spark, n=4000, hot_frac=0.5, seed=5):
    rng = np.random.default_rng(seed)
    n_hot = int(n * hot_frac)
    lon = np.concatenate([np.full(n_hot, 10.001), rng.uniform(-170, 170, n - n_hot)])
    lat = np.concatenate([np.full(n_hot, 50.001), rng.uniform(-80, 80, n - n_hot)])
    cell = np_cell(lon, lat, 8)
    return spark.createDataFrame(
        pd.DataFrame({"pid": np.arange(n), "lon": lon, "lat": lat, "cell": cell})
    )


def test_repartition_by_cell_range_locality(spark):
    df = repartition_by_cell_range(_pts(spark), 8, "cell", level=8, prefix_level=4)
    parts = (
        df.withColumn("p", F.spark_partition_id())
        .groupBy("p").agg(F.min("cell").alias("lo"), F.max("cell").alias("hi"),
                          F.count(F.lit(1)).alias("n"))
        .orderBy("lo").toPandas()
    )
    # ranges are (mostly) non-overlapping: each partition's min is >= the
    # previous partition's max at the prefix level
    prev_hi = None
    for _, row in parts.iterrows():
        if prev_hi is not None:
            assert row["lo"] >> 13 >= prev_hi >> 13  # compare at coarse prefix
        prev_hi = row["hi"]
    assert parts["n"].sum() == 4000


def test_salted_join_exactness(spark):
    big = _pts(spark, n=3000, hot_frac=0.6)
    # small side: one payload row per distinct cell
    small = big.select("cell").distinct().withColumn(
        "payload", F.col("cell") % 97
    )
    n_salts = 8
    b = salt_hot_keys(big, "cell", n_salts, row_col="pid")
    s = explode_salts(small, "cell", n_salts)
    salted = b.join(s.drop("cell"), "salted_key").select("pid", "payload")
    plain = big.join(small, "cell").select("pid", "payload")
    a = salted.orderBy("pid").toPandas()
    e = plain.orderBy("pid").toPandas()
    assert len(a) == len(e) == 3000
    assert (a["payload"].values == e["payload"].values).all()
    # the PLANTED HOT CELL's rows spread over (nearly) all salts — the
    # round-1 salt was a pure function of the key and left every hot row
    # on one reducer
    hot_cell = int(np_cell(10.001, 50.001, 8))
    hot_salts = (
        b.where(F.col("cell") == hot_cell)
        .select(F.col("salted_key.s")).distinct().count()
    )
    assert hot_salts >= n_salts - 2


def test_salt_nondeterministic_fallback_still_exact(spark):
    # without row_col the salt uses a per-row nondeterministic id; the
    # join must still be exact because the small side carries ALL salts
    big = _pts(spark, n=1000, hot_frac=0.6)
    small = big.select("cell").distinct().withColumn("payload", F.col("cell") % 97)
    b = salt_hot_keys(big, "cell", 4)
    s = explode_salts(small, "cell", 4)
    n = b.join(s.drop("cell"), "salted_key").count()
    assert n == 1000


def test_skew_diagnostic(spark):
    top = skewed_cell_counts(_pts(spark), top=3).toPandas()
    assert top.iloc[0]["share"] > 0.4  # the planted hot cell dominates


def test_skew_diagnostic_single_pass(spark):
    # the share denominator is a window-sum over the grouped frame, not
    # a separate df.count() ACTION: construction must be fully lazy
    # (the round-2 form ran a count job before returning the DataFrame)
    df = _pts(spark)
    spark.sparkContext.setJobGroup("skew_lazy", "skew_lazy")
    try:
        out = skewed_cell_counts(df, top=3)
        st = spark.sparkContext.statusTracker()
        assert list(st.getJobIdsForGroup("skew_lazy")) == []
        pdf = out.toPandas()
    finally:
        spark.sparkContext.setJobGroup(None, None)
    # shares are exact fractions of the total row count
    total = df.count()
    counts = (
        df.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc()).limit(3).toPandas()
    )
    assert list(pdf["n"]) == list(counts["n"])
    assert np.allclose(pdf["share"], pdf["n"] / total)
