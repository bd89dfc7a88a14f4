"""Structured Streaming: windowed tile counts with watermark,
exercised via Trigger.AvailableNow over a file source."""

import numpy as np
import pandas as pd

from proj_spark.streaming.stream_ops import run_available_now, stream_tile_counts


def test_stream_tile_counts(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "lon": rng.uniform(-170, 170, 400),
            "lat": rng.uniform(-80, 80, 400),
            "ts": pd.date_range("2024-01-01", periods=400, freq="s"),
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "lon double, lat double, ts timestamp"
    ).parquet(src)
    result = stream_tile_counts(stream, zoom=3, window="1 minute",
                                watermark="2 minutes")
    run_available_now(result, ckpt, table_name="t_out")
    out = spark.sql("SELECT * FROM t_out").toPandas()
    assert out["n_points"].sum() == 400
    # batch-equivalence: same tile assignment as the batch operator
    from proj_spark.operators.tiles import np_tile

    tx, ty = np_tile(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 3)
    batch = (
        pd.DataFrame({"tile_x": tx, "tile_y": ty, "m": pd.Series(pdf.ts).dt.floor("min")})
        .groupby(["m", "tile_x", "tile_y"]).size()
    )
    assert len(out) == len(batch)
