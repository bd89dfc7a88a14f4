"""Structured Streaming surface.

The north rule is a batch-Iceberg pipeline (resumability comes from
checkpoints, SURVEY.md §2.2 streaming row), so streaming is a thin,
optional layer: the same JVM-side operators (cell index, tile
assignment) applied to a stream, with event-time windows + watermarks
for late data.  The transform UDFs and cell/tile Columns are
stateless, so they compose with ``readStream`` unchanged — that is the
point of keeping them declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cells import cell_col
from ..operators.tiles import tile_x_col, tile_y_col

__all__ = ["stream_tile_counts", "run_available_now"]


def stream_tile_counts(
    stream_df: DataFrame,
    zoom: int = 6,
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed per-tile event counts over a streaming point source.

    Watermark bounds state for late data; the tile columns are the same
    whole-stage-codegen expressions the batch path uses."""
    tiled = (
        stream_df.withWatermark(ts_col, watermark)
        .withColumn("tile_x", tile_x_col(F.col(lon_col), zoom))
        .withColumn("tile_y", tile_y_col(F.col(lat_col), zoom))
        .withColumn("cell", cell_col(F.col(lon_col), F.col(lat_col), min(zoom + 2, 26)))
    )
    return (
        tiled.groupBy(F.window(F.col(ts_col), window), "tile_x", "tile_y")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.approx_count_distinct("cell").alias("n_cells"),
        )
    )


def run_available_now(result: DataFrame, checkpoint_dir: str,
                      table_name: str = "stream_out",
                      output_mode: str = "complete"):
    """Drain all available input once (Trigger.AvailableNow) into an
    in-memory table — the batch-friendly way to exercise the streaming
    plan end-to-end; checkpointing gives exactly-once resume.

    complete mode emits every window (append would withhold windows
    younger than the watermark until a later trigger closes them)."""
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
