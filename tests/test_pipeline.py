"""Checkpoint/resume + lineage/metrics tests (north-rule resumability)."""

import json
import os

from pyspark.sql import functions as F

from proj_spark.plans.pipeline import CheckpointedPipeline


def _build(spark, root, counter):
    def stage_a(s, prev):
        counter["a"] += 1
        return s.range(100).withColumn("v", F.col("id") * 2)

    def stage_b(s, prev):
        counter["b"] += 1
        return prev.where(F.col("v") % 4 == 0)

    return (
        CheckpointedPipeline(spark, root, "test_pipe")
        .stage("gen", stage_a)
        .stage("filter", stage_b)
    )


def test_run_resume_and_lineage(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    counter = {"a": 0, "b": 0}
    p = _build(spark, root, counter)
    r1 = p.run()
    assert [s.skipped for s in r1] == [False, False]
    assert r1[0].rows == 100 and r1[1].rows == 50
    assert counter == {"a": 1, "b": 1}

    # resume: both stages complete -> both skipped, nothing recomputed
    p2 = _build(spark, root, counter)
    r2 = p2.run()
    assert [s.skipped for s in r2] == [True, True]
    assert counter == {"a": 1, "b": 1}
    assert r2[1].rows == 50

    # crash simulation: stage 2 lost its _SUCCESS -> only stage 2 reruns
    os.remove(f"{root}/test_pipe/filter/_SUCCESS.json")
    p3 = _build(spark, root, counter)
    r3 = p3.run()
    assert [s.skipped for s in r3] == [True, False]
    assert counter == {"a": 1, "b": 2}

    # lineage + per-partition metrics exist and add up
    lin = p3.lineage()
    assert [l["stage"] for l in lin] == ["gen", "filter"]
    assert lin[1]["input_stage"] == "gen"
    m = p3.metrics().toPandas()
    assert m[m["stage"] == "filter"]["rows"].sum() == 50


def test_no_resume_forces_rerun(spark, tmp_path):
    root = str(tmp_path / "ckpt2")
    counter = {"a": 0, "b": 0}
    _build(spark, root, counter).run()
    _build(spark, root, counter).run(resume=False)
    assert counter == {"a": 2, "b": 2}


def test_resume_with_uri_scheme_root(spark, tmp_path):
    # markers go through the Hadoop FileSystem API, so a scheme-qualified
    # root (the shape of an hdfs:// or s3a:// deploy) must work end-to-end
    from pyspark.sql import functions as F

    from proj_spark.plans.pipeline import CheckpointedPipeline

    root = f"file://{tmp_path}/ckpt_uri"

    def make(spark_, prev):
        return spark_.range(100).withColumn("v", F.col("id") * 2)

    def double(spark_, prev):
        return prev.withColumn("v", F.col("v") * 2)

    p1 = CheckpointedPipeline(spark, root, "uri_pipe")
    p1.stage("make", make).stage("double", double)
    r1 = p1.run()
    assert [s.skipped for s in r1] == [False, False]
    assert r1[-1].rows == 100

    # a second run resumes every stage through the same FS markers
    p2 = CheckpointedPipeline(spark, root, "uri_pipe")
    p2.stage("make", make).stage("double", double)
    r2 = p2.run()
    assert [s.skipped for s in r2] == [True, True]
    lineage = p2.lineage()
    assert len(lineage) == 2 and lineage[1]["stage"] == "double"
    assert p2.metrics().count() > 0
