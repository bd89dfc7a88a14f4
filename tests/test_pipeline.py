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


def test_image_pipeline_end_to_end_resumable(spark, tmp_path):
    """The north rule's literal sentence: an IMAGE pipeline
    (ingest -> decode+verify gate -> resize -> per-tile rollup) through
    the checkpointed runner — per-partition lineage + metrics tables,
    crash-resume recomputes only the lost stage, and the binary image
    column survives parquet checkpoints intact."""
    from pyspark.sql import functions as F

    from proj_spark.operators import tiles as T
    from proj_spark.sources.datagen import synthesize_images
    from proj_spark.sources.media import resize_images

    root = str(tmp_path / "ickpt")
    counter = {"ingest": 0, "resize": 0, "rollup": 0}

    def build():
        def ingest(s, prev):
            counter["ingest"] += 1
            return synthesize_images(s, 120, partitions=4)

        def resize(s, prev):
            counter["resize"] += 1
            return resize_images(prev, 16, 12)

        def rollup(s, prev):
            counter["rollup"] += 1
            # re-join image geo coords (pure function of image_id
            # sequence) for tile assignment of the resized payload
            src = synthesize_images(s, 120, partitions=4).select(
                "image_id", "lon", "lat")
            with_geo = prev.join(src, "image_id")
            return T.tile_rollup(T.with_tiles(with_geo, zoom=4))

        return (
            CheckpointedPipeline(spark, root, "img_pipe")
            .stage("ingest", ingest)
            .stage("resize", resize)
            .stage("rollup", rollup)
        )

    r1 = build().run()
    assert [s.skipped for s in r1] == [False, False, False]
    assert r1[0].rows == 120 and r1[1].rows == 120
    assert counter == {"ingest": 1, "resize": 1, "rollup": 1}

    # the checkpointed binary column decodes to the resized raster
    from proj_spark.sources.images import decode_image

    mid = spark.read.parquet(f"{root}/img_pipe/resize/data")
    row = mid.orderBy("image_id").limit(1).collect()[0]
    arr = decode_image(bytes(row.bytes), row.fmt)
    assert arr.shape[:2] == (12, 16) and row.phash is not None

    # crash: rollup loses its marker; only rollup reruns
    os.remove(f"{root}/img_pipe/rollup/_SUCCESS.json")
    r2 = build().run()
    assert [s.skipped for s in r2] == [True, True, False]
    assert counter == {"ingest": 1, "resize": 1, "rollup": 2}

    p = build()
    p.run()
    lin = p.lineage()
    assert [l["stage"] for l in lin] == ["ingest", "resize", "rollup"]
    m = p.metrics().toPandas()
    assert m[m["stage"] == "resize"]["rows"].sum() == 120
