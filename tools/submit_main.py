"""spark-submit entry point for the engine.

The cluster-real run path the north rule prescribes: ship
``dist/proj_spark.zip`` via ``--py-files``, let spark-submit own the
master/executor topology, run one engine query (or the flagship), and
write the result + a one-row metrics table.

    python tools/package_pyfiles.py
    spark-submit --master local[8] --py-files dist/proj_spark.zip \
        tools/submit_main.py --query q15_pip_join \
        --sf-dir /root/testdata/sf0.01 --out /tmp/out

No ``.master(...)`` is set here — on a real cluster the same command
line with ``--master yarn``/``k8s://...`` and ``--num-executors N``
runs unchanged at N and 4N executors (the scaling criterion's two
cluster sizes; local[] evidence in BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", default="entry",
                    help="queries() key, or 'entry' for the flagship")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True,
                    help="output directory (parquet result + metrics)")
    args = ap.parse_args()

    # import AFTER spark-submit has placed the --py-files zip on the
    # path: this is exactly what executors see
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (SparkSession.builder.appName(f"proj_spark:{args.query}")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    t0 = time.time()
    if args.query == "entry":
        df = E.entry(spark)
    else:
        df = E.queries()[args.query](spark, args.sf_dir)
    df.write.mode("overwrite").parquet(f"{args.out}/result")
    n = spark.read.parquet(f"{args.out}/result").count()
    wall = time.time() - t0
    metrics = {
        "query": args.query, "rows": n, "wall_s": round(wall, 3),
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "sf_dir": args.sf_dir,
    }
    (spark.createDataFrame([metrics])
     .coalesce(1).write.mode("overwrite").json(f"{args.out}/metrics"))
    print("METRICS " + json.dumps(metrics, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
