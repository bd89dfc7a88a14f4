"""Extra benchmark driver for optimization work (guide §1.4): runs a
SUBSET of bench.py's op list (same session config, same fixtures, same
noop sink) with a configurable rep count, and optionally dumps each
op's ``explain("formatted")`` plan to a directory.

bench.py itself is FROZEN for measurement; this file exists so the
optimization loop can isolate one query at a time without touching it.

Usage:
    python bench_extra.py [--x10] [--reps N] [--plans DIR] [name ...]

With no names, runs every op.  Prints one JSON line
{"queries": {name: [samples...]}, "mode": "1x"|"x10"}.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

import bench


def main() -> None:
    args = sys.argv[1:]
    x10 = "--x10" in args
    n_reps = 2
    plan_dir = None
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--x10":
            continue
        elif a == "--reps":
            n_reps = int(next(it))
        elif a == "--plans":
            plan_dir = next(it)
        else:
            names.append(a)
    sel = set(names)

    samples: dict[str, list[float]] = {}

    real_sink = bench._sink

    def run_selected(ops, reps=None):
        ops = [o for o in ops if not sel or o[0] in sel]
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            for name, _rows, fn in ops:
                cap: list = []
                bench._sink = lambda df: cap.append(df)
                try:
                    fn()
                finally:
                    bench._sink = real_sink
                if cap:
                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        cap[0].explain("formatted")
                    suffix = "_x10" if x10 else ""
                    with open(os.path.join(
                            plan_dir, f"{name}{suffix}.txt"), "w") as f:
                        f.write(buf.getvalue())
        for name, _rows, fn in ops:
            bench.make_spark(bench.CPUS).sparkContext.setJobDescription(name)
            for _ in range(n_reps):
                t0 = time.time()
                fn()
                samples.setdefault(name, []).append(time.time() - t0)
        return {name: (s, 0) for name, s in samples.items()}

    bench._run_reps = run_selected
    spark = bench.make_spark(bench.CPUS)
    try:
        if x10:
            bench.bench_queries_x10(spark, bench.SF_DIR)
        else:
            bench.bench_queries(spark, bench.SF_DIR)
        print(json.dumps({
            "mode": "x10" if x10 else "1x",
            "queries": {k: [round(x, 3) for x in v]
                        for k, v in samples.items()},
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
