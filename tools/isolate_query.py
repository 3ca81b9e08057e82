"""Isolate one or more queries for optimization work (guide §1).

Usage:
    python tools/isolate_query.py [--runs N] [--plan-dir plans/r16]
        [--suffix before|after] [--no-time] <query> [<query> ...]

For each named query, in ONE fresh Spark session configured exactly like
bench.py (local[$SPARK_GRAFT_CPUS], shuffle partitions = cpus):

  * captures `.explain("formatted")` to <plan-dir>/<query>_<suffix>.txt
  * times N noop-sink executions (df.write.format("noop")) with the same
    cache-clearing discipline bench.py uses between queries, printing the
    median and spread — the guide §1.4 measurement, free of the sink.

This is a diagnosis tool; the driver contract stays with bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=os.path.join(REPO, "plans", "r16"))
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    from oracledb_datapump_spark.session import get_spark
    import __spark_entry__ as entry_mod

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    spark = get_spark(
        app_name="datapump-isolate",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    # same warm-up bench.py performs so timings are comparable
    spark.range(1000).count()
    for t in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    from oracledb_datapump_spark.events_source import load_events

    load_events(spark, SF_DIR).count()

    qs = entry_mod.queries()
    os.makedirs(args.plan_dir, exist_ok=True)
    import gc

    for name in args.queries:
        fn = qs[name]
        spark.catalog.clearCache()
        gc.collect()
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
        spark.sparkContext._jvm.System.gc()

        if not args.no_plan:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plan_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"# {name}: plan -> {path}", file=sys.stderr)
            # clear state the plan construction may have created
            spark.catalog.clearCache()
            it = jsc.getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(False)

        if args.no_time:
            continue
        samples = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"isolate: {name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        samples.sort()
        med = samples[len(samples) // 2]
        print(
            f"# {name}: {med:.3f}s noop median of {len(samples)}"
            f" (min {samples[0]:.3f}s, max {samples[-1]:.3f}s)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
