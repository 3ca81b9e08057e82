"""Same-JVM A/B of the r16-optimized operators against their HEAD (r15)
implementations (guide §1 — measure on the host you have; this round's
host shows 40-80 s intermittent stalls, so cross-session medians lie and
only alternating same-JVM runs are trustworthy).

Setup expected (see OPTIMIZATION_r16.md):
    mkdir -p /tmp/abold && git archive HEAD oracledb_datapump_spark \
      | tar -x -C /tmp/abold && mv /tmp/abold/oracledb_datapump_spark \
      /tmp/abold/odsp_old

Usage: python tools/ab_compare.py [--rounds N] spec [spec ...]
where spec = <query_name>:<module_path_relative_to_package>:<fn_name>
e.g. shapley_attribution:operators.pipeline63:shapley_attribution

Runs A(old), B(new) alternately N times each with bench.py's cache
discipline between runs, prints medians and the ratio.
"""

from __future__ import annotations

import argparse
import gc
import importlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/tmp/abold")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _clear(spark):
    spark.catalog.clearCache()
    gc.collect()
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        it.next().unpersist(False)
    spark.sparkContext._jvm.System.gc()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("specs", nargs="+")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from oracledb_datapump_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    spark = get_spark(
        app_name="datapump-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).count()
    for t in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    from oracledb_datapump_spark.events_source import load_events

    load_events(spark, SF_DIR).count()

    for spec in args.specs:
        qname, modpath, fname = spec.split(":")
        old_mod = importlib.import_module(f"odsp_old.{modpath}")
        new_mod = importlib.import_module(f"oracledb_datapump_spark.{modpath}")
        old_fn = getattr(old_mod, fname)
        new_fn = getattr(new_mod, fname)
        # one untimed warm-up of each arm (JIT/codegen parity)
        for fn in (old_fn, new_fn):
            _clear(spark)
            try:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            except Exception as exc:
                print(f"# {qname}: warm-up ERROR {exc}", file=sys.stderr)
        olds, news = [], []
        for _ in range(args.rounds):
            for fn, sink in ((old_fn, olds), (new_fn, news)):
                _clear(spark)
                spark.sparkContext.setJobDescription(
                    f"ab:{qname}:{'old' if sink is olds else 'new'}"
                )
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                sink.append(time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(None)
        olds.sort()
        news.sort()
        mo, mn = olds[len(olds) // 2], news[len(news) // 2]
        # on a stall-prone host the MIN is the cleanest paired statistic
        # (a stall can only inflate a sample); report both
        print(
            f"AB {qname}: old med {mo:.3f}s min {olds[0]:.3f}s"
            f" {[round(x, 2) for x in olds]} | new med {mn:.3f}s"
            f" min {news[0]:.3f}s {[round(x, 2) for x in news]}"
            f" | ratio med {mn / mo:.3f}x min {news[0] / olds[0]:.3f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
