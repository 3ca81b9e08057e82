"""One-off scan: which queries() plans contain a Window fed by
Exchange SinglePartition? Used to seed/audit the exemption table in
tests/test_plan_contracts.py (contract 3). Prints one line per
offending query with the count of flagged windows.
"""

import re
import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

_PREFIX = re.compile(r"^[\s:+|-]*")


def single_partition_windows(plan: str) -> int:
    """Count Window nodes whose nearest downstream Exchange (first
    Exchange in their subtree) is SinglePartition — the global-sort
    pattern that funnels the window's whole input through one task."""
    lines = plan.splitlines()
    depths = []
    for ln in lines:
        p = _PREFIX.match(ln).group(0)
        depths.append(len(p) // 3)
    n = 0
    for i, ln in enumerate(lines):
        node = ln[len(_PREFIX.match(ln).group(0)) :]
        if not node.startswith("Window "):
            continue
        d = depths[i]
        for j in range(i + 1, len(lines)):
            if depths[j] <= d:
                break
            sub = lines[j][len(_PREFIX.match(lines[j]).group(0)) :]
            if sub.startswith("Exchange "):
                if "Exchange SinglePartition" in sub:
                    n += 1
                break
    return n


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    hits = {}
    for name, fn in sorted(entry_mod.queries().items()):
        spark.catalog.clearCache()
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"PLANFAIL {name}: {exc}", flush=True)
            continue
        c = single_partition_windows(plan)
        if c:
            hits[name] = c
            print(f"HIT {name}: {c}", flush=True)
    print("TOTAL", len(hits))
    print(dict(sorted(hits.items())))


if __name__ == "__main__":
    main()
