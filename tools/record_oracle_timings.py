#!/usr/bin/env python
"""Commit the oracle-suite per-query wall times as the trailing record.

tests/test_queries_oracle.py dumps its sf0.01 timings to
/tmp/oracle_timings.json on every run and warns when a query exceeds 3x
the committed trailing time (ORACLE_TIMINGS.json) — the correctness
suite's contamination canary. Run this after a clean (quiet-machine)
suite run to refresh the record:

    python -m pytest tests/test_queries_oracle.py -q   # quiet machine
    python tools/record_oracle_timings.py
"""

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/tmp/oracle_timings.json"
DST = os.path.join(REPO, "ORACLE_TIMINGS.json")


def main() -> None:
    if not os.path.exists(SRC):
        sys.exit(f"{SRC} not found — run tests/test_queries_oracle.py first")
    n = len(json.load(open(SRC)))
    shutil.copyfile(SRC, DST)
    print(f"recorded {n} query timings to {DST}")


if __name__ == "__main__":
    main()
