#!/usr/bin/env python
"""Print the README correctness-rotation ledger table: every declared
query → the round of its latest green CORRECTNESS_r{N}.json row, with
`*` marking the CURRENT gated prefix (first 50 entries of queries(),
whose fresh rows land in the next CORRECTNESS file). Three columns to
keep the table compact, filled column-major in queries() order."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as entry

    names = list(entry.queries().keys())
    latest: dict[str, str] = {}
    for n in range(1, 99):
        p = os.path.join(REPO, f"CORRECTNESS_r{n:02d}.json")
        if not os.path.exists(p):
            continue
        for q, row in json.load(open(p)).items():
            ok = row.get("hash_match") or (
                row.get("rows_match") and row.get("err") is None
            )
            if ok:
                latest[q] = f"r{n}"
    cells = []
    for i, q in enumerate(names):
        star = "*" if i < 50 else ""
        cells.append((q + star, latest.get(q, "none yet")))
    rows = (len(cells) + 2) // 3
    print("| query | green | query | green | query | green |")
    print("|---|---|---|---|---|---|")
    for r in range(rows):
        parts = []
        for c in range(3):
            i = c * rows + r
            parts.extend(cells[i] if i < len(cells) else ("", ""))
        print("| " + " | ".join(parts) + " |")


if __name__ == "__main__":
    main()
