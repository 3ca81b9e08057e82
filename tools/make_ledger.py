#!/usr/bin/env python
"""Print the README correctness-rotation ledger table: every declared
query → the round of its latest green CORRECTNESS_r{N}.json row, with
`*` marking the CURRENT gated prefix (first 50 entries of queries(),
whose fresh rows land in the next CORRECTNESS file). Three columns to
keep the table compact, filled column-major in queries() order.

``--write`` splices the table into README.md in place (everything from
the ``| query | green |`` header to the last ``|`` row after it);
tests/test_ledger_fresh.py fails whenever the README copy drifts from
this script's output, so the ledger can no longer ship stale."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def green_rounds(exclude_rounds: set[int] | None = None) -> dict[str, str]:
    """query -> latest round with a green CORRECTNESS row ('rN')."""
    latest: dict[str, str] = {}
    for n in range(1, 99):
        if exclude_rounds and n in exclude_rounds:
            continue
        p = os.path.join(REPO, f"CORRECTNESS_r{n:02d}.json")
        if not os.path.exists(p):
            continue
        for q, row in json.load(open(p)).items():
            ok = row.get("hash_match") or (
                row.get("rows_match") and row.get("err") is None
            )
            if ok:
                latest[q] = f"r{n}"
    return latest


def render(exclude_rounds: set[int] | None = None) -> str:
    import __spark_entry__ as entry

    names = list(entry.queries().keys())
    latest = green_rounds(exclude_rounds)
    cells = []
    for i, q in enumerate(names):
        star = "*" if i < 50 else ""
        cells.append((q + star, latest.get(q, "none yet")))
    rows = (len(cells) + 2) // 3
    lines = ["| query | green | query | green | query | green |"]
    lines.append("|---|---|---|---|---|---|")
    for r in range(rows):
        parts = []
        for c in range(3):
            i = c * rows + r
            parts.extend(cells[i] if i < len(cells) else ("", ""))
        lines.append("| " + " | ".join(parts) + " |")
    return "\n".join(lines)


def write_readme(table: str) -> None:
    path = os.path.join(REPO, "README.md")
    text = open(path).read()
    start = text.index("| query | green |")
    end = start
    for line in text[start:].splitlines(keepends=True):
        if line.startswith("|"):
            end += len(line)
        else:
            break
    open(path, "w").write(text[:start] + table + "\n" + text[end:])


def check() -> bool:
    """True iff the README table equals render() for the working tree."""
    text = open(os.path.join(REPO, "README.md")).read()
    start = text.index("| query | green |")
    end = start
    for line in text[start:].splitlines(keepends=True):
        if line.startswith("|"):
            end += len(line)
        else:
            break
    return text[start:end].strip() == render().strip()


def main() -> None:
    if "--check" in sys.argv:
        if check():
            print("ledger fresh")
        else:
            print(
                "STALE LEDGER: README.md table != tools/make_ledger.py "
                "render(); run `python tools/make_ledger.py --write`",
                file=sys.stderr,
            )
            sys.exit(1)
        return
    table = render()
    if "--write" in sys.argv:
        write_readme(table)
        print("README.md ledger updated")
    else:
        print(table)


if __name__ == "__main__":
    main()
