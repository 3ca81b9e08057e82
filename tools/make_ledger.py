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



LEGEND_BEGIN = "<!-- ledger-legend:begin -->"
LEGEND_END = "<!-- ledger-legend:end -->"


def legend() -> str:
    """Current-round `*` legend, emitted by this script alongside the
    table so it can never go stale (the round-14 verdict caught the
    README still describing the round-8 prefix six rounds later)."""
    import re

    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    m = re.search(r"GATED_PREFIX = \[(.*?)\]", src, re.S)
    block = m.group(1)
    comment = "\n".join(
        ln.strip().lstrip("# ")
        for ln in block.splitlines()
        if ln.strip().startswith("#")
    )
    return (
        "`*` = in the CURRENT gated prefix "
        "(`__spark_entry__.GATED_PREFIX`, the first 50 `queries()` "
        "entries, whose fresh rows land in the next "
        "`CORRECTNESS_r{N}.json`). Prefix rationale, quoted from the "
        "source comment:\n\n> " + comment.replace("\n", "\n> ")
    )


def splice_legend(text: str) -> str:
    start = text.index(LEGEND_BEGIN) + len(LEGEND_BEGIN)
    end = text.index(LEGEND_END)
    return text[: start] + "\n" + legend() + "\n" + text[end:]


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
    out = text[:start] + table + "\n" + text[end:]
    out = splice_legend(out)
    open(path, "w").write(out)


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
    if text[start:end].strip() != render().strip():
        return False
    lb = text.index(LEGEND_BEGIN) + len(LEGEND_BEGIN)
    le = text.index(LEGEND_END)
    return text[lb:le].strip() == legend().strip()


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
