#!/usr/bin/env python
"""Regenerate BASELINE-QUERIES.md: per-query best-known bench median.

Sources, in order of reliability:
- BENCH_FULL.json (written by bench.py since round 6): complete medians.
- BENCH_r{N}.json driver captures (r1-r5): tail-truncated stdout. The old
  JSON line ordered {.., "queries": {..}, .., "spread": {..}, ..}, so the
  tail keeps the END: everything BEFORE the literal '"spread": {' marker
  belongs to the queries (median) dict; pairs after it are spreads and
  must NOT be read as medians. Queries whose median fell off the front of
  the tail are simply absent from that round's evidence (honest gap).

Usage: python tools/make_baseline_queries.py [--merge BENCH_FULL.json r6]
Writes BASELINE-QUERIES.md at the repo root. Existing entries only
improve (a new median replaces the old only if strictly smaller).
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

META = {"metric", "value", "unit", "sf", "runs_per_query", "n", "rc", "cpus", "batches"}


def medians_from_tail(path: str) -> dict[str, float]:
    """Extract ONLY provably-median pairs from a tail-truncated capture.

    A bare name:value pair in a 2000-char tail is ambiguous — it can sit
    inside the queries (median) dict OR the spread (max−min) dict, and a
    spread read as a median fabricates a 10×-too-fast baseline (this
    exact artifact produced the phantom r4→r5 "1.5× drift" AND a set of
    impossible r05 "bests" like simhash at 0.092s — that value is a
    spread). Rules:
    - '"queries": {' visible → pairs after it, up to the dict's closing
      brace, are medians (r1/r2 old format with queries near the end,
      and the round-6+ format that prints queries last).
    - else '"spread": {' visible → pairs BEFORE it are the end of the
      queries dict (r4).
    - else → nothing is provable (r3's tail is a stack trace; r5's tail
      sits entirely inside the spread dict): contribute NOTHING."""
    tail = json.load(open(path)).get("tail", "")
    qi = tail.find('"queries": {')
    if qi >= 0:
        seg = tail[qi + len('"queries": {') :]
        end = seg.find("}")
        if end >= 0:
            seg = seg[:end]
    elif '"spread": {' in tail:
        seg = tail.split('"spread": {')[0]
    else:
        return {}
    out: dict[str, float] = {}
    for k, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', seg):
        if k not in META:
            out[k] = float(v)
    return out


def medians_from_full(path: str) -> dict[str, float]:
    return dict(json.load(open(path)).get("queries", {}))


def main() -> None:
    best: dict[str, tuple[float, str]] = {}

    def absorb(medians: dict[str, float], tag: str) -> None:
        for q, t in medians.items():
            if q not in best or t < best[q][0]:
                best[q] = (t, tag)

    for n in range(1, 99):
        p = os.path.join(REPO, f"BENCH_r{n:02d}.json")
        if os.path.exists(p):
            absorb(medians_from_tail(p), f"r{n:02d}")

    # extra evidence: full local runs, passed as --merge <file> <tag> pairs
    args = sys.argv[1:]
    while args and args[0] == "--merge":
        absorb(medians_from_full(args[1]), args[2])
        args = args[3:]

    lines = [
        "# BASELINE-QUERIES — best-known per-query bench median (sf0.1, local[32])",
        "",
        "Regenerate: `python tools/make_baseline_queries.py "
        "[--merge BENCH_FULL.json rNN]`. `bench.py` reads this table and",
        "prints a per-query ratio + `vs_baseline_best` aggregate; a query at",
        ">=2x its best-known median is flagged `BASELINE-REGRESSION` on stderr.",
        "Driver captures r1-r5 are tail-truncated, so early rounds contribute",
        "only the queries whose median survived truncation.",
        "",
        "| query | best median (s) | round |",
        "|---|---|---|",
    ]
    for q in sorted(best):
        t, tag = best[q]
        lines.append(f"| {q} | {t:.3f} | {tag} |")
    out = os.path.join(REPO, "BASELINE-QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(best)} queries")


if __name__ == "__main__":
    main()
