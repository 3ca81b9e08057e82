"""The README correctness-rotation ledger must never ship stale (it did
in rounds 6 and 7): the committed table has to equal what
tools/make_ledger.py renders from the CORRECTNESS_r*.json files and the
current queries() order. Regenerate with ``python tools/make_ledger.py
--write`` whenever a CORRECTNESS file lands or the gated prefix moves."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_readme_ledger_matches_generator():
    import make_ledger

    expected = make_ledger.render()
    readme = open(os.path.join(REPO, "README.md")).read()
    start = readme.index("| query | green |")
    got_lines = []
    for line in readme[start:].splitlines():
        if line.startswith("|"):
            got_lines.append(line.rstrip())
        else:
            break
    assert "\n".join(got_lines) == expected, (
        "README ledger is stale — run: python tools/make_ledger.py --write"
    )


def test_every_green_row_appears_in_ledger():
    """Every query with a green CORRECTNESS row must appear in the README
    with that round tag (the judge's r7 staleness finding, mechanized)."""
    import json
    import glob

    import make_ledger

    latest = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))):
        rnd = "r" + str(int(p.rsplit("_r", 1)[1].split(".")[0]))
        for q, row in json.load(open(p)).items():
            ok = row.get("hash_match") or (
                row.get("rows_match") and row.get("err") is None
            )
            if ok:
                latest[q] = rnd
    table = make_ledger.render()
    missing = [
        f"{q}={rnd}"
        for q, rnd in latest.items()
        if f"| {q} | {rnd} |" not in table
        and f"| {q}* | {rnd} |" not in table
        and f" {q} | {rnd} " not in table
        and f" {q}* | {rnd} " not in table
    ]
    assert not missing, missing[:10]
