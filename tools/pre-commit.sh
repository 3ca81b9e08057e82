#!/bin/sh
# Mechanical final-commit checklist (round-7/round-9 lesson: the last
# commit of a round twice shipped a GATED_PREFIX edit without the
# ledger regen / oracle check). Installed as .git/hooks/pre-commit by
# `sh tools/install-hooks.sh`; checked in here so it survives clones.
#
# Rules enforced when the staged diff touches __spark_entry__.py:
#   1. README ledger must be fresh (make_ledger --check).
#   2. Every query name ADDED to GATED_PREFIX (staged vs HEAD) must have
#      a green row in GATE_WITNESS.json (written by tools/gate_witness.py,
#      which runs the driver's own compare path at sf0.01).
# Bypass (emergencies only): git commit --no-verify.
set -e
cd "$(git rev-parse --show-toplevel)"

if git diff --cached --name-only | grep -q '^__spark_entry__.py$'; then
    python tools/make_ledger.py --check >/dev/null || {
        echo "pre-commit: stale README ledger — run: python tools/make_ledger.py --write" >&2
        exit 1
    }
    python - <<'EOF' || exit 1
import json, re, subprocess, sys

def prefix(text):
    m = re.search(r"GATED_PREFIX = \[(.*?)\]", text, re.S)
    return set(re.findall(r'"([^"]+)"', m.group(1))) if m else set()

staged = subprocess.run(
    ["git", "show", ":__spark_entry__.py"], capture_output=True, text=True
).stdout
head = subprocess.run(
    ["git", "show", "HEAD:__spark_entry__.py"], capture_output=True, text=True
).stdout
added = prefix(staged) - prefix(head)
if not added:
    sys.exit(0)
# names with a green row in any committed CORRECTNESS_r*.json are
# backfill rotation, not new/changed work — the witness requirement
# targets the round-7/round-9 failure mode (a query entering the gate
# that has NEVER passed the driver's compare)
import glob, json as _json

for f in glob.glob("CORRECTNESS_r*.json"):
    for q, v in _json.load(open(f)).items():
        ok = v.get("hash_match") or (
            v.get("rows_match") and v.get("hash_match") is None
        )
        if ok:
            added.discard(q)
if not added:
    sys.exit(0)
try:
    witness = json.loads(
        subprocess.run(
            ["git", "show", ":GATE_WITNESS.json"], capture_output=True, text=True
        ).stdout
        or "{}"
    )
except json.JSONDecodeError:
    witness = {}
missing = sorted(
    q for q in added if witness.get(q, {}).get("hash_match") is False
    or q not in witness
)
if missing:
    print(
        "pre-commit: GATED_PREFIX gained names without a staged green "
        f"witness: {missing}\nrun: python tools/gate_witness.py "
        + " ".join(missing) + "  && git add GATE_WITNESS.json",
        file=sys.stderr,
    )
    sys.exit(1)
EOF
fi
exit 0
