"""Bench headline-contract guard (r5 verdict ask #7): every declared
query is either benchmarked (HEADLINE) or consciously excluded with a
written reason (EXCLUDED) — coverage drift cannot happen silently."""

import bench
import __spark_entry__ as entry_mod


def test_headline_names_exist_in_queries():
    qs = set(entry_mod.queries())
    missing = [q for q in bench.HEADLINE if q not in qs]
    assert not missing, f"HEADLINE entries without a queries() impl: {missing}"


def test_every_query_is_benched_or_consciously_excluded():
    qs = set(entry_mod.queries())
    covered = set(bench.HEADLINE) | set(bench.EXCLUDED)
    uncovered = sorted(qs - covered)
    assert not uncovered, (
        "queries() entries neither benchmarked nor excluded-with-reason "
        f"(add to bench.HEADLINE or bench.EXCLUDED): {uncovered}"
    )


def test_no_stale_exclusions_or_overlap():
    qs = set(entry_mod.queries())
    stale = sorted(set(bench.EXCLUDED) - qs)
    assert not stale, f"EXCLUDED entries with no queries() impl: {stale}"
    overlap = sorted(set(bench.EXCLUDED) & set(bench.HEADLINE))
    assert not overlap, f"queries both benched and excluded: {overlap}"


def test_exclusions_carry_reasons():
    empty = [q for q, why in bench.EXCLUDED.items() if not str(why).strip()]
    assert not empty, f"EXCLUDED entries with no reason: {empty}"
