"""Property-based tests (hypothesis) for the pure helpers."""

from hypothesis import given, settings
from hypothesis import strategies as st

from oracledb_datapump_spark.directives import (
    DirectiveBase,
    compile_directives,
)
from oracledb_datapump_spark.util import string_shortener


@given(st.text(min_size=0, max_size=500), st.integers(min_value=12, max_value=200))
@settings(max_examples=200)
def test_string_shortener_invariants(value, max_length):
    out = string_shortener(value, max_length)
    assert len(out) <= max_length
    if len(value) <= max_length:
        assert out == value
    # deterministic
    assert out == string_shortener(value, max_length)


@given(
    st.lists(
        st.sampled_from(
            [
                {"name": "INCLUDE_SCHEMA", "value": "s1"},
                {"name": "INCLUDE_TABLE", "value": "t1"},
                {"name": "PARALLEL", "value": 4},
                {"name": "COMPRESSION", "value": "ALL"},
                {"name": "COMPRESSION_ALGORITHM", "value": "MEDIUM"},
                {"name": "TABLE_EXISTS_ACTION", "value": "APPEND"},
                {"name": "REMAP_SCHEMA", "old_value": "a", "value": "b"},
                {"name": "FLASHBACK_SCN", "value": 42},
                {"name": "LOGTIME", "value": "ALL"},
                {"name": "METRICS", "value": True},
            ]
        ),
        max_size=8,
    )
)
@settings(max_examples=100)
def test_directive_json_roundtrip_stable(dicts):
    """from_dict → to_dict → from_dict must be a fixed point, and
    compilation must be deterministic over the same list."""
    d1 = [DirectiveBase.from_dict(d) for d in dicts]
    d2 = [DirectiveBase.from_dict(x.to_dict()) for x in d1]
    assert [x.to_dict() for x in d1] == [x.to_dict() for x in d2]
    c1 = compile_directives(d1)
    c2 = compile_directives(d2)
    assert c1 == c2
