"""Vectorized string kernels must be bit-exact with the scalar ports
(which are themselves conformance-tested against the reference)."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mhdb_tables2turtles_ray.functions.strings import (
    check_iri,
    convert_string_to_label,
    language_string,
)
from mhdb_tables2turtles_ray.functions.vectorized import (
    check_iri_delimited_vec,
    delimited_label_vec,
    language_string_vec,
)

TEXT = st.one_of(
    st.text(max_size=40),
    st.text(alphabet=" _-:/\"'\n\t\x1c\x1d\x85aA0é騎.", max_size=25),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_language_string_vec_matches(values):
    arr = pa.array(values, pa.string())
    got = language_string_vec(arr).to_pylist()
    assert got == [language_string(v) for v in values]


@settings(max_examples=300, deadline=None)
@given(st.lists(TEXT.filter(lambda s: s.strip()), min_size=1, max_size=20))
def test_delimited_label_vec_matches(values):
    arr = pa.array(values, pa.string())
    got = delimited_label_vec(arr).to_pylist()
    for v, g in zip(values, got):
        try:
            expected = convert_string_to_label(v, "delimited")
        except ValueError:
            continue  # empty-label inputs are gated by callers
        assert g == expected, repr(v)


@settings(max_examples=300, deadline=None)
@given(st.lists(TEXT.filter(lambda s: s.strip()), min_size=1, max_size=20))
def test_check_iri_vec_matches(values):
    # inputs whose scalar form raises (empty-label pathologies like ':')
    # raise on the vec path too — callers gate them; compare the rest
    def ok(v):
        try:
            check_iri(v, "delimited")
            return True
        except Exception:
            return False

    values = [v for v in values if ok(v)]
    if not values:
        return
    arr = pa.array(values, pa.string())
    got = check_iri_delimited_vec(arr).to_pylist()
    for v, g in zip(values, got):
        assert g == check_iri(v, "delimited"), repr(v)


def test_null_propagation():
    arr = pa.array(["a", None, "b"], pa.string())
    assert language_string_vec(arr).to_pylist()[1] is None
