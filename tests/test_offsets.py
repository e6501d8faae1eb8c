"""Offset codec unit + property tests (SURVEY.md §5 item 3)."""

import pytest
from hypothesis import given, strategies as st

from durablestreams_spark import offsets


def test_serialize_width_and_shape():
    o = offsets.serialize_offset(1723500000000, 7)
    assert len(o) == 32
    assert o.isdigit()
    assert o[:16] == f"{1723500000000:016d}"
    assert o[16:] == f"{7:016d}"


def test_parse_round_trip_simple():
    assert offsets.parse_offset(offsets.serialize_offset(0, 0)) == (0, 0)
    assert offsets.parse_offset(offsets.serialize_offset(123, 456)) == (123, 456)


def test_malformed_rejected():
    with pytest.raises(ValueError):
        offsets.parse_offset("xyz")
    with pytest.raises(ValueError):
        offsets.parse_offset("1" * 31)
    with pytest.raises(ValueError):
        offsets.serialize_offset(-1, 0)
    with pytest.raises(ValueError):
        offsets.serialize_offset(0, 10**16)


@given(
    st.integers(min_value=0, max_value=10**16 - 1),
    st.integers(min_value=0, max_value=10**16 - 1),
)
def test_round_trip_property(epoch, counter):
    assert offsets.parse_offset(offsets.serialize_offset(epoch, counter)) == (epoch, counter)


@given(
    st.tuples(
        st.integers(min_value=0, max_value=10**16 - 1),
        st.integers(min_value=0, max_value=10**16 - 1),
    ),
    st.tuples(
        st.integers(min_value=0, max_value=10**16 - 1),
        st.integers(min_value=0, max_value=10**16 - 1),
    ),
)
def test_lexicographic_equals_numeric_order(a, b):
    """Lexicographic order over serialized offsets == (epoch, counter) order —
    the core invariant the reference's whole design rests on
    (reference README.md:105-108)."""
    sa, sb = offsets.serialize_offset(*a), offsets.serialize_offset(*b)
    assert (sa < sb) == (a < b)
    assert (sa == sb) == (a == b)


def test_monotonic_guard():
    # wall clock ahead → taken as-is; regression → last + 1
    assert offsets.next_epoch(100, 200) == 200
    assert offsets.next_epoch(200, 100) == 201
    assert offsets.next_epoch(200, 200) == 201


def test_end_of_epoch_sorts_after_all_counters():
    e = 1723500000000
    assert offsets.end_of_epoch(e) > offsets.serialize_offset(e, 10**16 - 1 - 1)
    assert offsets.end_of_epoch(e) < offsets.serialize_offset(e + 1, 0)
