"""Property-based round-trip tests for both codec families (hypothesis)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from yatsm_spark.kernel import gorilla as gs
from yatsm_spark.kernel import gorilla_vec as gv

floats = st.lists(
    st.one_of(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        st.integers(-1000, 1000).map(float),
    ),
    min_size=0, max_size=300,
)

timestamps = st.lists(st.integers(-(2**62), 2**62), min_size=0, max_size=300)


@settings(max_examples=60, deadline=None)
@given(floats)
def test_scalar_float_roundtrip(xs):
    a = np.array(xs, dtype=np.float64)
    out = gs.decode_floats(gs.encode_floats(a))
    np.testing.assert_array_equal(out.view(np.uint64), a.view(np.uint64))


@settings(max_examples=60, deadline=None)
@given(floats)
def test_block_float_roundtrip(xs):
    a = np.array(xs, dtype=np.float64)
    out = gv.decode_floats_block(gv.encode_floats_block(a))
    np.testing.assert_array_equal(out.view(np.uint64), a.view(np.uint64))


@settings(max_examples=60, deadline=None)
@given(timestamps)
def test_scalar_ts_roundtrip(xs):
    a = np.array(xs, dtype=np.int64)
    np.testing.assert_array_equal(gs.decode_timestamps(gs.encode_timestamps(a)), a)


@settings(max_examples=60, deadline=None)
@given(timestamps)
def test_block_ts_roundtrip(xs):
    a = np.array(xs, dtype=np.int64)
    np.testing.assert_array_equal(
        gv.decode_timestamps_block(gv.encode_timestamps_block(a)), a)
