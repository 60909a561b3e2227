"""SmallFloat parity tests — semantics from util/SmallFloat.java:103-167."""

import numpy as np
import pytest

from lucene_solr_spark.oracle.smallfloat import (
    LENGTH_TABLE,
    NUM_FREE_VALUES,
    byte4_to_int,
    byte4_to_int_np,
    int4_to_long,
    int_to_byte4,
    int_to_byte4_np,
    long_to_int4,
)


def test_constants():
    # longToInt4(Integer.MAX_VALUE) == 231, so 255-231 = 24 free values
    assert long_to_int4(2**31 - 1) == 231
    assert NUM_FREE_VALUES == 24


def test_small_values_exact():
    for i in range(NUM_FREE_VALUES):
        assert int_to_byte4(i) == i
        assert byte4_to_int(i) == i


def test_int4_roundtrip_monotone():
    prev = -1
    for code in range(232):
        v = int4_to_long(code)
        assert v > prev
        prev = v
        assert long_to_int4(v) == code


def test_decode_table_strictly_increasing():
    assert (np.diff(LENGTH_TABLE) > 0).all()
    assert LENGTH_TABLE[0] == 0
    assert LENGTH_TABLE[255] == byte4_to_int(255)


@pytest.mark.parametrize("v", [0, 1, 7, 8, 23, 24, 25, 39, 40, 255, 1000, 65535, 2**20, 2**31 - 1])
def test_encode_is_floor_of_decode(v):
    b = int_to_byte4(v)
    assert byte4_to_int(b) <= v
    if b < 255:
        assert byte4_to_int(b + 1) > v


def test_vectorized_matches_scalar_full_sweep():
    # every boundary of the 256 buckets plus random values
    vals = list(LENGTH_TABLE) + [int(x) + 1 for x in LENGTH_TABLE[:-1]]
    rng = np.random.default_rng(42)
    vals += list(rng.integers(0, 2**31 - 1, size=5000))
    arr = np.array(vals, dtype=np.int64)
    enc = int_to_byte4_np(arr)
    expected = np.array([int_to_byte4(int(v)) for v in vals], dtype=np.uint8)
    np.testing.assert_array_equal(enc, expected)
    np.testing.assert_array_equal(byte4_to_int_np(enc), np.array([byte4_to_int(int(e)) for e in expected]))


def test_negative_raises():
    with pytest.raises(ValueError):
        int_to_byte4(-1)
    with pytest.raises(ValueError):
        long_to_int4(-5)
