"""SmallFloat norm encoding vs hand-computed Lucene values
(util/SmallFloat.java:100-175 semantics)."""

import numpy as np
import pytest

from engine.smallfloat import (
    LENGTH_TABLE,
    NUM_FREE_VALUES,
    byte4_to_int,
    int4_to_long,
    int_to_byte4,
    int_to_byte4_array,
    long_to_int4,
)


def test_free_values_exact():
    assert NUM_FREE_VALUES == 24  # 255 - longToInt4(2^31-1) = 255 - 231
    for i in range(24):
        assert int_to_byte4(i) == i
        assert byte4_to_int(i) == i


def test_long_int4_roundtrip_small():
    for i in range(0, 16):
        assert int4_to_long(long_to_int4(i)) == i


def test_known_values():
    # longToInt4(Integer.MAX_VALUE): numBits=31, shift=27, enc=7|224=231
    assert long_to_int4(2**31 - 1) == 231
    # quantization starts after 23 + subnormal/normal boundary around 40:
    # intToByte4(39) = 24 + longToInt4(15) = 24 + 15 = 39 (exact)
    assert int_to_byte4(39) == 39
    # intToByte4(40) = 24 + longToInt4(16): numBits=5, shift=1, enc=(16>>1)&7|16=16 -> 40
    assert int_to_byte4(40) == 40
    # intToByte4(41) = 24 + longToInt4(17): 17>>1=8,&7=0,|16=16 -> 40  (first collision)
    assert int_to_byte4(41) == 40


def test_monotone_and_idempotent_decode():
    prev = -1
    for i in range(100_000):
        b = int_to_byte4(i)
        assert b >= prev  # monotone non-decreasing
        prev = b
        d = byte4_to_int(b)
        assert int_to_byte4(d) == b  # decode is a fixpoint representative
        assert d <= i


def test_vectorized_matches_scalar():
    vals = np.array(
        [0, 1, 23, 24, 25, 39, 40, 41, 64, 100, 255, 1000, 65535, 2**20, 2**31 - 1],
        dtype=np.int64,
    )
    expected = np.array([int_to_byte4(int(v)) for v in vals], dtype=np.uint8)
    np.testing.assert_array_equal(int_to_byte4_array(vals), expected)
    # dense sweep
    sweep = np.arange(0, 50_000, dtype=np.int64)
    exp = np.array([int_to_byte4(int(v)) for v in sweep], dtype=np.uint8)
    np.testing.assert_array_equal(int_to_byte4_array(sweep), exp)


def test_negative_rejected():
    with pytest.raises(ValueError):
        int_to_byte4(-1)
    with pytest.raises(ValueError):
        int_to_byte4_array(np.array([-5]))


def test_length_table():
    assert LENGTH_TABLE.dtype == np.float32
    assert LENGTH_TABLE[0] == 0.0
    assert LENGTH_TABLE[39] == 39.0
    assert LENGTH_TABLE[40] == 40.0
    for i in range(256):
        assert LENGTH_TABLE[i] == np.float32(byte4_to_int(i))
