import numpy as np

from lucene_solr_spark.norms import (
    LENGTH_TABLE,
    MAX_INT4,
    NUM_FREE_VALUES,
    byte4_to_int,
    int_to_byte4,
    quantized_length,
)


def test_constants():
    assert MAX_INT4 == 231
    assert NUM_FREE_VALUES == 24


def test_exact_up_to_40():
    # FIXTURES.md §3: intToByte4 exact for 0..40
    v = np.arange(41)
    assert (byte4_to_int(int_to_byte4(v)) == v).all()


def test_lossy_points():
    # boundary cases pinned in FIXTURES.md §3
    # hand-derived from the 3-bit-mantissa + implicit-bit encoding
    cases = {41: 40, 127: 120, 128: 128, 255: 248, 256: 248, 1000: 984, 2048: 1944}
    for i, expect in cases.items():
        got = int(quantized_length(np.array([i]))[0])
        assert got == expect, (i, got, expect)


def test_monotonic_and_idempotent():
    v = np.arange(0, 100_000)
    enc = int_to_byte4(v)
    assert (np.diff(enc) >= 0).all()
    assert enc.max() <= 255
    dec = byte4_to_int(enc)
    assert (dec <= v).all()  # decode never exceeds true length
    # quantization is idempotent: re-encoding a decoded value is stable
    assert (int_to_byte4(dec) == enc).all()


def test_length_table_matches_decode():
    assert (LENGTH_TABLE == byte4_to_int(np.arange(256))).all()
    assert LENGTH_TABLE[0] == 0 and LENGTH_TABLE[255] == byte4_to_int(np.array([255]))[0]
