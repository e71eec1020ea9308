"""Posting codec + norm quantization invariants (SURVEY.md §5.5)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from xltsearch_spark.functions.norms import (byte315_to_float, encode_doc_length,
                                             float_to_byte315, quantized_doc_length)
from xltsearch_spark.functions.varint import (decode_deltas, decode_varint,
                                              encode_deltas, encode_varint)


def test_float_to_byte315_known_values():
    # SmallFloat.floatToByte315(1.0f) == 124 (public Lucene semantics)
    assert float_to_byte315(np.array([1.0], dtype=np.float32))[0] == 124
    assert float_to_byte315(np.array([0.0], dtype=np.float32))[0] == 0
    # tiny positive saturates to 1, huge to 255
    assert float_to_byte315(np.array([1e-30], dtype=np.float32))[0] == 1
    assert float_to_byte315(np.array([1e30], dtype=np.float32))[0] == 255


def test_byte315_roundtrip_idempotent():
    bs = np.arange(256, dtype=np.uint8)
    fs = byte315_to_float(bs)
    assert np.array_equal(float_to_byte315(fs), bs)  # decode->encode = identity


def test_norm_quantization_monotone_and_lossy():
    dl = np.arange(1, 5000)
    q = quantized_doc_length(dl)
    assert q[0] == 1.0
    assert np.all(np.diff(q) >= 0)  # longer docs never decode shorter
    b = encode_doc_length(dl)
    assert len(np.unique(b)) < 80  # 8-bit: coarse buckets, genuinely lossy


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(arr), len(arr)), arr)


@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=300))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_sorted_ids(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    out = decode_deltas(encode_deltas(arr), len(arr))
    assert np.array_equal(out, arr.astype(np.int64))


def test_varint_compactness():
    small = np.arange(1000, dtype=np.uint64)  # deltas of sorted dense ids = 1
    assert len(encode_deltas(small)) < 1100  # ~1 byte per id
