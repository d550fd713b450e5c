"""Varbyte / delta-gap codec: goldens + roundtrip properties."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rt_etl_yahoo_search_engine_spark.operators.codec import (
    decode_doc_ids,
    decode_varbyte,
    encode_doc_ids,
    encode_varbyte,
)


def test_varbyte_goldens():
    # classic IR-textbook encoding: big-endian 7-bit groups, stop bit on last
    assert encode_varbyte([0]) == bytes([0x80])
    assert encode_varbyte([1]) == bytes([0x81])
    assert encode_varbyte([127]) == bytes([0xFF])
    assert encode_varbyte([128]) == bytes([0x01, 0x80])
    assert encode_varbyte([5, 130]) == bytes([0x85, 0x01, 0x82])
    # 824 = 6*128 + 56  (Manning et al. example)
    assert encode_varbyte([824]) == bytes([0x06, 0xB8])
    assert encode_varbyte([]) == b""


def test_varbyte_roundtrip_simple():
    vals = [0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**56 - 1]
    assert decode_varbyte(encode_varbyte(vals)).tolist() == vals


def test_delta_gap_roundtrip():
    ids = [3, 7, 8, 100, 5000, 5001, 10**12]
    assert decode_doc_ids(encode_doc_ids(ids)).tolist() == ids


def test_delta_gap_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_doc_ids([5, 5])
    with pytest.raises(ValueError):
        encode_doc_ids([5, 3])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**55), max_size=300))
def test_varbyte_roundtrip_property(vals):
    assert decode_varbyte(encode_varbyte(vals)).tolist() == vals


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300)
)
def test_doc_ids_roundtrip_property(gaps):
    ids = np.cumsum(np.array(gaps, dtype=np.int64) + 1)  # strictly increasing
    assert decode_doc_ids(encode_doc_ids(ids)).tolist() == ids.tolist()
