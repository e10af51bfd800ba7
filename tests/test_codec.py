"""Varbyte / gap / position codec round-trip tests, incl. hypothesis fuzz."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ds_discovery_opensearch_taxonomy_spark.functions.codec import (
    decode_docids,
    decode_positions,
    delta_decode,
    delta_encode,
    encode_docids,
    encode_positions,
    varbyte_decode,
    varbyte_encode,
)


class TestVarbyte:
    def test_empty(self):
        assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
        assert varbyte_decode(b"").size == 0

    def test_known_bytes(self):
        # 0 -> 00; 127 -> 7f; 128 -> 80 01; 300 -> ac 02
        assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
        assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
        assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
        assert varbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"

    def test_roundtrip_mixed(self):
        vals = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**63, 2**64 - 1],
                        dtype=np.uint64)
        assert (varbyte_decode(varbyte_encode(vals)) == vals).all()

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
    def test_roundtrip_fuzz(self, xs):
        vals = np.array(xs, dtype=np.uint64)
        assert (varbyte_decode(varbyte_encode(vals)) == vals).all()


class TestDocids:
    def test_roundtrip_signed(self):
        ids = np.array([-(2**62), -5, 0, 3, 2**62], dtype=np.int64)
        data = encode_docids(ids)
        assert (decode_docids(data) == ids).all()

    def test_chained_blocks(self):
        ids = np.sort(np.array([11, 25, 99, 105, 200, 777], dtype=np.int64))
        b1 = encode_docids(ids[:3])
        b2 = encode_docids(ids[3:], base=int(ids[2]))
        out = np.concatenate([decode_docids(b1), decode_docids(b2, base=int(ids[2]))])
        assert (out == ids).all()

    @settings(max_examples=100, deadline=None)
    @given(st.sets(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=200))
    def test_roundtrip_fuzz(self, xs):
        ids = np.array(sorted(xs), dtype=np.int64)
        assert (decode_docids(encode_docids(ids)) == ids).all()


class TestDelta:
    def test_roundtrip(self):
        v = np.array([3, 7, 7 + 100, 400], dtype=np.int64)
        assert (delta_decode(delta_encode(v)) == v).all()


class TestPositions:
    def test_roundtrip(self):
        plists = [
            np.array([0, 5, 9]),
            np.array([2]),
            np.array([], dtype=np.int64),
            np.array([1, 2, 3, 1000]),
        ]
        pos_b = encode_positions(plists)
        lens = np.array([len(x) for x in plists])
        offsets, flat = decode_positions(lens, pos_b)
        assert offsets.tolist() == [0, 3, 4, 4, 8]
        for i, p in enumerate(plists):
            assert flat[offsets[i]:offsets[i + 1]].tolist() == list(p)

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.sets(st.integers(min_value=0, max_value=10000), max_size=30),
            min_size=1,
            max_size=40,
        )
    )
    def test_roundtrip_fuzz(self, lists):
        plists = [np.array(sorted(s), dtype=np.int64) for s in lists]
        pos_b = encode_positions(plists)
        lens = np.array([len(x) for x in plists])
        offsets, flat = decode_positions(lens, pos_b)
        for i, p in enumerate(plists):
            assert flat[offsets[i]:offsets[i + 1]].tolist() == list(p)
