"""From-scratch snappy codec: roundtrip, constructed tag-stream vectors
(all four element types incl. overlapping run copies), defect handling,
and the Avro snappy-codec leg's formula parity. No snappy library exists
in this container, so format vectors are hand-assembled from
google/snappy format_description.txt — same posture as the GIF/LZW and
Avro rungs."""

from __future__ import annotations

import pytest

from tinymapreduce_spark.functions.snappy import (
    snappy_compress,
    snappy_decompress,
)


def test_roundtrip_shapes():
    cases = [
        b"",
        b"a",
        b"abcd" * 100,
        b"a" * 200_000,  # crosses the 64 KiB fragment boundary
        ("the quick brown fox " * 5000).encode(),
        b"ab" * 70_000,
        bytes(range(256)) * 300,
    ]
    for data in cases:
        assert snappy_decompress(snappy_compress(data)) == data


def test_compression_actually_fires():
    rep = ("spark snappy " * 4000).encode()
    assert len(snappy_compress(rep)) < len(rep) // 10


def test_tag_stream_vectors():
    lit = bytes([(4 - 1) << 2]) + b"abcd"
    # copy-1 (tag 01): len 4, 11-bit offset 4
    assert snappy_decompress(bytes([8]) + lit + bytes([0x01, 4])) == b"abcdabcd"
    # copy-2 (tag 10): len 4, 2-byte LE offset 4
    assert (
        snappy_decompress(bytes([8]) + lit + bytes([0x02 | (3 << 2), 4, 0]))
        == b"abcdabcd"
    )
    # copy-4 (tag 11): len 4, 4-byte LE offset 4
    assert (
        snappy_decompress(bytes([8]) + lit + bytes([0x03 | (3 << 2), 4, 0, 0, 0]))
        == b"abcdabcd"
    )
    # overlapping copy replays a run: 1 literal + len-8 copy at offset 1
    assert (
        snappy_decompress(bytes([9, 0]) + b"x" + bytes([0x02 | (7 << 2), 1, 0]))
        == b"x" * 9
    )
    # extended literal length (sub-tag 60: one following length byte)
    body = bytes(200)
    blob = bytes([200, 1]) + bytes([60 << 2, 199]) + body
    assert snappy_decompress(blob) == body


def test_defects_raise():
    with pytest.raises(ValueError, match="varint"):
        snappy_decompress(b"\xff\xff\xff\xff\xff\xff")
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(bytes([4]) + bytes([0x02 | (3 << 2), 9, 0]))
    with pytest.raises(ValueError, match="offset"):  # zero offset illegal
        snappy_decompress(bytes([8]) + bytes([(4 - 1) << 2]) + b"abcd" + bytes([0x02 | (3 << 2), 0, 0]))
    with pytest.raises(ValueError, match="literal overruns"):
        snappy_decompress(bytes([10]) + bytes([(8 - 1) << 2]) + b"ab")
    with pytest.raises(ValueError, match="declared length"):
        snappy_decompress(bytes([9]) + bytes([(4 - 1) << 2]) + b"abcd")


def test_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=80, deadline=None)
    @given(st.binary(max_size=5000))
    def check(data):
        assert snappy_decompress(snappy_compress(data)) == data

    check()

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.tuples(st.integers(0, 255), st.integers(1, 400)), max_size=10)
    )
    def check_runs(runs):
        data = b"".join(bytes([b]) * n for b, n in runs)
        assert snappy_decompress(snappy_compress(data)) == data

    check_runs()


def test_avro_snappy_leg_matches_formula(spark, sf_dir):
    from tinymapreduce_spark.sources.avrofiles import avro_snappy_ingest

    rows = {r.doc_id: r for r in avro_snappy_ingest(spark, sf_dir).collect()}
    assert len(rows) > 0
    for d, r in rows.items():
        n = 1 + d % 4
        assert r.codec_id == d % 3
        assert r.n_records == n
        assert r.rid_sum == sum(d * 1000 + i for i in range(n))
        assert r.delta_sum == sum((d + i) % 7 - 3 for i in range(n))
        assert r.tag_len_sum == 2 * n
