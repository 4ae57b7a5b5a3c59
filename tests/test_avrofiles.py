"""Avro Object Container codec (sources/avrofiles.py): spec-derived
roundtrips across both codecs, zigzag-varint edges (negatives, 64-bit
extremes), nullable unions, multi-block framing, sync verification and
defect rejections. No avro library exists in this container, so the
roundtrip + hand-pinned byte checks ARE the conformance evidence (same
posture as the GIF/LZW rung)."""

from __future__ import annotations

import pytest

from tinymapreduce_spark.sources.avrofiles import (
    _read_long,
    _zigzag,
    parse_avro,
    write_avro,
)

FIELDS = [("rid", "long"), ("delta", "long"), ("tag", "string")]


def _recs(n: int) -> list[dict]:
    return [
        {"rid": i * 1000, "delta": (i % 7) - 3, "tag": f"t{i % 5}"} for i in range(n)
    ]


def test_zigzag_known_vectors_and_edges():
    # the spec's canonical examples: 0->00, -1->01, 1->02, -2->03, 2->04
    assert [_zigzag(v) for v in (0, -1, 1, -2, 2)] == [
        b"\x00", b"\x01", b"\x02", b"\x03", b"\x04"
    ]
    for v in (63, -64, 64, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        got, pos = _read_long(_zigzag(v), 0)
        assert got == v and pos == len(_zigzag(v))
    with pytest.raises(ValueError, match="truncated"):
        _read_long(b"\x80", 0)


def test_roundtrip_both_codecs_and_multiblock():
    for codec in ("null", "deflate", "snappy"):
        for n in (0, 1, 3, 10):  # 10 records -> 4 blocks of <=3
            blob = write_avro(_recs(n), FIELDS, codec=codec)
            fields, back = parse_avro(blob)
            assert fields == FIELDS
            assert back == _recs(n)


def test_nullable_union_field():
    fields = [("rid", "long"), ("score", "?long"), ("note", "?string")]
    recs = [
        {"rid": 1, "score": 42, "note": None},
        {"rid": 2, "score": None, "note": "hello"},
    ]
    got_fields, back = parse_avro(write_avro(recs, fields))
    assert got_fields == fields
    assert back == recs


def test_defects_raise():
    blob = bytearray(write_avro(_recs(5), FIELDS, codec="deflate"))
    with pytest.raises(ValueError, match="magic"):
        parse_avro(b"Obj\x02" + bytes(blob[4:]))
    # corrupt the LAST sync marker (metadata/schema untouched)
    bad = blob.copy()
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        parse_avro(bytes(bad))
    with pytest.raises(ValueError, match="shorter than declared"):
        parse_avro(bytes(blob[:-20]))
    # unsupported codec named in metadata
    snappy = write_avro(_recs(1), FIELDS).replace(b"null", b"snap", 1)
    with pytest.raises(ValueError, match="codec"):
        parse_avro(snappy)
    # snappy block with a corrupted CRC32 trailer must raise
    sblob = bytearray(write_avro(_recs(3), FIELDS, codec="snappy"))
    sblob[-17] ^= 0xFF  # last byte before the trailing sync = CRC byte
    with pytest.raises(ValueError, match="CRC32"):
        parse_avro(bytes(sblob))


def test_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rec = st.fixed_dictionaries(
        {
            "rid": st.integers(min_value=-(2**62), max_value=2**62),
            "delta": st.integers(min_value=-(10**9), max_value=10**9),
            "tag": st.text(max_size=40),
        }
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(rec, max_size=12), st.sampled_from(["null", "deflate", "snappy"]))
    def check(records, codec):
        _, back = parse_avro(write_avro(records, FIELDS, codec=codec))
        assert back == records

    check()
