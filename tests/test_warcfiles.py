"""Unit tests for the WARC reader/writer (``sources/warcfiles.py``) —
the web-crawl container rung. No Spark involved: the walker is
row-local; the Spark plumbing is certified by the oracle-backed
``warc_ingest_stats`` query.
"""

from __future__ import annotations

import random
import zlib

import pytest

from tinymapreduce_spark.sources.warcfiles import (
    _doc_records,
    parse_warc,
    write_warc,
)


def _rand_records(rng: random.Random):
    recs = []
    for i in range(rng.randint(1, 6)):
        wtype = rng.choice(["warcinfo", "request", "response", "metadata"])
        payload = bytes(rng.randrange(256) for _ in range(rng.randint(0, 300)))
        recs.append(
            (wtype, payload, {"WARC-Record-ID": f"<urn:uuid:{i}>"})
        )
    return recs


def test_roundtrip_plain_and_gzip_members():
    rng = random.Random(21)
    for t in range(30):
        recs = _rand_records(rng)
        for gz in (False, True):
            payload = write_warc(recs, gzip_members=gz)
            got = parse_warc(payload)
            assert [(t_, b) for t_, _, b in got] == [
                (t_, b) for t_, b, _ in recs
            ], (t, gz)
            for (_, _, hdrs_in), (_, hdrs_out, _) in zip(recs, got):
                for k, v in hdrs_in.items():
                    assert hdrs_out[k] == v


def test_gzip_layout_is_per_record_members():
    """The .warc.gz convention: each record its own gzip member — the
    payload must contain one gzip magic per record, and a reader that
    naively inflates only the first member sees ONE record."""
    recs = _doc_records(7)  # 1 warcinfo + 4 responses
    payload = write_warc(recs, gzip_members=True)
    assert payload.count(b"\x1f\x8b\x08") == len(recs)
    d = zlib.decompressobj(47)
    first = d.decompress(payload) + d.flush()
    assert len(parse_warc(first)) == 1  # one member = one record
    assert len(parse_warc(payload)) == len(recs)  # the full walker gets all


def test_binary_payload_with_crlf_inside_survives_framing():
    """Content-Length framing, not delimiter scanning: payloads that
    CONTAIN the record terminator bytes must pass through intact."""
    evil = b"x\r\n\r\nWARC/1.0\r\n\r\n" * 3
    payload = write_warc([("response", evil, {})])
    (wtype, _, body), = parse_warc(payload)
    assert (wtype, body) == ("response", evil)


def test_malformed_records_are_rejected():
    good = write_warc(_doc_records(3))
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"WARC/9.9\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length|shorter|terminator"):
        parse_warc(good[:-6])  # chop the final terminator
    # corrupt the terminator of the first record
    bad = bytearray(good)
    idx = bad.index(b"\r\n\r\nWARC/1.0", 20)
    bad[idx + 2] = ord("X")
    with pytest.raises(ValueError):
        parse_warc(bytes(bad))
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(b"\x1f\x8b\x08" + b"\x00" * 10)
