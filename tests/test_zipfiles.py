"""ZIP walker/writer (sources/zipfiles.py): stdlib-zipfile interop in
BOTH directions, STORE + DEFLATE (from-scratch codec) legs, EOCD
backward scan past trailing comments, CRC/size verification, and
framing-defect rejections."""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from tinymapreduce_spark.sources.tarfiles import _doc_members, group_samples
from tinymapreduce_spark.sources.zipfiles import parse_zip, write_zip


def test_roundtrip_and_stdlib_reads_ours():
    for d in [0, 1, 2, 7, 254]:
        members = _doc_members(d)
        blob = write_zip(members)
        assert parse_zip(blob) == members
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            got = [(i.filename, zf.read(i)) for i in zf.infolist()]
        assert got == members
        # both methods present: even entries STORE, odd DEFLATE
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            methods = {i.compress_type for i in zf.infolist()}
        assert methods == {zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED}


def test_we_read_stdlib_including_trailing_comment():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.comment = b"dataset drop v3 - do not strip"
        zf.writestr("s/0001.txt", b"text " * 100, compress_type=zipfile.ZIP_DEFLATED)
        zf.writestr("s/0001.cls", b"7", compress_type=zipfile.ZIP_STORED)
    members = parse_zip(buf.getvalue())
    assert members[0] == ("s/0001.txt", b"text " * 100)
    assert members[1] == ("s/0001.cls", b"7")
    # the WebDataset grouping applies unchanged to zip shards
    assert group_samples(members)[0][0] == "s/0001"


def test_framing_defects_raise():
    blob = bytearray(write_zip([("a.txt", b"payload payload payload")]))
    with pytest.raises(ValueError, match="end-of-central"):
        parse_zip(bytes(blob[: len(blob) // 2]))
    # corrupt the stored payload: CRC must catch it
    at = bytes(blob).index(b"payload")
    bad = blob.copy()
    bad[at] ^= 0x01
    with pytest.raises(ValueError, match="CRC-32"):
        parse_zip(bytes(bad))
    # corrupt a local signature: cross-check must catch it
    at = bytes(blob).index(b"PK\x03\x04")
    bad = blob.copy()
    bad[at + 3] = 0x05
    with pytest.raises(ValueError, match="local-header"):
        parse_zip(bytes(bad))
    # unsupported method in the central entry
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("x", b"y" * 64, compress_type=zipfile.ZIP_DEFLATED)
    raw = bytearray(buf.getvalue())
    cd = bytes(raw).index(b"PK\x01\x02")
    raw[cd + 10 : cd + 12] = struct.pack("<H", 12)  # method 12 (bzip2)
    with pytest.raises(ValueError, match="method 12"):
        parse_zip(bytes(raw))


def test_zip_property_roundtrip_and_stdlib_parity():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    name = st.from_regex(r"[A-Za-z][A-Za-z0-9_\-]{0,40}\.[a-z]{1,8}", fullmatch=True)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.tuples(name, st.binary(max_size=1500)), min_size=1,
                    max_size=6, unique_by=lambda kv: kv[0]))
    def check(members):
        blob = write_zip(members)
        assert parse_zip(blob) == members
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            assert [(i.filename, zf.read(i)) for i in zf.infolist()] == members

    check()
