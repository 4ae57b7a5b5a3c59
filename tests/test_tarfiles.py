"""ustar shard walker + WebDataset grouping (sources/tarfiles.py):
byte-level framing pinned against stdlib ``tarfile`` in BOTH directions
(our writer -> stdlib reader, stdlib USTAR writer -> our parser),
padding edges at the 512-block boundary, prefix-split long names, the
.tar.gz whole-stream path through the from-scratch inflate, grouping
contract violations, and every honest-boundary rejection."""

from __future__ import annotations

import io
import tarfile

import pytest

from tinymapreduce_spark.sources.tarfiles import (
    BLOCK,
    _doc_members,
    group_samples,
    parse_tar,
    write_tar,
)


def test_roundtrip_padding_edges():
    # payload sizes straddling the block boundary: 0, 1, 511, 512, 513
    members = [(f"k{i:02d}.bin", b"z" * n) for i, n in enumerate([0, 1, 511, 512, 513])]
    blob = write_tar(members)
    assert parse_tar(blob) == members
    assert len(blob) % BLOCK == 0
    # .tar.gz: whole-stream gzip through the from-scratch decoder
    assert parse_tar(write_tar(members, gzipped=True)) == members


def test_stdlib_reads_our_archives():
    members = _doc_members(2)
    with tarfile.open(fileobj=io.BytesIO(write_tar(members))) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members


def test_we_read_stdlib_ustar_archives():
    members = _doc_members(5) + [("dir_" + "x" * 80 + "/" + "y" * 60 + ".txt", b"deep")]
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    assert parse_tar(out.getvalue()) == members


def test_long_name_prefix_split_roundtrip():
    members = [("shard_" + "a" * 90 + "/" + "b" * 70 + ".txt", b"payload")]
    blob = write_tar(members)
    assert parse_tar(blob) == members
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        assert tf.getnames() == [members[0][0]]
    with pytest.raises(ValueError, match="name\\+prefix"):
        write_tar([("n" * 200 + ".txt", b"x")])  # no '/' to split at


def test_framing_defects_raise():
    blob = bytearray(write_tar([("a.txt", b"hello")]))
    bad = blob.copy()
    bad[0] ^= 1  # name byte: checksum must catch it
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(bad))
    bad = blob.copy()
    bad[257] = ord("U")  # magic
    with pytest.raises(ValueError, match="magic"):
        parse_tar(bytes(bad))
    with pytest.raises(ValueError, match="terminator"):
        parse_tar(bytes(blob[: BLOCK * 2]))  # header+payload, no EOF blocks
    with pytest.raises(ValueError, match="shorter than declared"):
        parse_tar(bytes(blob[: BLOCK + 2]))
    # directory entries rejected (honest boundary: plain-file shards only)
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        ti = tarfile.TarInfo("d")
        ti.type = tarfile.DIRTYPE
        tf.addfile(ti)
    with pytest.raises(ValueError, match="typeflag"):
        parse_tar(out.getvalue())


def test_webdataset_grouping():
    members = [
        ("s/0001.txt", b"t1"),
        ("s/0001.cls", b"3"),
        ("s/0001.seg.json", b"{}"),  # multi-dot ext: key cuts at FIRST dot
        ("s/0002.txt", b"t2"),
    ]
    samples = group_samples(members)
    assert [k for k, _ in samples] == ["s/0001", "s/0002"]
    assert samples[0][1] == {"txt": b"t1", "cls": b"3", "seg.json": b"{}"}
    with pytest.raises(ValueError, match="duplicate ext"):
        group_samples([("a.txt", b"1"), ("a.txt", b"2")])
    with pytest.raises(ValueError, match="non-adjacently"):
        group_samples([("a.txt", b"1"), ("b.txt", b"2"), ("a.cls", b"3")])
    with pytest.raises(ValueError, match="no extension"):
        group_samples([("noext", b"1")])


def test_query_stats_match_formula():
    # the exact per-doc stats tar_shard_ingest emits, derived two ways
    for d in [0, 1, 2, 3, 40, 255]:
        samples = group_samples(parse_tar(write_tar(_doc_members(d), gzipped=bool(d % 2))))
        n = 1 + d % 3
        assert len(samples) == n
        assert sum(len(s[1]["txt"]) for s in samples) == sum(
            len(f"sample text {d} {s} ") * (1 + (d + s) % 4) for s in range(n)
        )
        assert sum(sum(s[1]["bin"]) for s in samples) == sum(
            sum((d * 3 + s * 5 + i * 7) % 256 for i in range(16 + (d + s) % 17))
            for s in range(n)
        )


def test_tar_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    name = st.from_regex(r"[A-Za-z][A-Za-z0-9_\-]{0,40}\.[a-z]{1,8}", fullmatch=True)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.tuples(name, st.binary(max_size=1500)), min_size=1,
                    max_size=6, unique_by=lambda kv: kv[0]))
    def check(members):
        for gz in (False, True):
            assert parse_tar(write_tar(members, gzipped=gz)) == members

    check()
