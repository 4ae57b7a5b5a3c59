"""Avro Object Container File reader + writer — the row-oriented
interchange format of the Kafka/data-engineering world, implemented
from the public spec (Apache Avro 1.11 specification; no avro library
exists in this container, and Spark's `format("avro")` external module
is not bundled — so this IS the engine's Avro ingest). Adds the binary
encoding family the codec tier lacked: ZIGZAG VARINTS (all Avro
longs/ints), length-prefixed UTF-8 strings, and the container grammar
— magic ``Obj\\x01``, a metadata map carrying ``avro.schema`` (JSON)
and ``avro.codec``, a random 16-byte sync marker, then blocks of
(record count, byte size, payload, sync). The ``deflate`` codec is RAW
RFC 1951 per the spec — decompressed by the from-scratch inflate and
compressed by the from-scratch deflate — and since r7 the ``snappy``
codec runs the from-scratch LZ77-family codec in functions/snappy.py
with the spec's 4-byte big-endian CRC32-of-uncompressed trailer, so the
driver-checked queries verify BOTH directions of both compressed codecs
inside a third container family.

The reader is schema-driven (longs, strings; nullable via the
``["null", T]`` union convention) and verifies magic, codec support,
every block's sync marker and exact block-size framing; defects raise
``ValueError`` naming the defect. Writer/reader roundtrip is pinned by
unit + hypothesis tests (no third-party Avro exists here to interop
with — same posture as the spec-from-scratch GIF/LZW rung).
"""

from __future__ import annotations

import json
import sys

from pyspark import cloudpickle

from tinymapreduce_spark.functions.inflate import crc32, deflate_fixed, inflate
from tinymapreduce_spark.functions.snappy import snappy_compress, snappy_decompress

cloudpickle.register_pickle_by_value(sys.modules[__name__])

_MAGIC = b"Obj\x01"
# deterministic sync marker (determinism convention — a real writer
# randomizes; the spec only requires the 16 bytes be consistent within
# one file)
_SYNC = bytes(range(16))


def _zigzag(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        if pos >= len(data):
            raise ValueError("varint truncated")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("varint overlong")
    return (acc >> 1) ^ -(acc & 1), pos


def _encode_record(rec: dict, fields: list[tuple[str, str]]) -> bytes:
    out = bytearray()
    for name, typ in fields:
        v = rec[name]
        if typ.startswith("?"):  # ["null", T] union: branch index first
            if v is None:
                out += _zigzag(0)
                continue
            out += _zigzag(1)
            typ = typ[1:]
        if typ == "long":
            out += _zigzag(int(v))
        elif typ == "string":
            raw = str(v).encode()
            out += _zigzag(len(raw)) + raw
        else:
            raise ValueError(f"unsupported field type {typ}")
    return bytes(out)


def write_avro(
    records: list[dict],
    fields: list[tuple[str, str]],
    codec: str = "null",
    records_per_block: int = 3,
) -> bytes:
    """Container write: schema from ``fields`` ([(name, 'long'|'string')]),
    ``codec`` in {'null', 'deflate'} (deflate = RAW RFC 1951 via the
    from-scratch compressor), multiple blocks so block framing is real."""
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": n, "type": ["null", t[1:]] if t.startswith("?") else t}
            for n, t in fields
        ],
    }
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    out = bytearray(_MAGIC)
    out += _zigzag(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += _zigzag(len(kb)) + kb + _zigzag(len(v)) + v
    out += _zigzag(0)  # end of metadata map
    out += _SYNC
    for at in range(0, len(records), records_per_block):
        chunk = records[at : at + records_per_block]
        payload = b"".join(_encode_record(r, fields) for r in chunk)
        if codec == "deflate":
            payload = deflate_fixed(payload)
        elif codec == "snappy":
            # Avro 1.11 "Required Codecs": raw snappy block + 4-byte
            # BIG-ENDIAN CRC32 of the UNCOMPRESSED data
            payload = snappy_compress(payload) + crc32(payload).to_bytes(4, "big")
        out += _zigzag(len(chunk)) + _zigzag(len(payload)) + payload + _SYNC
    return bytes(out)


def parse_avro(payload: bytes) -> tuple[list[tuple[str, str]], list[dict]]:
    """Container read → (fields, records). Verifies magic, codec,
    per-block sync markers and exact framing; unions of
    ``["null", T]`` decode via their branch index."""
    if payload[:4] != _MAGIC:
        raise ValueError(f"bad Avro magic {payload[:4]!r}")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(payload, pos)
        if n == 0:
            break
        if n < 0:  # negative block count: abs count + byte size follows
            n, (_, pos) = -n, _read_long(payload, pos)
        for _ in range(n):
            klen, pos = _read_long(payload, pos)
            k = payload[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _read_long(payload, pos)
            meta[k] = payload[pos : pos + vlen]
            pos += vlen
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate", "snappy"):
        raise ValueError(f"codec {codec!r} unsupported")
    schema = json.loads(meta["avro.schema"])
    fields: list[tuple[str, str]] = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):  # ["null", T] nullable union
            t = [x for x in t if x != "null"][0]
            t = f"?{t}"
        fields.append((f["name"], t))
    sync = payload[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(payload):
        count, pos = _read_long(payload, pos)
        size, pos = _read_long(payload, pos)
        block = payload[pos : pos + size]
        if len(block) != size:
            raise ValueError("block shorter than declared size")
        pos += size
        if payload[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch after block")
        pos += 16
        if codec == "deflate":
            block, used = inflate(block)
            if used != size:
                raise ValueError("deflate block overlong")
        elif codec == "snappy":
            if size < 4:
                raise ValueError("snappy block shorter than its checksum")
            block, check = snappy_decompress(block[:-4]), block[-4:]
            if crc32(block).to_bytes(4, "big") != check:
                raise ValueError("snappy block CRC32 mismatch")
        bp = 0
        for _ in range(count):
            rec: dict = {}
            for name, typ in fields:
                nullable = typ.startswith("?")
                base = typ[1:] if nullable else typ
                if nullable:
                    branch, bp = _read_long(block, bp)
                    if branch == 0:
                        rec[name] = None
                        continue
                if base == "long":
                    rec[name], bp = _read_long(block, bp)
                elif base == "string":
                    ln, bp = _read_long(block, bp)
                    rec[name] = block[bp : bp + ln].decode()
                    bp += ln
                else:
                    raise ValueError(f"unsupported field type {base}")
            records.append(rec)
        if bp != len(block):
            raise ValueError("block payload has trailing bytes")
    return fields, records


# --- oracle-backed ingest query ---------------------------------------------
# Per doc d: 1 + d % 4 records {rid: d*1000 + r, delta: (d + r) % 7 - 3,
# tag: 't' + (d + r) % 5}; even docs codec null, odd docs deflate.
# Negative deltas exercise zigzag; multi-record blocks exercise framing.
def avro_ingest_stats(spark, sf_dir: str):
    """REAL Avro ingest over BinaryType: one container per document
    (alternating null/deflate codecs, 3-record blocks so multi-block
    framing is live), parsed back through the spec-derived reader and
    reduced to exact stats — zigzag of NEGATIVE longs, string lengths,
    block counts and both codec legs are all load-bearing. The oracle
    replays the record formulas; a varint, sync, framing or inflate bug
    flips the hash. Row-local Arrow kernels — the codec-tier shape."""
    import pandas as pd

    from tinymapreduce_spark.sources.loaders import documents_for_cpu

    docs = documents_for_cpu(spark, sf_dir).select("doc_id")
    fields = [("rid", "long"), ("delta", "long"), ("tag", "string")]

    def roundtrip(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "deflated": [], "n_records": [],
                "rid_sum": [], "delta_sum": [], "tag_len_sum": [],
            }
            for d in pdf["doc_id"]:
                d = int(d)
                recs = [
                    {
                        "rid": d * 1000 + r,
                        "delta": (d + r) % 7 - 3,
                        "tag": f"t{(d + r) % 5}",
                    }
                    for r in range(1 + d % 4)
                ]
                codec = "deflate" if d % 2 else "null"
                _, back = parse_avro(write_avro(recs, fields, codec=codec))
                rows["doc_id"].append(d)
                rows["deflated"].append(d % 2)
                rows["n_records"].append(len(back))
                rows["rid_sum"].append(sum(x["rid"] for x in back))
                rows["delta_sum"].append(sum(x["delta"] for x in back))
                rows["tag_len_sum"].append(sum(len(x["tag"]) for x in back))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        roundtrip,
        schema=(
            "doc_id long, deflated long, n_records long, rid_sum long,"
            " delta_sum long, tag_len_sum long"
        ),
    )


def avro_snappy_ingest(spark, sf_dir: str):
    """Snappy-codec leg of the Avro rung (VERDICT r6 #6): same container
    walk and record formulas, but the codec now CYCLES null/deflate/
    snappy by ``doc_id % 3``, so every block of the snappy docs runs the
    from-scratch LZ77-family compressor + decompressor AND the big-endian
    CRC32 trailer check on the ingest path. Same record-formula oracle —
    a tag-stream, varint-preamble, offset, or checksum bug flips the
    hash. Row-local Arrow kernels, shards parallelize by file."""
    import pandas as pd

    from tinymapreduce_spark.sources.loaders import documents_for_cpu

    docs = documents_for_cpu(spark, sf_dir).select("doc_id")
    fields = [("rid", "long"), ("delta", "long"), ("tag", "string")]
    codecs = ("null", "deflate", "snappy")

    def roundtrip(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "codec_id": [], "n_records": [],
                "rid_sum": [], "delta_sum": [], "tag_len_sum": [],
            }
            for d in pdf["doc_id"]:
                d = int(d)
                recs = [
                    {
                        "rid": d * 1000 + r,
                        "delta": (d + r) % 7 - 3,
                        "tag": f"t{(d + r) % 5}",
                    }
                    for r in range(1 + d % 4)
                ]
                _, back = parse_avro(
                    write_avro(recs, fields, codec=codecs[d % 3])
                )
                rows["doc_id"].append(d)
                rows["codec_id"].append(d % 3)
                rows["n_records"].append(len(back))
                rows["rid_sum"].append(sum(x["rid"] for x in back))
                rows["delta_sum"].append(sum(x["delta"] for x in back))
                rows["tag_len_sum"].append(sum(len(x["tag"]) for x in back))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        roundtrip,
        schema=(
            "doc_id long, codec_id long, n_records long, rid_sum long,"
            " delta_sum long, tag_len_sum long"
        ),
    )


AVRO_SNAPPY_SQL = """
WITH recs AS (
  SELECT doc_id, r.r,
         doc_id * 1000 + r.r AS rid,
         (doc_id + r.r) % 7 - 3 AS delta,
         LENGTH('t' || ((doc_id + r.r) % 5)) AS taglen
  FROM documents,
       LATERAL (SELECT UNNEST(range(0, 1 + doc_id % 4)) AS r) r
)
SELECT doc_id,
       CAST(doc_id % 3 AS BIGINT) AS codec_id,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(rid) AS BIGINT) AS rid_sum,
       CAST(SUM(delta) AS BIGINT) AS delta_sum,
       CAST(SUM(taglen) AS BIGINT) AS tag_len_sum
FROM recs
GROUP BY doc_id
"""


AVRO_INGEST_SQL = """
WITH recs AS (
  SELECT doc_id, r.r,
         doc_id * 1000 + r.r AS rid,
         (doc_id + r.r) % 7 - 3 AS delta,
         LENGTH('t' || ((doc_id + r.r) % 5)) AS taglen
  FROM documents,
       LATERAL (SELECT UNNEST(range(0, 1 + doc_id % 4)) AS r) r
)
SELECT doc_id,
       CAST(doc_id % 2 AS BIGINT) AS deflated,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(rid) AS BIGINT) AS rid_sum,
       CAST(SUM(delta) AS BIGINT) AS delta_sum,
       CAST(SUM(taglen) AS BIGINT) AS tag_len_sum
FROM recs
GROUP BY doc_id
"""
