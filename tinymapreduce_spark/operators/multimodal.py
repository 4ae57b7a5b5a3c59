"""Multimodal column plumbing — binary payloads with typed metadata.

The container has no image/audio codecs, so the *decode* step is an
explicit stub (``decode_image`` raises NotImplementedError; the pipeline
uses a deterministic fake featureizer) — but the Spark-side machinery is
real and tested: BinaryType columns, metadata structs, Arrow-batched
``mapInPandas`` over binary data, stable output schema.

At 100 TB the payload column dominates IO; the plans here only project
(doc_id, payload) into the UDF — column pruning keeps text/metadata out
of the Arrow channel.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd

from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Pandas UDFs here must survive executors that can't import this package
# (driver may load us via sys.path only) — pickle this module by value.
cloudpickle.register_pickle_by_value(sys.modules[__name__])

from tinymapreduce_spark.sources.loaders import documents_for_cpu, load_table


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires a codec library not present in this
    container. Deliberately stubbed; ``fake_features`` is the
    deterministic stand-in the pipeline uses."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "use fake_features() for the deterministic test path"
    )


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct to each
    document (payload = utf-8 bytes of the text, standing in for an
    image/audio blob)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length("text").alias("n_bytes_decl"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def fake_features(payload: bytes) -> tuple[int, str]:
    """Deterministic stand-in for decode+feature-extract: byte length and
    hex of the first 8 bytes. Same batch shape a real decoder would use."""
    return len(payload), payload[:8].hex()


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas receives pandas batches whose 'payload' cells are Python
    bytes — exactly how a real decoder (PIL/ffmpeg) would consume them.
    """
    docs = documents_for_cpu(spark, sf_dir)
    payloads = with_payload(docs).select("doc_id", "payload")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_len": [f[0] for f in feats],
                    "header_hex": [f[1] for f in feats],
                }
            )

    return payloads.mapInPandas(extract, schema="doc_id long, payload_len long, header_hex string")


MULTIMODAL_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
       lower(substr(hex(encode(text)), 1, 16)) AS header_hex
FROM documents
"""

# --- resize (byte-stride downsample) -----------------------------------
# A real image resize is a codec call; the deterministic stand-in keeps
# every RESIZE_STRIDE-th byte, which exercises the identical Spark
# plumbing: binary in, smaller binary out, Arrow batches, stable schema.
RESIZE_STRIDE = 4


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Resize' each binary payload by keeping every 4th byte (the
    deterministic stand-in for a decoder+scaler — see ``decode_image``).
    Output proves content, not just shape: md5 of the resized bytes is
    oracle-checked, so the byte-level transform itself is verified."""
    import hashlib

    docs = documents_for_cpu(spark, sf_dir)
    payloads = with_payload(docs).select("doc_id", "payload")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [bytes(p)[::RESIZE_STRIDE] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_len": [len(p) for p in pdf["payload"]],
                    "resized_len": [len(r) for r in resized],
                    "resized_md5": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    return payloads.mapInPandas(
        resize, schema="doc_id long, orig_len long, resized_len long, resized_md5 string"
    )


# Text is pure ASCII in the fixtures, so char positions == byte positions
# and DuckDB can replicate the stride with a list comprehension.
MULTIMODAL_RESIZE_SQL = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS orig_len,
       CAST(length(array_to_string(
           [substr(text, i, 1) for i in range(1, length(text)+1, {RESIZE_STRIDE})], '')) AS BIGINT)
         AS resized_len,
       md5(array_to_string(
           [substr(text, i, 1) for i in range(1, length(text)+1, {RESIZE_STRIDE})], ''))
         AS resized_md5
FROM documents
"""

# --- frame sampling -----------------------------------------------------
# Video stand-in: the payload is a sequence of fixed-size frames; keep
# every FRAME_EVERY-th frame. Same batch shape as ffmpeg-style sampling.
FRAME_BYTES = 16
FRAME_EVERY = 4


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample every 4th 16-byte 'frame' from each binary payload via
    Arrow-batched mapInPandas; emits frame counts plus an md5 over the
    concatenated sampled frames so the exact sampled bytes are verified."""
    import hashlib

    docs = documents_for_cpu(spark, sf_dir)
    payloads = with_payload(docs).select("doc_id", "payload")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": pdf["doc_id"], "n_frames": [], "n_sampled": [], "sampled_md5": []}
            for p in pdf["payload"]:
                b = bytes(p)
                n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                frames = [
                    b[FRAME_BYTES * i : FRAME_BYTES * (i + 1)]
                    for i in range(0, n_frames, FRAME_EVERY)
                ]
                rows["n_frames"].append(n_frames)
                rows["n_sampled"].append(len(frames))
                rows["sampled_md5"].append(hashlib.md5(b"".join(frames)).hexdigest())
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(
        sample, schema="doc_id long, n_frames long, n_sampled long, sampled_md5 string"
    )


FRAME_SAMPLE_SQL = f"""
WITH f AS (
  SELECT doc_id,
         CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames,
         text
  FROM documents
)
SELECT doc_id,
       n_frames,
       CAST(ceil(n_frames / {FRAME_EVERY}.0) AS BIGINT) AS n_sampled,
       md5(array_to_string(
           [substr(text, 1 + {FRAME_BYTES}*i, {FRAME_BYTES})
            for i in range(0, CAST(n_frames AS INT), {FRAME_EVERY})], ''))
         AS sampled_md5
FROM f
"""

# --- audio energy windows ----------------------------------------------
# Audio stand-in: the payload is unsigned 8-bit PCM; per 256-sample
# window compute integer energy (sum of squared samples) and report the
# loudest window — the frame-level feature extraction (VAD, silence
# trimming, loudness normalization) every audio pipeline runs before
# transcription. Integer arithmetic end-to-end, so the oracle matches
# exactly — no float summation anywhere.
AUDIO_WINDOW = 256


def audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed energy over binary 'audio' payloads via Arrow-batched
    mapInPandas + numpy (the exact batch shape a real DSP kernel uses:
    frombuffer -> vectorized ops per batch, no per-sample Python).
    Emits per doc: window count, total energy, and the argmax window
    (ties to the earliest), all exact integers."""
    return audio_energy_df(documents_for_cpu(spark, sf_dir))


def audio_energy_df(docs: DataFrame) -> DataFrame:
    """Body over any ``(doc_id, text)`` frame — split out so tests can
    certify the zero-length-payload and non-ASCII parity edges on
    synthetic docs the generated testdata doesn't contain."""
    import numpy as np

    payloads = with_payload(docs).select("doc_id", "payload")

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "n_windows": [],
                "total_energy": [],
                "peak_window": [],
                "peak_energy": [],
            }
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                n_win = (len(samples) + AUDIO_WINDOW - 1) // AUDIO_WINDOW
                if n_win == 0:
                    # zero-length payload: no windows exist; emit no row,
                    # mirroring the oracle (no chars -> no group row).
                    continue
                sq = samples * samples
                wins = [
                    int(sq[AUDIO_WINDOW * i : AUDIO_WINDOW * (i + 1)].sum())
                    for i in range(n_win)
                ]
                peak = max(range(n_win), key=lambda i: (wins[i], -i))
                rows["doc_id"].append(doc_id)
                rows["n_windows"].append(n_win)
                rows["total_energy"].append(int(sq.sum()))
                rows["peak_window"].append(peak)
                rows["peak_energy"].append(wins[peak])
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(
        energy,
        schema="doc_id long, n_windows long, total_energy long, peak_window long, peak_energy long",
    )


AUDIO_ENERGY_SQL = f"""
WITH payloads AS (
  -- UTF-8 BYTES of the text, hex-expanded: matches np.frombuffer over
  -- encode(text,'UTF-8') for ANY text, not just ASCII (a per-character
  -- ascii() oracle diverges on multi-byte code points).
  SELECT doc_id, hex(encode(text)) AS h FROM documents
), chars AS (
  SELECT doc_id, (t.i - 1) // {AUDIO_WINDOW} AS win,
         CAST('0x' || substr(h, 2 * t.i - 1, 2) AS INT) AS v
  FROM payloads,
       LATERAL (SELECT UNNEST(range(1, length(h) // 2 + 1)) AS i) t
), wins AS (
  SELECT doc_id, win, SUM(v * v) AS energy
  FROM chars GROUP BY 1, 2
), ranked AS (
  SELECT doc_id, win, energy,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY energy DESC, win ASC) AS rk
  FROM wins
), totals AS (
  SELECT doc_id, COUNT(*) AS n_windows, CAST(SUM(energy) AS BIGINT) AS total_energy
  FROM wins GROUP BY doc_id
)
SELECT t.doc_id, t.n_windows, t.total_energy,
       r.win AS peak_window, CAST(r.energy AS BIGINT) AS peak_energy
FROM totals t JOIN ranked r ON t.doc_id = r.doc_id AND r.rk = 1
"""


def image_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary METADATA parsing entirely JVM-side — the step that needs
    no codec and so needs no stub: a deterministic PNG-layout header
    (magic + IHDR length + 'IHDR' + big-endian u32 width/height derived
    from doc_id) is constructed as a real BinaryType column, then parsed
    back by offset arithmetic (substring on binary -> hex -> base-16
    conv). This is how a 100 TB image pipeline reads dimensions for
    filtering/bucketing WITHOUT decoding pixels: a few header bytes per
    blob, pure codegen, no Python.

    Width/height are synthesized (the corpus has no real images); the
    PARSING path — big-endian u32 extraction at PNG IHDR offsets 16/20 —
    is byte-for-byte the real one, and the oracle re-derives both the
    construction and the parse independently."""
    docs = documents_for_cpu(spark, sf_dir)
    width = (F.lit(100) + F.col("doc_id") % 512).cast("int")
    height = (F.lit(100) + (F.col("doc_id") * 7) % 512).cast("int")
    be_u32 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))  # noqa: E731
    payload = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),  # PNG magic
        F.unhex(F.lit("0000000D")),  # IHDR chunk length (13)
        F.encode(F.lit("IHDR"), "UTF-8"),
        be_u32(width),
        be_u32(height),
        F.unhex(F.lit("0806000000")),  # bit depth/color/etc
    )
    blobs = docs.select("doc_id", payload.alias("payload"))
    parse_u32 = lambda pos: F.conv(  # noqa: E731
        F.hex(F.expr(f"substring(payload, {pos}, 4)")), 16, 10
    ).cast("long")
    return blobs.select(
        "doc_id",
        (F.hex(F.expr("substring(payload, 1, 8)")) == "89504E470D0A1A0A").alias(
            "magic_ok"
        ),
        parse_u32(17).alias("width"),
        parse_u32(21).alias("height"),
        F.length("payload").cast("long").alias("header_bytes"),
    )


IMAGE_HEADER_SQL = """
WITH blobs AS (
  SELECT doc_id,
         unhex('89504E470D0A1A0A') || unhex('0000000D') || encode('IHDR')
         || unhex(lpad(to_hex(CAST(100 + doc_id % 512 AS INT)), 8, '0'))
         || unhex(lpad(to_hex(CAST(100 + (doc_id * 7) % 512 AS INT)), 8, '0'))
         || unhex('0806000000') AS payload
  FROM documents
)
SELECT doc_id,
       -- DuckDB has no blob substr: byte offset k maps to hex chars 2k-1..
       substr(hex(payload), 1, 16) = '89504E470D0A1A0A' AS magic_ok,
       CAST('0x' || substr(hex(payload), 33, 8) AS BIGINT) AS width,
       CAST('0x' || substr(hex(payload), 41, 8) AS BIGINT) AS height,
       CAST(octet_length(payload) AS BIGINT) AS header_bytes
FROM blobs
"""
