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

from tinymapreduce_spark.sources.loaders import load_table


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
    docs = load_table(spark, sf_dir, "documents")
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
