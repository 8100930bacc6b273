"""Multimodal column plumbing: opaque binary media + typed metadata.

Real Spark-side plumbing (schema, Arrow batch shape, mapInPandas
signatures, partitioning) with the actual image/audio decode STUBBED
deterministically — the decode libraries are not in this container
(see the module-level DECODERS registry: swapping in a real decoder is
a one-line change per modality).

media table schema:
    media(doc_id STRING, media_ref STRING, modality STRING,
          payload BINARY, meta MAP<STRING,STRING>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("modality", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha8", StringType()),
    ]
)


def _fake_decode_image(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decoder: 'dimensions'
    derive from the payload digest. Replace with PIL/libjpeg when
    available — the Spark plumbing around it does not change."""
    d = hashlib.sha256(payload).digest()
    return {"width": 1 + d[0] % 64, "height": 1 + d[1] % 64}


def _unsupported(payload: bytes) -> dict:
    raise NotImplementedError(
        "audio/video decode requires codecs not present in this container"
    )


DECODERS = {
    "image": _fake_decode_image,
    "audio": _unsupported,
    "video": _unsupported,
}


def synthesize_media(documents: DataFrame) -> DataFrame:
    """documents -> one deterministic fake-image row per doc (payload =
    md5(text) bytes via JVM-side functions; no Python here)."""
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("img-"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.lit("image").alias("modality"),
        # payload = ASCII bytes of the md5 hex digest: DuckDB's sha256
        # only hashes VARCHAR, so the oracle chain is sha256(md5(text))
        F.md5(F.col("text").cast("binary")).cast("binary").alias("payload"),
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k.name: [] for k in FEATURE_SCHEMA.fields}
        for row in pdf.itertuples(index=False):
            payload = bytes(row.payload) if row.payload is not None else b""
            decoder = DECODERS.get(row.modality)
            try:
                meta = decoder(payload) if decoder else {}
            except NotImplementedError:
                meta = {}
            out["doc_id"].append(row.doc_id)
            out["media_ref"].append(row.media_ref)
            out["modality"].append(row.modality)
            out["width"].append(meta.get("width"))
            out["height"].append(meta.get("height"))
            out["n_bytes"].append(len(payload))
            out["sha8"].append(hashlib.sha256(payload).hexdigest()[:8])
        yield pd.DataFrame(out)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction (decode -> dims/digest)."""
    return media.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)
