"""Multimodal (binary) column plumbing.

Media payloads (image/audio/video referenced by the crawl's media spans)
are opaque ``binary`` columns plus typed metadata.  The Spark-side
machinery — schema, Arrow batch shape, ``mapInPandas`` signature,
partition sizing — is real and tested; the actual codec step is STUBBED
(the image/audio libraries are not in this container): ``decode_media``
raises ``NotImplementedError`` unless ``fake=True``, in which case it
produces a deterministic fake feature vector derived from the bytes, so
downstream stages (dedup, similarity) can be exercised end-to-end.

At scale: media blobs dominate bytes, so the table layout keeps blobs in
their own column (parquet column pruning means metadata-only queries never
read them) and ``mapInPandas`` batches are capped by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound executor memory
per batch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id string, kind string, byte_len long, header_hex string, sha1 string"
)
MEDIA_FEATURE_SCHEMA = MEDIA_META_SCHEMA + ", feature array<float>"


def media_metadata(df: DataFrame, id_col: str, blob_col: str, kind_col: str) -> DataFrame:
    """Pure-Catalyst metadata extraction — never decodes the payload."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(kind_col).alias("kind"),
        F.length(F.col(blob_col)).cast("long").alias("byte_len"),
        F.lower(F.hex(F.substring(F.col(blob_col), 1, 8))).alias("header_hex"),
        F.sha1(F.col(blob_col)).alias("sha1"),
    )


def decode_media(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    kind_col: str,
    feature_dim: int = 8,
    fake: bool = False,
) -> DataFrame:
    """mapInPandas decode/feature-extract stage.

    Real codecs (PIL / torchaudio / ffmpeg frame sampling) are NOT
    available in this container — ``fake=False`` raises
    ``NotImplementedError`` from inside the UDF by design.  ``fake=True``
    yields a deterministic md5-derived float vector per blob so the
    pipeline shape (batching, schema, downstream joins) is fully testable.
    """
    cols = df.select(
        F.col(id_col).alias("media_id"),
        F.col(kind_col).alias("kind"),
        F.col(blob_col).alias("blob"),
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg/torchaudio) not installed in "
                    "this environment; pass fake=True for the deterministic "
                    "test feature extractor"
                )
            rows = []
            for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["blob"]):
                b = bytes(blob) if blob is not None else b""
                digest = hashlib.md5(b).digest()
                feat = [digest[i] / 255.0 for i in range(feature_dim)]
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "byte_len": len(b),
                        "header_hex": b[:8].hex(),
                        "sha1": hashlib.sha1(b).hexdigest(),
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "byte_len", "header_hex", "sha1", "feature",
                ],
            )

    return cols.mapInPandas(decode, MEDIA_FEATURE_SCHEMA)


__all__ = ["MEDIA_META_SCHEMA", "MEDIA_FEATURE_SCHEMA", "media_metadata", "decode_media"]
