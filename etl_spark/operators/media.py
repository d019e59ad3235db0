"""Arrow-batched multimodal decode / feature-extract plumbing.

Real pipelines decode image/audio/video payloads with native libs
(PIL, ffmpeg, torchaudio). Those libs are NOT in this container, so
``decode_payload`` raises NotImplementedError and the pipeline runs
with ``fake_features`` — a deterministic, pure-Python stand-in that
exercises the exact same Spark surface: binary column in, fixed-schema
feature struct out, Arrow batch transfer, ``mapInPandas`` over
partition-local batches.

Scale notes: this is a narrow map (no shuffle); batch size is governed
by spark.sql.execution.arrow.maxRecordsPerBatch, and the iterator form
of mapInPandas keeps peak memory to one batch per core regardless of
partition size — the shape that survives 100 TB of payload bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, n_frames int, frame_signature string, "
    "mean_byte double"
)


def decode_payload(payload: bytes) -> object:
    """Decode a real media payload. Requires codec libs absent here."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg-class libraries not present in "
        "this environment; use fake_features for the tested pipeline"
    )


def fake_features(payload: bytes) -> tuple[int, int, str, float]:
    """Deterministic stand-in for decode+feature-extract.

    'Frames' are 256-byte chunks; the signature is the md5 of every
    64th byte; mean_byte is an exact integer-ratio double.
    """
    n_bytes = len(payload)
    n_frames = n_bytes // 256 + 1
    sampled = payload[::64]
    signature = hashlib.md5(sampled).hexdigest()
    mean_byte = (sum(payload) / n_bytes) if n_bytes else 0.0
    return n_bytes, n_frames, signature, mean_byte


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """documents-with-payload → per-doc feature rows via mapInPandas."""

    # Self-contained closure: no references to module-level symbols, so
    # cloudpickle ships it by value and workers need no etl_spark on
    # their PYTHONPATH (the driver process may run from any cwd).
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def _feats(payload: bytes) -> tuple[int, int, str, float]:
            n_bytes = len(payload)
            n_frames = n_bytes // 256 + 1
            signature = _hashlib.md5(payload[::64]).hexdigest()
            mean_byte = (sum(payload) / n_bytes) if n_bytes else 0.0
            return n_bytes, n_frames, signature, mean_byte

        for pdf in it:
            feats = [_feats(p) for p in pdf[payload_col]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [f[0] for f in feats],
                    "n_frames": [f[1] for f in feats],
                    "frame_signature": [f[2] for f in feats],
                    "mean_byte": [f[3] for f in feats],
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(batches, schema=FEATURE_SCHEMA)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the deterministic binary payload + metadata struct."""
    return docs.withColumn("payload", F.encode("text", "utf-8")).withColumn(
        "meta",
        F.struct(
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
        ),
    )
