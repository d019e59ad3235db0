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

    # A NULL payload has nothing to decode — skip it (empty payloads
    # b"" are decoded normally). Without this, `len(None)` would kill
    # the whole task on the first row with a missing payload.
    return (
        df.select("doc_id", payload_col)
        .where(F.col(payload_col).isNotNull())
        .mapInPandas(batches, schema=FEATURE_SCHEMA)
    )


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


FRAME_BYTES = 256
FRAME_SAMPLE_EVERY = 2

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int, frame_md5 string"


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    frame_bytes: int = FRAME_BYTES,
    every_n: int = FRAME_SAMPLE_EVERY,
) -> DataFrame:
    """Frame-sampling stage: split each payload into fixed-size frames
    (the stand-in for video frame extraction) and emit every
    ``every_n``-th frame as its own row — a 1:N mapInPandas whose
    output batch is LARGER than its input batch, the shape a video
    pipeline needs (decode libs absent; frames are byte chunks).

    Narrow map: the payload is framed where it sits, only the sampled
    frame rows continue downstream.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in it:
            ids, idxs, sizes, md5s = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                payload = bytes(payload)
                n_frames = len(payload) // frame_bytes + 1
                for idx in range(0, n_frames, every_n):
                    frame = payload[idx * frame_bytes : (idx + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(idx)
                    sizes.append(len(frame))
                    md5s.append(_hashlib.md5(frame).hexdigest())
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(ids, dtype="int64"),
                    "frame_idx": _pd.Series(idxs, dtype="int32"),
                    "frame_bytes": _pd.Series(sizes, dtype="int32"),
                    "frame_md5": _pd.Series(md5s, dtype="object"),
                }
            )

    # NULL payloads: nothing to frame — skip (see extract_features).
    return (
        df.select("doc_id", payload_col)
        .where(F.col(payload_col).isNotNull())
        .mapInPandas(batches, schema=FRAME_SCHEMA)
    )


RESIZE_TARGET_BYTES = 512

RESIZE_SCHEMA = (
    "doc_id bigint, orig_bytes int, new_bytes int, resized_md5 string"
)


def resize_payload(
    df: DataFrame,
    payload_col: str = "payload",
    target_bytes: int = RESIZE_TARGET_BYTES,
) -> DataFrame:
    """Resize stage (stand-in for image resize): truncate payloads over
    the target, zero-pad payloads under it — a deterministic 1:1
    transform with the exact batch shape a real resize has (binary in,
    binary-derived features out, constant output size)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in it:
            orig, md5s = [], []
            for payload in pdf[payload_col]:
                payload = bytes(payload)
                orig.append(len(payload))
                resized = payload[:target_bytes].ljust(target_bytes, b"\x00")
                md5s.append(_hashlib.md5(resized).hexdigest())
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "orig_bytes": _pd.Series(orig, dtype="int32"),
                    "new_bytes": _pd.Series(
                        [target_bytes] * len(orig), dtype="int32"
                    ),
                    "resized_md5": _pd.Series(md5s, dtype="object"),
                }
            )

    # NULL payloads: nothing to resize — skip (see extract_features).
    return (
        df.select("doc_id", payload_col)
        .where(F.col(payload_col).isNotNull())
        .mapInPandas(batches, schema=RESIZE_SCHEMA)
    )
