"""Multimodal plumbing: the Arrow mapInPandas feature extractor must
agree with a pure-Python recompute of the same payloads, and the real
decode hook must be explicitly stubbed."""

from __future__ import annotations

import hashlib

import pytest

from etl_spark.operators.media import decode_payload, extract_features, with_payload
from etl_spark.io import load
from tests.conftest import SF_DIR


def test_decode_payload_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG...")


def test_extract_features_matches_python_recompute(spark):
    docs = load(spark, SF_DIR, "documents").limit(50)
    feats = {r["doc_id"]: r for r in extract_features(with_payload(docs)).collect()}
    source = {r["doc_id"]: r["text"] for r in docs.collect()}

    assert set(feats) == set(source)
    for doc_id, text in source.items():
        payload = text.encode("utf-8")
        row = feats[doc_id]
        assert row["n_bytes"] == len(payload)
        assert row["n_frames"] == len(payload) // 256 + 1
        assert row["frame_signature"] == hashlib.md5(payload[::64]).hexdigest()
        assert row["mean_byte"] == sum(payload) / len(payload)


def test_payload_metadata_struct(spark):
    docs = with_payload(load(spark, SF_DIR, "documents").limit(5))
    row = docs.select("meta", "payload").first()
    assert row["meta"]["mime"] == "text/plain"
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_sample_frames_matches_python_recompute(spark):
    from etl_spark.operators.media import (
        FRAME_BYTES,
        FRAME_SAMPLE_EVERY,
        sample_frames,
    )

    docs = load(spark, SF_DIR, "documents").limit(20)
    source = {r["doc_id"]: r["text"].encode("utf-8") for r in docs.collect()}
    got = {}
    for r in sample_frames(with_payload(docs)).collect():
        got[(r["doc_id"], r["frame_idx"])] = (r["frame_bytes"], r["frame_md5"])

    expected = {}
    for doc_id, payload in source.items():
        n_frames = len(payload) // FRAME_BYTES + 1
        for idx in range(0, n_frames, FRAME_SAMPLE_EVERY):
            frame = payload[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
            expected[(doc_id, idx)] = (len(frame), hashlib.md5(frame).hexdigest())
    assert got == expected


def test_sample_frames_is_one_to_many_on_long_payloads(spark):
    from etl_spark.operators.media import (
        FRAME_BYTES,
        FRAME_SAMPLE_EVERY,
        sample_frames,
    )

    # sf0.001 documents are all shorter than one frame; the 1:N output
    # shape needs payloads spanning several frames.
    docs = spark.createDataFrame(
        [(i, "x" * (FRAME_BYTES * 4 + 10), "en") for i in range(3)],
        ["doc_id", "text", "lang"],
    )
    rows = sample_frames(with_payload(docs)).collect()
    # 5 frames per doc (4 full + tail), every 2nd sampled → 3 rows/doc.
    assert len(rows) == 3 * 3
    assert {r["frame_idx"] for r in rows} == set(
        range(0, 5, FRAME_SAMPLE_EVERY)
    )


def test_resize_payload_matches_python_recompute(spark):
    from etl_spark.operators.media import RESIZE_TARGET_BYTES, resize_payload

    docs = load(spark, SF_DIR, "documents").limit(20)
    source = {r["doc_id"]: r["text"].encode("utf-8") for r in docs.collect()}
    rows = {r["doc_id"]: r for r in resize_payload(with_payload(docs)).collect()}

    assert set(rows) == set(source)
    for doc_id, payload in source.items():
        r = rows[doc_id]
        resized = payload[:RESIZE_TARGET_BYTES].ljust(RESIZE_TARGET_BYTES, b"\x00")
        assert r["orig_bytes"] == len(payload)
        assert r["new_bytes"] == RESIZE_TARGET_BYTES
        assert r["resized_md5"] == hashlib.md5(resized).hexdigest()
