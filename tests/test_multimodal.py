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
