"""Adversarial-corpus parity: every oracle-paired query over the
`documents` table must agree with DuckDB on pathological inputs —
empty strings, single tokens, sub-shingle docs, unicode (CJK/emoji/
combining), repeated spaces, and NULL text. Round 2's short-text
trigram divergence (descending F.sequence) is exactly the bug class
this suite exists to catch before the fixture data ever exercises it."""

from __future__ import annotations

import duckdb
import pytest

import etl_spark.plans.llm_dedup as dd
from etl_spark.operators.caching import evict
from etl_spark.plans import REGISTRY

EDGE_DOCS = [
    # (doc_id, text, lang, source)
    (0, "", "en", "edge"),
    (1, "x", "en", "edge"),
    (2, "two tokens", "en", "edge"),
    (3, "exactly three tokens", "fr", "edge"),
    (4, "a  b", "en", "edge"),  # double space → empty token both engines
    (5, " leading and trailing ", "de", "edge"),
    (6, "你好 世界 你好 世界 测试", "zh", "edge"),
    (7, "emoji 🙂 mixed ascii and 🙂 again", "en", "edge"),
    (8, "café combining accent café repeated", "fr", "edge"),
    (9, "the the the the the the the the", "en", "edge"),
    (10, None, "en", "edge"),  # NULL text
    (11, "normal looking document with several plain tokens here", "en", "edge"),
    (12, "normal looking document with several plain tokens here", "es", "edge"),
]

# Every oracle-paired query whose only input is `documents`.
DOC_QUERIES = [
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_token_stats",
    "text_top_terms",
    "text_lang_source_rollup",
    "text_quality_score",
    "text_fingerprint",
    "text_langid_ngram",
    "text_token_count_bpe_regex",
    "text_tfidf_top_terms",
    "mm_binary_payload",
    "udf_token_count_pandas",
    "udtf_chunk_windows",
    "sample_stratified_docs",
    "text_redact_denylist",
    "text_bigram_counts",
    "text_repetition_signals",
    "text_chunk_windows",
    "dedup_containment_pairs",
    "pipeline_curate_corpus",
    "text_oov_rate",
    "text_bigram_lm_score",
    "text_decontam_pairs",
    "text_word_entropy",
    "text_cms_term_counts",
    "text_ngram_novelty",
    "scalar_array_ops",
    "curation_pack_sequences",
    "curation_shard_assignment",
    "sample_mixture_weights",
    "dedup_rate_by_source",
    "dedup_minhash_error",
    "graph_dup_triangles",
    "dedup_crosslingual_content",
    "curation_gate_funnel",
    "text_zipf_fit",
    "text_vocab_growth",
    "dedup_pressure_by_lang",
    "dq_quality_by_segment",
    "curation_strip_dup_segments",
    "curation_train_val_split",
    "mm_payload_dedup",
    "mm_extract_features",
    "mm_frame_sample",
    "mm_resize_payload",
    "dedup_clusters",
    "curation_context_length_sweep",
    "dedup_threshold_sweep",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_corpus")
    rows = [
        (i, t, lang, src, len(t) if t is not None else None)
        for i, t, lang, src in EDGE_DOCS
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    evict()
    yield str(d)
    evict()


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # Spark writes a parquet DIRECTORY; DuckDB needs the part-file glob.
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{edge_dir}/documents.parquet/*.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_edge_corpus_matches_oracle(spark, edge_dir, edge_duck, name):
    q = REGISTRY[name]
    spdf = q.builder(spark, edge_dir).toPandas()
    ddf = edge_duck.execute(q.oracle).df()
    assert sorted(spdf.columns) == sorted(ddf.columns)
    assert len(spdf) == len(ddf), f"{name}: {len(spdf)} vs {len(ddf)} rows"
    cols = sorted(spdf.columns)
    a = sorted(map(tuple, spdf[cols].astype(str).values.tolist()))
    b = sorted(map(tuple, ddf[cols].astype(str).values.tolist()))
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
    assert a == b, f"{name}: first mismatches " + "; ".join(
        f"spark={a[i]} duck={b[i]}" for i in mism
    )
