"""Fences for text_bm25_rank (plans/llm_text.py): scoring-function
properties that oracle row-hash parity cannot distinguish from a lucky
constant."""

from __future__ import annotations

from etl_spark.plans.llm_text import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOP_N,
    text_bm25_rank,
)
from tests.conftest import SF_DIR


def _py_bm25(tf: int, df: int, dl: int, n_docs: int, total_dl: int) -> float:
    idf = (n_docs - df + 0.5) / (df + 0.5)
    norm = (dl * n_docs) / total_dl
    return idf * (tf * (BM25_K1 + 1.0)) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * norm))


def test_bm25_top_n_shape_and_order(spark):
    rows = text_bm25_rank(spark, SF_DIR).collect()
    assert len(rows) == BM25_TOP_N
    assert [r["rnk"] for r in sorted(rows, key=lambda r: r["rnk"])] == list(
        range(1, BM25_TOP_N + 1)
    )
    ordered = sorted(rows, key=lambda r: r["rnk"])
    for a, b in zip(ordered, ordered[1:]):
        assert (a["score"], -a["doc_id"]) >= (b["score"], -b["doc_id"])
        assert a["score"] > 0


def test_bm25_matches_python_replay(spark, duck):
    """Replay the full scoring pipeline in plain Python over DuckDB tf
    tables: every top-N score must equal the replay bit-for-bit modulo
    the documented fixed addition order."""
    n_docs, total_dl = duck.execute(
        "SELECT COUNT(*), SUM(len(string_split(text,' '))) FROM documents"
    ).fetchone()
    term_list = ", ".join(f"'{t}'" for t in BM25_TERMS)
    tf_rows = duck.execute(
        f"""
        SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT)
        FROM (SELECT doc_id, len(string_split(text,' ')) AS dl,
                     unnest(string_split(text,' ')) AS term FROM documents)
        WHERE term IN ({term_list}) GROUP BY doc_id, dl, term
        """
    ).fetchall()
    df: dict[str, int] = {}
    for _, _, term, _ in tf_rows:
        df[term] = df.get(term, 0) + 1
    per_doc: dict[int, dict] = {}
    for doc_id, dl, term, tf in tf_rows:
        d = per_doc.setdefault(doc_id, {"dl": dl, "s": {}})
        d["s"][term] = _py_bm25(tf, df[term], dl, int(n_docs), int(total_dl))
    scores = {}
    for doc_id, d in per_doc.items():
        s = [d["s"].get(t, 0.0) for t in BM25_TERMS]
        scores[doc_id] = (s[0] + s[1]) + s[2]
    got = {r["doc_id"]: r["score"] for r in text_bm25_rank(spark, SF_DIR).collect()}
    assert got
    for doc_id, score in got.items():
        assert scores[doc_id] == score  # exact: same IEEE expression tree


def test_bm25_tf_monotone_and_rare_term_weighting():
    """Pure-formula fences: score rises with tf, falls with dl, and a
    rarer term outweighs a common one at equal tf/dl."""
    assert _py_bm25(3, 100, 50, 5000, 250000) > _py_bm25(2, 100, 50, 5000, 250000)
    assert _py_bm25(2, 100, 80, 5000, 250000) < _py_bm25(2, 100, 50, 5000, 250000)
    assert _py_bm25(2, 10, 50, 5000, 250000) > _py_bm25(2, 1000, 50, 5000, 250000)
