"""Fences for dedup_prefix_filter_pairs: completeness against the
unfiltered posting-list path and the candidate-volume reduction that
justifies the prefix index's existence."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.plans.llm_dedup import (
    PREFIX_JACCARD_T,
    dedup_jaccard_pairs,
    dedup_prefix_filter_pairs,
    ordered_pair_structs,
    posting_lists,
    shingles_df,
)
from tests.conftest import SF_DIR


def _pairset(rows):
    return {(r["doc_a"], r["doc_b"]): r["n_common"] for r in rows}


def test_prefix_path_equals_full_posting_path(spark):
    """Every pair the threshold-0.05 posting-list query scores at
    J >= PREFIX_JACCARD_T must come out of the prefix path with the
    SAME intersection count — no qualifying pair lost to the prefix
    index, none invented by it."""
    full = _pairset(
        dedup_jaccard_pairs(spark, SF_DIR)
        .filter(F.col("jaccard") >= PREFIX_JACCARD_T)
        .collect()
    )
    pref = _pairset(dedup_prefix_filter_pairs(spark, SF_DIR).collect())
    assert pref == full
    assert pref, "fixture must contain pairs above the prefix threshold"


def test_prefix_index_is_materially_smaller(spark):
    """The reason the query exists: candidate volume from the prefix
    index must be well below the full posting-list pair stream. (This
    is a structural property of rarest-first prefixes, not data luck —
    but measure it, don't assert it by argument.)"""
    full_cands = (
        posting_lists(spark, SF_DIR)
        .filter(F.size("docs") >= 2)
        .select(F.explode(ordered_pair_structs(F.col("docs"))).alias("p"))
        .count()
    )
    sh = shingles_df(spark, SF_DIR)
    df_tbl = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    arrs = (
        sh.join(df_tbl, "shingle")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "shingle"))).alias("arr"))
        .select("doc_id", F.size("arr").alias("n_sh"),
                F.transform("arr", lambda x: x["shingle"]).alias("shingles"))
    )
    plen = F.col("n_sh") - F.ceil(
        F.lit(PREFIX_JACCARD_T) * F.col("n_sh")
    ).cast("int") + 1
    pref_cands = (
        arrs.select(F.explode(F.slice("shingles", 1, plen)).alias("shingle"),
                    "doc_id")
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") >= 2)
        .select(F.explode(ordered_pair_structs(F.col("docs"))).alias("p"))
        .count()
    )
    assert pref_cands < full_cands / 2, (
        f"prefix index emitted {pref_cands} candidates vs {full_cands} "
        "full posting-list candidates — the filter is not filtering"
    )
