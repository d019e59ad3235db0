"""The composed at-ingest gate triad, registered as a first-class
pipeline query. Lives in its own module (imported last) because it
composes machinery from ml_train, llm_dedup, AND multimodal — and
multimodal itself imports curation, so registering here avoids an
import cycle while keeping every component single-sourced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.io import load
from etl_spark.plans.registry import register

def _triad_oracle_sql() -> str:
    """Composed oracle for the ingest triad: the logreg training
    replay (zraw under the final weights from s{T+1}), the
    history-containment CTEs (dedup_history_gate's shape on the triad
    slice), and the phash gate CTEs (mm_phash_history_gate's shape,
    renamed t_*) — joined into one verdict row per arriving doc.
    Multiply-referenced CTEs are MATERIALIZED (DuckDB inlines
    otherwise and replays the chain per reference)."""
    from etl_spark.plans.llm_dedup import _shingles_over_sql
    from etl_spark.plans.ml_train import LOGREG_ITERS, _logreg_ctes
    from etl_spark.plans.multimodal import _ASCII_DOCS_SQL, _PHASH_FMT

    s_final = f"s{LOGREG_ITERS + 1}"
    fmt = dict(_PHASH_FMT)
    fmt["ascii_docs"] = _ASCII_DOCS_SQL
    hist_sh = _shingles_over_sql(
        "SELECT MIN(doc_id) AS doc_id, MIN(text) AS text FROM documents "
        "WHERE doc_id % 10 <> 0 GROUP BY md5(text)"
    )
    arr_sh = _shingles_over_sql("SELECT doc_id, text FROM t_arr")
    return f"""{_logreg_ctes()},
    t_arr AS MATERIALIZED (
      SELECT doc_id, text FROM documents
      WHERE {fmt['ascii_docs']} AND length(text) >= 60
        AND doc_id % {fmt['gate_mod']} = 0
    ),
    t_hist_sh AS (
      SELECT shingle, COUNT(*) AS hist_df
      FROM ({hist_sh}) GROUP BY shingle
    ),
    t_bsh AS (SELECT doc_id, shingle FROM ({arr_sh})),
    t_cont AS (
      SELECT b.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(COUNT(h.hist_df) AS BIGINT) AS n_seen
      FROM t_bsh b LEFT JOIN t_hist_sh h USING (shingle)
      GROUP BY b.doc_id
    ),
    t_side AS MATERIALIZED (
      SELECT doc_id, text, length(text) AS n, 1 AS arriving FROM t_arr
      UNION ALL
      SELECT MIN(doc_id), MIN(text), MIN(length(text)), 0
      FROM documents
      WHERE {fmt['ascii_docs']} AND length(text) >= 60
        AND doc_id % {fmt['gate_mod']} <> 0
      GROUP BY md5(text)
    ),
    t_segsum AS (
      SELECT r.doc_id, r.n, g.s,
             ((g.s + 1) * r.n) // {fmt['seg']}
               - (g.s * r.n) // {fmt['seg']} AS slen,
             COALESCE(list_sum(list_transform(
               generate_series((g.s * r.n) // {fmt['seg']} + 1,
                               ((g.s + 1) * r.n) // {fmt['seg']}),
               i -> ord(r.text[i]))), 0) AS ssum
      FROM t_side r, UNNEST(generate_series(0, {fmt['seg_last']})) AS g(s)
    ),
    t_tot AS (
      SELECT doc_id, SUM(ssum) AS dsum FROM t_segsum GROUP BY doc_id
    ),
    t_ph AS MATERIALIZED (
      SELECT g.doc_id,
             CAST(SUM(CASE WHEN g.ssum * g.n >= t.dsum * g.slen
                      THEN (CAST(1 AS BIGINT) << g.s) ELSE 0 END)
                  AS BIGINT) AS phash
      FROM t_segsum g JOIN t_tot t USING (doc_id)
      GROUP BY g.doc_id
    ),
    t_parr AS (
      SELECT s.doc_id, p.phash FROM t_side s JOIN t_ph p USING (doc_id)
      WHERE s.arriving = 1
    ),
    t_phist AS (
      SELECT s.doc_id AS hist_id, p.phash AS hist_phash
      FROM t_side s JOIN t_ph p USING (doc_id) WHERE s.arriving = 0
    ),
    t_ab AS (
      SELECT doc_id, phash, b.band_idx,
             (phash >> ({fmt['band_bits']} * b.band_idx))
               & {fmt['band_mask']} AS band_val
      FROM t_parr,
           UNNEST(generate_series(0, {fmt['band_last']})) AS b(band_idx)
    ),
    t_hb AS (
      SELECT hist_id, hist_phash, b.band_idx,
             (hist_phash >> ({fmt['band_bits']} * b.band_idx))
               & {fmt['band_mask']} AS band_val
      FROM t_phist,
           UNNEST(generate_series(0, {fmt['band_last']})) AS b(band_idx)
    ),
    t_cand AS (
      SELECT DISTINCT a.doc_id, h.hist_id, a.phash, h.hist_phash
      FROM t_ab a JOIN t_hb h ON a.band_idx = h.band_idx
                             AND a.band_val = h.band_val
    ),
    t_best AS (
      SELECT doc_id, min_hamming, hist_id AS nearest_hist_id FROM (
        SELECT doc_id,
               CAST(bit_count(xor(phash, hist_phash)) AS INTEGER)
                 AS min_hamming,
               hist_id,
               ROW_NUMBER() OVER (
                 PARTITION BY doc_id
                 ORDER BY bit_count(xor(phash, hist_phash)), hist_id) AS rn
        FROM t_cand
      ) WHERE rn = 1
    )
    SELECT a.doc_id,
           COALESCE(c.n_shingles, 0) AS n_shingles,
           COALESCE(c.n_seen, 0) AS n_seen,
           CAST(c.n_seen AS DOUBLE) / c.n_shingles AS containment,
           COALESCE(CAST(c.n_seen AS DOUBLE) / c.n_shingles >= 0.8, FALSE)
             AS likely_dup_text,
           b.min_hamming,
           b.nearest_hist_id,
           COALESCE(b.min_hamming <= {fmt['ham']}, FALSE)
             AS likely_dup_phash,
           s.zraw,
           s.dl,
           COALESCE(s.zraw > 0, FALSE) AS gated_positive,
           NOT (COALESCE(CAST(c.n_seen AS DOUBLE) / c.n_shingles >= 0.8,
                         FALSE)
                OR COALESCE(b.min_hamming <= {fmt['ham']}, FALSE)
                OR COALESCE(s.zraw > 0, FALSE)) AS admitted
    FROM t_arr a
    LEFT JOIN t_cont c USING (doc_id)
    LEFT JOIN t_best b USING (doc_id)
    JOIN {s_final} s USING (doc_id)
    ORDER BY a.doc_id
    """


@register(
    "pipeline_ingest_triad",
    oracle=_triad_oracle_sql(),
    doc="The composed at-ingest gate TRIAD, batch form of the "
        "single-state streaming composition (streaming/"
        "ingest_triad.py): every arriving doc (the deterministic "
        "ASCII / len>=60 / doc_id % 10 == 0 ingest slice) gets ONE "
        "verdict row carrying all three gate columns — history-"
        "shingle containment (dedup_history_gate semantics), phash "
        "min-Hamming vs the historical band index "
        "(mm_phash_history_gate semantics), and the TRAINED "
        "ml_logreg_train classifier's margin scored in-row with the "
        "final weights — plus the combined admission verdict. Spark "
        "shape: three branches union into one tagged feature stream "
        "folded by a SINGLE per-doc aggregate (streamed, that is the "
        "only state store; tests/test_streaming_ingest_triad.py "
        "asserts it and bit-exact stream parity). The oracle composes "
        "the three gates' existing replay machinery — unrolled "
        "training CTEs for zraw, shingle containment, byte-math "
        "fingerprint + banding — into one DuckDB statement.",
    tags=("llm", "curation", "dedup", "multimodal", "ml",
          "streaming-twin", "pipeline"),
)
def pipeline_ingest_triad(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _triad_verdicts(spark, sf_dir).orderBy("doc_id")


def _triad_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached per-doc triad verdict table. Two registered
    queries consume the identical composed-gate plan — the per-doc
    triad and its funnel roll-up — and each execution pays the
    containment shingle pass, the phash banding, and the trained-gate
    scoring end to end; one cached verdict frame (one skinny row per
    arriving doc) serves both (r10 opt, guide §2.4/§5 — the same
    shared-subtree pattern as cached_signatures). A bench
    clearCache() evicts it, so every timed rep still builds from
    parquet."""
    from etl_spark.operators.caching import session_cached

    def build() -> DataFrame:
        # Lazy imports: the streaming modules import plan helpers at
        # load time, so module-level imports here would be circular.
        from etl_spark.plans.ml_train import _train
        from etl_spark.plans.multimodal import _ASCII_DOCS
        from etl_spark.streaming.incremental_dedup import history_index
        from etl_spark.streaming.ingest_triad import TRIAD_MOD, ingest_triad
        from etl_spark.streaming.phash_gate import history_phash_index

        arriving = (
            load(spark, sf_dir, "documents")
            .where(_ASCII_DOCS)
            .where(F.length("text") >= 60)
            .filter(F.col("doc_id") % TRIAD_MOD == 0)
            .select(
                "doc_id",
                F.lit(None).cast("timestamp").alias("ingest_ts"),
                "text",
            )
        )
        hist, _feats, _n = _train(spark, sf_dir)
        return ingest_triad(
            arriving,
            history_index(spark, sf_dir, TRIAD_MOD),
            history_phash_index(spark, sf_dir),
            hist[-1],
        )

    return session_cached("ingest_triad_verdicts", spark, sf_dir, build)


def _funnel_oracle_sql() -> str:
    body = _triad_oracle_sql()
    return f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_arriving,
           CAST(SUM(CASE WHEN NOT likely_dup_text THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after_text_gate,
           CAST(SUM(CASE WHEN NOT likely_dup_text
                          AND NOT likely_dup_phash THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after_phash_gate,
           CAST(SUM(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT)
             AS n_admitted,
           CAST(SUM(CASE WHEN admitted THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS admit_rate
    FROM ({body})
    """


@register(
    "pipeline_ingest_funnel",
    oracle=_funnel_oracle_sql(),
    doc="The ingest triad's FUNNEL dashboard: arriving count, "
        "survivors after the text gate, after text+phash, and the "
        "final admitted count with its rate — the one-row summary an "
        "ingest operator alerts on (a gate suddenly eating the corpus "
        "shows up here before anyone reads per-doc verdicts). Built "
        "by funnel_summary over the composed triad's verdicts, so it "
        "rides the same single-aggregate plan plus one global "
        "roll-up; the oracle wraps the full composed triad replay in "
        "one aggregation.",
    tags=("llm", "curation", "dedup", "streaming-twin", "pipeline",
          "quality"),
)
def pipeline_ingest_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_spark.streaming.ingest_triad import funnel_summary

    # Roll up the cached verdict frame directly (no orderBy below an
    # aggregate; the sort is the per-doc query's output contract).
    return funnel_summary(_triad_verdicts(spark, sf_dir))
