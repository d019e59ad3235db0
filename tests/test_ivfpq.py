"""IVF-PQ fences: the Spark pipeline must match a pure-Python replay
of the whole index (train -> residual-encode -> probe -> ADC) exactly,
and the ADC approximation must be MEASURABLY informative — enriched
top-k recall over random candidate selection and positive correlation
with the true distances. Uniform-random fixture vectors are ANN's
worst case (no cluster structure for IVF to exploit, residuals are
white noise for PQ), so the bounds here are enrichment-relative, the
same philosophy as tests/test_ann_recall.py."""

from __future__ import annotations

import numpy as np
import pytest

from etl_spark.io import load
from etl_spark.plans import REGISTRY
from etl_spark.plans.llm_similarity import (
    PQ_KS,
    PQ_M,
    PQ_QUERY_HI,
    PQ_QUERY_LO,
    PQ_SUBDIM,
    PQ_TOPK,
    quantize,
)
from etl_spark.plans.ml import K_CLUSTERS, N_PROBE
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def corpus(spark):
    rows = (
        load(spark, SF_DIR, "embeddings")
        .select("vec_id", quantize(F.col("embedding")).alias("q"))
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    V = np.array([r["q"] for r in rows], dtype=np.int64)
    return ids, V


def _assign(C, X):
    d2 = (X * X).sum(1)[:, None] + (C * C).sum(1)[None, :] - 2 * (X @ C.T)
    return d2.argmin(1), d2


def _replay(ids, V):
    """Pure-Python IVF-PQ: returns (cls, cents, CB, codes)."""
    seeds = V[ids < K_CLUSTERS].astype(np.int64)
    a0, _ = _assign(seeds, V)
    cents = seeds.copy()
    for c in range(K_CLUSTERS):
        m = a0 == c
        if m.any():
            sx, n = V[m].sum(0), m.sum()
            cents[c] = np.where(
                sx >= 0, (2 * sx + n) // (2 * n), -((-2 * sx + n) // (2 * n))
            )
    cls, _ = _assign(cents, V)
    R = (V - cents[cls]).reshape(-1, PQ_M, PQ_SUBDIM)
    CB = R[ids < PQ_KS].copy()
    codes = np.empty((len(V), PQ_M), dtype=np.int64)
    for m in range(PQ_M):
        codes[:, m] = (
            ((R[:, None, m, :] - CB[None, :, m, :]) ** 2).sum(2)
        ).argmin(1)
    return cls, cents, CB, codes


def _adc_rows(ids, V, cls, cents, CB, codes):
    """Per query: (candidate ids, adc distances, true d2) over probed
    cells, plus the query's probe list."""
    out = {}
    for q in range(PQ_QUERY_LO, PQ_QUERY_HI):
        qv = V[ids == q][0]
        dq = (qv * qv).sum() + (cents * cents).sum(1) - 2 * (cents @ qv)
        probe = np.lexsort((np.arange(K_CLUSTERS), dq))[:N_PROBE]
        cid, adc, true = [], [], []
        for cell in probe:
            rq = (qv - cents[cell]).reshape(PQ_M, PQ_SUBDIM)
            lut = ((rq[:, None, :] - CB.transpose(1, 0, 2)) ** 2).sum(2)
            sel = (cls == cell) & (ids != q)
            cid.append(ids[sel])
            adc.append(lut[np.arange(PQ_M)[None, :], codes[sel]].sum(1))
            true.append(((V[sel] - qv) ** 2).sum(1))
        out[q] = (
            np.concatenate(cid),
            np.concatenate(adc),
            np.concatenate(true),
            probe,
        )
    return out


def test_spark_matches_python_replay_exactly(spark, corpus):
    ids, V = corpus
    cls, cents, CB, codes = _replay(ids, V)
    per_q = _adc_rows(ids, V, cls, cents, CB, codes)
    expected = set()
    for q, (cid, adc, _, probe) in per_q.items():
        top = np.lexsort((cid, adc))[:PQ_TOPK]
        cellof = {int(i): int(c) for i, c in zip(ids, cls)}
        for rnk, t in enumerate(top, start=1):
            expected.add(
                (q, int(cid[t]), cellof[int(cid[t])], int(adc[t]), rnk)
            )
    got = {
        (r.query_id, r.vec_id, r.cell, r.adc_d2, r.rnk)
        for r in REGISTRY["sim_ivfpq_search"].builder(spark, SF_DIR).collect()
    }
    assert got == expected


def test_adc_enriches_over_random_candidate_pick(spark, corpus):
    ids, V = corpus
    cls, cents, CB, codes = _replay(ids, V)
    per_q = _adc_rows(ids, V, cls, cents, CB, codes)
    enrich, corr = [], []
    for q, (cid, adc, true, _) in per_q.items():
        approx = set(cid[np.lexsort((cid, adc))[:PQ_TOPK]].tolist())
        exact = set(cid[np.lexsort((cid, true))[:PQ_TOPK]].tolist())
        recall = len(approx & exact) / PQ_TOPK
        random_recall = PQ_TOPK / len(cid)  # expected for a blind pick
        enrich.append(recall / random_recall)
        corr.append(np.corrcoef(adc.astype(float), true.astype(float))[0, 1])
    # Measured on the fixture: enrichment ~2.5-6x, Pearson ~0.42-0.51.
    assert sum(enrich) / len(enrich) >= 2.0, enrich
    assert min(corr) >= 0.25, corr


def test_residual_codebook_tightens_vs_flat_codebook(spark, corpus):
    # The reason IVF-PQ encodes residuals: quantization error of the
    # residual codebook must beat the same-budget flat codebook on the
    # same vectors (residuals concentrate near zero).
    ids, V = corpus
    cls, cents, CB, codes = _replay(ids, V)
    R = (V - cents[cls]).reshape(-1, PQ_M, PQ_SUBDIM)
    res_err = 0
    for m in range(PQ_M):
        d = ((R[:, None, m, :] - CB[None, :, m, :]) ** 2).sum(2)
        res_err += int(d.min(1).sum())
    Vr = V.reshape(-1, PQ_M, PQ_SUBDIM)
    FCB = Vr[ids < PQ_KS].copy()
    flat_err = 0
    for m in range(PQ_M):
        d = ((Vr[:, None, m, :] - FCB[None, :, m, :]) ** 2).sum(2)
        flat_err += int(d.min(1).sum())
    assert res_err < flat_err, (res_err, flat_err)


def test_probe_covers_nprobe_cells_only(spark, corpus):
    ids, V = corpus
    cls, cents, _, _ = _replay(ids, V)
    rows = REGISTRY["sim_ivfpq_search"].builder(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, set()).add(r.cell)
    for q, cells in by_q.items():
        assert len(cells) <= N_PROBE
        qv = V[ids == q][0]
        dq = (qv * qv).sum() + (cents * cents).sum(1) - 2 * (cents @ qv)
        probe = set(
            np.lexsort((np.arange(K_CLUSTERS), dq))[:N_PROBE].tolist()
        )
        assert cells <= probe, (q, cells, probe)


def _recall_curve(ids, V, cls, cents, CB, codes, nprobe, rerank=None):
    """Mean absolute recall@PQ_TOPK vs GLOBAL brute force (not just
    probed candidates) and mean scan fraction, at the given nprobe.
    With ``rerank=R``, the ADC top-R shortlist is re-ordered by exact
    distance before taking top-k (the standard IVF-PQ refine step)."""
    recs, fracs = [], []
    for q in range(PQ_QUERY_LO, PQ_QUERY_HI):
        qv = V[ids == q][0]
        dq = (qv * qv).sum() + (cents * cents).sum(1) - 2 * (cents @ qv)
        probe = np.lexsort((np.arange(K_CLUSTERS), dq))[:nprobe]
        sel = np.isin(cls, probe) & (ids != q)
        cid = ids[sel]
        lutc = {
            c: (
                ((qv - cents[c]).reshape(PQ_M, PQ_SUBDIM)[:, None, :]
                 - CB.transpose(1, 0, 2)) ** 2
            ).sum(2)
            for c in probe
        }
        adc = np.array([
            lutc[cls[i]][np.arange(PQ_M), codes[i]].sum()
            for i in np.where(sel)[0]
        ])
        if rerank is None:
            approx = set(cid[np.lexsort((cid, adc))[:PQ_TOPK]].tolist())
        else:
            short = cid[np.lexsort((cid, adc))[:rerank]]
            d_exact = np.array(
                [((V[ids == i][0] - qv) ** 2).sum() for i in short]
            )
            approx = set(
                short[np.lexsort((short, d_exact))[:PQ_TOPK]].tolist()
            )
        true_all = ((V - qv) ** 2).sum(1)
        mask = ids != q
        order = np.lexsort((ids[mask], true_all[mask]))
        exact = set(ids[mask][order][:PQ_TOPK].tolist())
        recs.append(len(approx & exact) / PQ_TOPK)
        fracs.append(sel.sum() / (len(ids) - 1))
    return float(np.mean(recs)), float(np.mean(fracs))


def test_absolute_recall_curve_over_nprobe_sweep(spark, corpus):
    """The ANN-without-a-recall-number gap: absolute recall@10 against
    GLOBAL brute force, swept over nprobe. The numpy replay IS the
    Spark pipeline's answer (test_spark_matches_python_replay_exactly
    pins them equal), so the curve measured here is the shipped
    query's curve. Measured on the sf0.001 fixture (uniform-random
    vectors — PQ's worst case, residuals are white noise):

        nprobe=1: recall 0.125  scan 12%
        nprobe=2: recall 0.200  scan 25%   <- shipped N_PROBE
        nprobe=4: recall 0.225  scan 50%
        nprobe=8: recall 0.200  scan 100%  <- ADC fidelity ceiling

    Two structural facts fenced below: (a) recall rises from nprobe=1
    to the shipped setting, and (b) at N_PROBE=2 the cell pruning
    already retains >= 90% of the full-scan-ADC ceiling — i.e. the
    recall loss is the PQ code's, NOT the IVF pruning's, so at scale
    you spend memory on a finer codebook (PQ_KS 16 -> 256) or rerank,
    not on more probes."""
    ids, V = corpus
    cls, cents, CB, codes = _replay(ids, V)
    curve = {
        n: _recall_curve(ids, V, cls, cents, CB, codes, n)
        for n in (1, 2, 4, K_CLUSTERS)
    }
    ceiling, _ = curve[K_CLUSTERS]  # full scan = pure-ADC fidelity
    assert ceiling >= 0.15, curve
    assert curve[2][0] >= curve[1][0], curve
    assert curve[N_PROBE][0] >= 0.9 * ceiling, curve
    # And the scan fraction must actually shrink with fewer probes —
    # the compression side of the trade-off.
    assert curve[1][1] < curve[2][1] < curve[4][1] <= 1.0, curve


def test_exact_rerank_recovers_adc_recall_loss(spark, corpus):
    """The documented scale path past the ADC ceiling: re-ranking the
    ADC top-50 shortlist by exact distance (50 full vectors per query
    — still ~10x fewer reads than a brute-force scan at this corpus,
    arbitrarily fewer at scale) must lift recall well above raw ADC
    top-10. Measured: 0.200 -> 0.425 at nprobe=2."""
    ids, V = corpus
    cls, cents, CB, codes = _replay(ids, V)
    raw, _ = _recall_curve(ids, V, cls, cents, CB, codes, N_PROBE)
    rer, _ = _recall_curve(
        ids, V, cls, cents, CB, codes, N_PROBE, rerank=5 * PQ_TOPK
    )
    assert rer >= raw + 0.1, (raw, rer)


def test_registered_rerank_matches_python_replay_exactly(spark, corpus):
    """The registered sim_ivfpq_rerank = ADC top-PQ_RERANK shortlist
    re-ordered by exact lattice L2 — pinned bit-equal to the numpy
    replay, which ties the recall numbers in SCALING.md to the
    shipped query."""
    from etl_spark.plans.llm_similarity import PQ_RERANK

    ids, V = corpus
    cls, cents, CB, codes = _replay(ids, V)
    per_q = _adc_rows(ids, V, cls, cents, CB, codes)
    expected = set()
    for q, (cid, adc, _, _probe) in per_q.items():
        short = np.lexsort((cid, adc))[:PQ_RERANK]
        sid, sadc = cid[short], adc[short]
        qv = V[ids == q][0]
        d_exact = np.array(
            [((V[ids == i][0] - qv) ** 2).sum() for i in sid]
        )
        top = np.lexsort((sid, d_exact))[:PQ_TOPK]
        for rnk, t in enumerate(top, start=1):
            expected.add(
                (q, int(sid[t]), int(d_exact[t]), int(sadc[t]), rnk)
            )
    got = {
        (r.query_id, r.vec_id, r.exact_d2, r.adc_d2, r.rnk)
        for r in REGISTRY["sim_ivfpq_rerank"].builder(spark, SF_DIR).collect()
    }
    assert got == expected
