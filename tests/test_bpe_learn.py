"""BPE merge learning fences: the relational greedy-replace must match
a pure-Python Sennrich-style reference on the real corpus, and the
islands/even-offset rule must handle the overlap case (sym_a == sym_b
runs) exactly like non-overlapping left-to-right replacement."""

from __future__ import annotations

from collections import Counter

import duckdb

from etl_spark.plans.bpe import BPE_MERGES, text_bpe_learn
from tests.conftest import SF_DIR


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook BPE learner (Sennrich et al. 2016 pseudocode): count
    adjacent pairs over word types weighted by frequency, merge the
    best pair greedily left-to-right, repeat."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # tie-break: count DESC, pair ASC — the registered contract
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = c
        vocab = new_vocab
    return merges


def test_bpe_learn_matches_reference_implementation(spark):
    con = duckdb.connect()
    wc = dict(
        con.execute(
            f"""
            SELECT t, COUNT(*) FROM (
              SELECT unnest(string_split(text, ' ')) AS t
              FROM '{SF_DIR}/documents.parquet' WHERE text IS NOT NULL)
            GROUP BY t
            """
        ).fetchall()
    )
    want = _reference_bpe(wc, BPE_MERGES)
    got = [
        (r["sym_a"], r["sym_b"], r["pair_weight"])
        for r in text_bpe_learn(spark, SF_DIR).collect()
    ]
    assert got == want


def test_bpe_merge_overlap_semantics(spark):
    """A run of the same symbol must merge floor(L/2) times
    left-to-right: 'aaaa' -> [aa, aa], 'aaa' -> [aa, a]."""
    from etl_spark.plans.bpe import _apply_merge, _sym0

    wc = spark.createDataFrame(
        [("aaaa", 1), ("aaa", 1), ("baab", 1)], "w string, wcnt bigint"
    )
    out = _apply_merge(_sym0(wc), "a", "a").collect()
    seqs = {}
    for r in sorted(out, key=lambda r: (r["w"], r["pos"])):
        seqs.setdefault(r["w"], []).append(r["s"])
    assert seqs == {
        "aaaa": ["aa", "aa"],
        "aaa": ["aa", "a"],
        "baab": ["b", "aa", "b"],
    }
