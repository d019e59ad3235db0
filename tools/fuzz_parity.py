#!/usr/bin/env python
"""Randomized cross-engine parity fuzzer: seeded random corpora driven
through every oracle-paired query whose only input is `documents` or
`events`, compared row/schema/value against DuckDB — the
property-based generalization of tests/test_edge_corpus_parity.py's
fixed 13-doc corpus.

The generators are adversarial on purpose: exact and near duplicates,
empty and NULL text, unicode (CJK/emoji/combining), whitespace
pathologies, single-token spam docs, NULL langs/sources/props,
timestamp ties on the latest-wins key, boundary values. Anything the
fixed edge corpus hand-picks, this draws at random across seeds — an
engine/oracle divergence on ANY drawn corpus is a real bug in one of
the two sides (both engines see byte-identical parquet).

Usage: python tools/fuzz_parity.py [n_seeds] [--docs-only|--events-only]
Writes a per-seed PASS/FAIL summary; exit 1 on any mismatch.
"""

from __future__ import annotations

import os
import random
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tools.contract_compare import compare_result  # noqa: E402

_TBL = re.compile(
    r"\b(region|nation|customer|supplier|part|orders|lineitem|events|"
    r"documents|embeddings)\b"
)

LANGS = ["en", "fr", "de", "es", "zh"]
SOURCES = [f"src{i}" for i in range(20)]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]

UNICODE_SNIPPETS = [
    "你好 世界 测试 文档",
    "emoji 🙂 mixed 🚀 tokens",
    "café déjà vu naïve",
    "niño über straße",
]


def _vocab(rng: random.Random, n: int = 60) -> list[str]:
    return [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randint(2, 8)))
        for _ in range(n)
    ]


def gen_documents(rng: random.Random, n: int) -> list[tuple]:
    vocab = _vocab(rng)
    rows: list[tuple] = []
    texts: list[str] = []
    for doc_id in range(n):
        roll = rng.random()
        if roll < 0.05:
            text = ""
        elif roll < 0.08:
            text = None
        elif roll < 0.13 and texts:
            text = rng.choice(texts)  # exact duplicate
        elif roll < 0.20 and texts:
            toks = rng.choice(texts).split(" ")  # near duplicate
            if toks:
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
            text = " ".join(toks)
        elif roll < 0.25:
            text = rng.choice(UNICODE_SNIPPETS)
        elif roll < 0.30:
            text = " " + "  ".join(rng.choice(vocab) for _ in range(3)) + " "
        elif roll < 0.35:
            text = " ".join([rng.choice(vocab)] * rng.randint(1, 40))  # spam
        else:
            text = " ".join(
                rng.choice(vocab) for _ in range(rng.randint(1, 80))
            )
        if text is not None and text != "" and not text.isspace():
            texts.append(text)
        lang = None if rng.random() < 0.03 else rng.choice(LANGS)
        source = None if rng.random() < 0.03 else rng.choice(SOURCES)
        n_chars = None if text is None else len(text)
        rows.append((doc_id, text, lang, source, n_chars))
    return rows


def gen_embeddings(rng: random.Random, n: int) -> list[tuple]:
    import struct

    def f32(x: float) -> float:
        # parquet stores float32; pre-round so Python-side expectations
        # match what both engines read back
        return struct.unpack("f", struct.pack("f", x))[0]

    DIM = 64
    rows: list[tuple] = []
    vecs: list[list[float]] = []
    for vec_id in range(n):
        roll = rng.random()
        if roll < 0.05:
            v = [0.0] * DIM  # zero vector (cosine guard path)
        elif roll < 0.13 and vecs:
            v = list(rng.choice(vecs))  # exact duplicate
        elif roll < 0.18 and vecs:
            v = list(rng.choice(vecs))  # near duplicate
            v[rng.randrange(DIM)] = f32(rng.uniform(-0.6, 0.6))
        elif roll < 0.21:
            v = [f32(rng.uniform(-1e-6, 1e-6)) for _ in range(DIM)]
        elif roll < 0.24:
            v = [f32(rng.uniform(-100.0, 100.0)) for _ in range(DIM)]
        else:
            v = [f32(rng.uniform(-0.6, 0.6)) for _ in range(DIM)]
        vecs.append(v)
        rows.append((vec_id, v, rng.randint(0, 9)))
    return rows


def gen_events(rng: random.Random, n: int) -> list[tuple]:
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows: list[tuple] = []
    prev_ts: list[datetime.datetime] = []
    for event_id in range(n):
        roll = rng.random()
        if roll < 0.04 and prev_ts:
            ts = rng.choice(prev_ts)  # exact timestamp tie
        else:
            ts = base + datetime.timedelta(
                microseconds=rng.randint(0, 89 * 24 * 3600 * 1_000_000)
            )
        prev_ts.append(ts)
        user_id = rng.randint(0, 30)
        event_type = rng.choice(EVENT_TYPES)
        value = round(rng.uniform(0.01, 500.0), 2)
        if rng.random() < 0.03:
            value = rng.choice([0.01, 500.0, 0.02])
        props = None if rng.random() < 0.05 else '{"k": %d}' % rng.randint(0, 99)
        rows.append((event_id, ts, user_id, event_type, value, props))
    return rows


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_seeds = int(args[0]) if args else 5
    docs_only = "--docs-only" in sys.argv
    events_only = "--events-only" in sys.argv

    from etl_spark.plans import REGISTRY
    from etl_spark.session import get_spark, tune_session

    spark = get_spark("fuzz-parity")
    tune_session(spark)

    doc_queries, ev_queries, emb_queries = [], [], []
    for name, q in sorted(REGISTRY.items()):
        if q.oracle is None:
            continue
        tables = set(_TBL.findall(q.oracle))
        if tables == {"documents"}:
            doc_queries.append(name)
        elif tables == {"events"}:
            ev_queries.append(name)
        elif tables == {"embeddings"}:
            emb_queries.append(name)
    plan = []
    if not events_only:
        plan.append(("documents", doc_queries, gen_documents,
                     "doc_id bigint, text string, lang string, "
                     "source string, n_chars bigint", 120))
    if not docs_only and not events_only:
        plan.append(("embeddings", emb_queries, gen_embeddings,
                     "vec_id bigint, embedding array<float>, label int",
                     150))
    if not docs_only:
        plan.append(("events", ev_queries, gen_events,
                     "event_id bigint, ts timestamp, user_id bigint, "
                     "event_type string, value double, props string", 400))

    import etl_spark.plans.llm_dedup as dd

    total_fail = 0
    for seed in range(n_seeds):
        rng = random.Random(1000 + seed)
        for table, queries, gen, schema, n_rows in plan:
            d = tempfile.mkdtemp(prefix=f"fuzz_{table}_{seed}_")
            try:
                spark.createDataFrame(gen(rng, n_rows), schema).coalesce(
                    1
                ).write.parquet(f"{d}/{table}.parquet")
                # per-corpus caches must not leak across corpora
                for df in dd._SHINGLE_CACHE.values():
                    df.unpersist()
                dd._SHINGLE_CACHE.clear()
                for df in dd._BANDS_CACHE.values():
                    df.unpersist()
                dd._BANDS_CACHE.clear()
                con = duckdb.connect()
                con.execute("SET TimeZone='UTC'")
                con.execute(
                    f"CREATE VIEW {table} AS SELECT * FROM "
                    f"'{d}/{table}.parquet/*.parquet'"
                )
                n_fail = 0
                t0 = time.time()
                for name in queries:
                    q = REGISTRY[name]
                    try:
                        spdf = q.builder(spark, d).toPandas()
                        ddf = con.execute(q.oracle).df()
                    except Exception as ex:
                        print(f"FAIL seed={seed} {name}: raised "
                              f"{type(ex).__name__}: {str(ex)[:300]}")
                        n_fail += 1
                        continue
                    r = compare_result(spdf, ddf, max_diffs=3)
                    if not r["ok"]:
                        print(f"FAIL seed={seed} {name}: spark={len(spdf)} "
                              f"duck={len(ddf)} cols={r['cols_ok']} "
                              f"dtype={r['dtype_ok']}{r['dtype_detail']} "
                              f"vals={r['val_ok']}")
                        for x, y in r["diffs"]:
                            print(f"  spark={x}\n  duck ={y}")
                        n_fail += 1
                con.close()
                status = "PASS" if n_fail == 0 else f"{n_fail} FAILURES"
                print(f"seed={seed} {table}: {len(queries)} queries "
                      f"{status}  ({time.time()-t0:.0f}s)")
                total_fail += n_fail
            finally:
                shutil.rmtree(d, ignore_errors=True)

    print("FUZZ ALL GREEN" if total_fail == 0 else
          f"FUZZ {total_fail} TOTAL FAILURES")
    sys.exit(1 if total_fail else 0)


if __name__ == "__main__":
    main()
