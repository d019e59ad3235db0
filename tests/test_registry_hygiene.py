"""Registry meta-invariants: every registered query must carry the
documentation the judge and future maintainers rely on, and every
oracle must reference only real testdata tables (a typo'd table name
in an oracle would surface as a confusing DuckDB binder error at
driver time — catch it at test time instead)."""

from __future__ import annotations

import re

import pytest

from etl_spark.io import TABLES
from etl_spark.plans import REGISTRY

# Words that look like FROM/JOIN targets but aren't base tables
# (CTE names, subquery aliases, generated relations).
_NON_TABLE_OK = re.compile(r"^[a-z_0-9]+$")


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_is_documented(name):
    q = REGISTRY[name]
    assert q.doc and len(q.doc) >= 40, f"{name}: missing/terse doc"
    assert q.tags, f"{name}: no tags"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_references_known_tables(name):
    q = REGISTRY[name]
    if q.oracle is None:
        return
    # CTE names defined in this oracle are legitimate relation names.
    ctes = set(re.findall(r"(?:WITH|,)\s*([a-z_0-9]+)\s+AS\s*\(", q.oracle))
    refs = set(
        m.lower()
        for m in re.findall(
            r"(?:FROM|JOIN)\s+([A-Za-z_0-9]+)", q.oracle
        )
    )
    table_functions = {"unnest", "range", "generate_series", "values"}
    unknown = {
        r
        for r in refs
        if r not in TABLES
        and r not in ctes
        and r not in table_functions
        and _NON_TABLE_OK.match(r)
    }
    # Anything unknown must at least appear as an alias/CTE defined
    # elsewhere in the SQL text (e.g. parenthesized subquery aliases).
    truly_unknown = {r for r in unknown if q.oracle.count(r) < 2}
    assert not truly_unknown, f"{name}: oracle references {truly_unknown}"


def test_no_unpaired_raw_persist():
    """Every raw ``.persist()`` in etl_spark must be unpersisted in the
    same function (the try/finally iterative-ML shape). Cross-call
    persistence goes through ``operators.caching.session_cached`` —
    a builder returns a lazy plan and can never unpersist its own
    result, so a bare persist there leaks one cached copy per call
    (found live in text_langid_ngram before this fence)."""
    import ast
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "etl_spark"
    offenders = []
    for path in sorted(pkg.rglob("*.py")):
        rel = str(path.relative_to(pkg))
        if rel == "operators/caching.py":  # the sanctioned implementation
            continue
        tree = ast.parse(path.read_text())
        for fn in ast.walk(tree):
            if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            calls = {
                n.func.attr
                for n in ast.walk(fn)
                if isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)
            }
            if "persist" in calls and "unpersist" not in calls:
                offenders.append(f"{rel}:{fn.lineno} {fn.name}")
    assert not offenders, (
        "raw .persist() without an unpersist in the same function — "
        "use session_cached or pair it:\n" + "\n".join(offenders)
    )


def test_session_cache_evict_leaves_nothing_live(spark):
    # live_caches() is the observability hook the eviction contract is
    # stated in terms of: after evict(), no entry may still hold
    # storage memory (a leak here is exactly the bug session_cached
    # exists to prevent).
    from etl_spark.operators.caching import evict, live_caches, session_cached

    df = session_cached(
        "hygiene_probe", spark, "/hygiene", lambda: spark.range(10)
    )
    assert df.storageLevel.useMemory
    assert live_caches().get("hygiene_probe") == 1
    # Second call reuses the same persisted frame, not a new copy.
    again = session_cached(
        "hygiene_probe", spark, "/hygiene", lambda: spark.range(10)
    )
    assert again is df
    assert live_caches().get("hygiene_probe") == 1
    evict("hygiene_probe")
    assert live_caches().get("hygiene_probe", 0) == 0


def test_session_checkpoint_evict_frees_blocks_eagerly(spark):
    # ADVICE r9 (caching.py evict): dropping the Python reference only
    # queued the DISK_ONLY checkpoint blocks for the ContextCleaner,
    # which frees them after some future driver GC — evict() must
    # release them NOW. The analyzed plan of a checkpointed frame is
    # the LogicalRDD holding the persisted RDD, so its id appearing in
    # (then vanishing from) getRDDStorageInfo is the exact receipt.
    from etl_spark.operators.caching import (
        evict,
        live_caches,
        session_checkpointed,
    )

    df = session_checkpointed(
        "hygiene_ckpt", spark, "/hygiene3",
        lambda: spark.range(100).selectExpr("id", "id * 2 AS x"),
    )
    rid = df._jdf.queryExecution().analyzed().rdd().id()
    stored = {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    assert rid in stored, "checkpoint blocks should be live after build"
    assert live_caches().get("hygiene_ckpt") == 1
    again = session_checkpointed(
        "hygiene_ckpt", spark, "/hygiene3",
        lambda: spark.range(100).selectExpr("id", "id * 2 AS x"),
    )
    assert again is df
    evict("hygiene_ckpt")
    stored = {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    assert rid not in stored, "evict() must free checkpoint blocks eagerly"
    assert live_caches().get("hygiene_ckpt", 0) == 0


def test_session_cache_evict_unknown_name_raises(spark):
    # A typo'd cache name must fail loudly, not silently no-op — a
    # harness that believes it evicted a stale index while the real
    # cache survives is the exact hazard the module guards against.
    import pytest

    from etl_spark.operators.caching import evict, session_cached

    with pytest.raises(KeyError, match="no_such_cache"):
        evict("no_such_cache")
    # None still means "evict everything" and never raises.
    session_cached(
        "hygiene_probe2", spark, "/hygiene2", lambda: spark.range(5)
    )
    evict()
    evict()  # idempotent on empty caches


def test_evict_session_memos_clears_trained_state():
    # r11 verdict item 4: the driver-side Python memos (trained
    # models, centroids, vtables) survive spark.catalog.clearCache(),
    # so bench harnesses must have a hook that evicts them between
    # reps — otherwise warm reps silently exclude training.
    from etl_spark.operators.caching import evict_session_memos
    from etl_spark.plans import bpe, lakehouse, ml, ml_train

    ml._TRAINED_CENTS["probe"] = [[1]]
    ml_train._TRAIN_CACHE["probe"] = ([(0, 0.0)], 1)
    bpe._LEARN_CACHE["probe"] = ([], [])
    lakehouse._VTABLE_CACHE["probe"] = object()
    lakehouse._DVTABLE_CACHE["probe"] = object()
    evict_session_memos()
    assert not ml._TRAINED_CENTS
    assert not ml_train._TRAIN_CACHE
    assert not bpe._LEARN_CACHE
    assert not lakehouse._VTABLE_CACHE
    assert not lakehouse._DVTABLE_CACHE
