"""Session-scoped keyed DataFrame cache — the ONE sanctioned way to
hold a persisted frame across plan-builder calls.

A bare ``.persist()`` inside a registered builder leaks: every call
stacks another copy in storage memory, and nothing ever unpersists it
(a builder returns a lazy plan, so it cannot unpersist before the
caller's action). The pattern that works — grown independently in the
dedup posting-list index and the LSH band table, now extracted — is a
module-level dict keyed on ``(applicationId, sf_dir)``:

* ``applicationId`` is stable for the session's lifetime; keying on
  ``id(spark)`` would let CPython hand a recycled id to a NEW session
  and return a frame bound to a stopped one.
* Reuse only while ``storageLevel.useMemory`` still holds — an
  external ``spark.catalog.clearCache()`` (bench reps do this between
  timings) silently unpersists, and a stale reuse would run every
  consumer uncached while looking cached.
* Persist + ``count()`` BEFORE handing the frame to multi-consumer
  plans: Spark has no cross-plan ReusedExchange, so an unmaterialized
  "cached" frame recomputes its whole upstream once per consumer.

``tests/test_registry_hygiene.py`` enforces the complement: every raw
``.persist()`` call site outside this module must pair with an
``unpersist()`` in the same function (the try/finally iterative-ML
shape) — builders that need cross-call persistence come here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# cache name -> {(applicationId, sf_dir): persisted DataFrame}
_CACHES: dict[str, dict[tuple[str, str], DataFrame]] = {}

# cache name -> {(applicationId, sf_dir): localCheckpointed DataFrame}
_CHECKPOINTS: dict[str, dict[tuple[str, str], DataFrame]] = {}


def session_cached(
    name: str,
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the persisted frame for (``name``, session, ``sf_dir``),
    building + materializing it via ``build()`` on first use or after
    an external unpersist.

    Caller contract: the key is the PATH, not the data — rewriting
    the parquet at the same ``sf_dir`` within one session serves the
    stale pre-rewrite frame until ``evict(name)`` (or ``evict()``) is
    called. Fixtures and harnesses that rewrite in place (the fuzz
    corpus-swap pattern) must evict between corpora; keying on a data
    fingerprint was considered and rejected — listing files per call
    would put a driver-side FS scan on every cached hit."""
    cache = _CACHES.setdefault(name, {})
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = cache.get(key)
    if cached is not None and cached.storageLevel.useMemory:
        return cached
    cache.pop(key, None)  # evict stale/unpersisted entries
    df = build().persist()
    df.count()  # materialize before multi-consumer reuse
    cache[key] = df
    return df


def session_checkpointed(
    name: str,
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Like ``session_cached`` but materializes via a DISK_ONLY
    ``localCheckpoint`` instead of a storage-memory persist. Two
    differences matter:

    * **Lineage is TRUNCATED** — every consumer's executed plan shows
      a leaf RDD scan where the build plan used to be. Use this for an
      expensive derived ARTIFACT consumed by several registered
      queries (the logreg near-dup label frame): with plain caching,
      each consumer's plan still carries the full build lineage
      textually and would silently replay it end-to-end if the cache
      were dropped; the checkpoint makes the artifact boundary real —
      the in-session analog of a table the upstream pipeline wrote to
      disk, which IS the 100 TB shape.
    * **It survives ``spark.catalog.clearCache()``** (checkpoint
      blocks are not catalog cache entries), so bench reps measure
      the consumer query, not an artifact rebuild — the same contract
      a written table would give.

    DISK_ONLY so the pinned blocks cost no executor storage memory.
    ``evict`` releases the blocks EAGERLY (it unpersists the
    checkpointed RDD itself, then drops the reference) — relying on
    the ContextCleaner alone would leave the disk blocks pinned until
    a driver GC happens to collect the frame, which in a long session
    can be arbitrarily late."""
    from pyspark import StorageLevel

    cache = _CHECKPOINTS.setdefault(name, {})
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = cache.get(key)
    if cached is not None:
        return cached
    df = build().localCheckpoint(
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )
    cache[key] = df
    return df


def _release_checkpoint(df: DataFrame) -> None:
    """Eagerly free a localCheckpoint's storage blocks. A checkpointed
    frame's analyzed plan IS the ``LogicalRDD`` holding the persisted
    internal-row RDD, so unpersisting that exact RDD releases the
    blocks now instead of whenever the ContextCleaner notices the
    frame became unreachable (lazy, GC-driven — on a DISK_ONLY
    checkpoint that leaves dead disk usage pinned for the rest of the
    session). Private-API access is fenced: on any JVM-shape change we
    fall back to the old drop-the-reference behavior rather than fail
    eviction."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # ContextCleaner fallback: blocks freed after driver GC


def evict(name: str | None = None) -> None:
    """Unpersist and drop cached entries — for ``name`` only, or every
    cache when ``name`` is None. Test fixtures and fuzz harnesses that
    swap the underlying corpus call this so a stale index bound to the
    previous fixture can't be reused.

    A non-None ``name`` that was never registered raises ``KeyError``:
    a caller passing a name always intends a registered cache, and a
    silent no-op on a typo would leave the exact stale-index hazard
    this module exists to prevent while appearing to have evicted it.
    """
    if name is not None and name not in _CACHES and name not in _CHECKPOINTS:
        raise KeyError(
            f"evict({name!r}): no such cache; registered = "
            f"{sorted(_CACHES) + sorted(_CHECKPOINTS)}"
        )
    caches = (
        [_CACHES[name]] if name in _CACHES else []
    ) if name is not None else list(_CACHES.values())
    for cache in caches:
        for df in cache.values():
            df.unpersist()
        cache.clear()
    ckpts = (
        [_CHECKPOINTS[name]] if name is not None and name in _CHECKPOINTS
        else [] if name is not None else list(_CHECKPOINTS.values())
    )
    for cache in ckpts:
        for df in cache.values():
            _release_checkpoint(df)
        cache.clear()


def evict_session_memos() -> None:
    """Clear the driver-side Python memos that survive
    ``spark.catalog.clearCache()`` — trained-model/centroid/vtable
    state keyed per session (r11, verdict item: min-of-N bench reps of
    the IVF/logreg/BPE/lakehouse families otherwise time rep 1 with
    training and reps 2+ without it, so per-query warm numbers
    silently exclude training). Bench harnesses call this wherever
    they call ``clearCache()``; cross-QUERY sharing within one rep —
    the legitimate optimization — is untouched because the memo
    repopulates on first use inside the rep.

    Lazy imports: plans modules import this module at import time.
    ``io._ROW_COUNTS`` (one int per table: the partition-count
    heuristic) is deliberately NOT cleared — it is sizing metadata,
    not a computed result."""
    from etl_spark.plans import bpe, lakehouse, ml, ml_train

    ml._TRAINED_CENTS.clear()
    ml_train._TRAIN_CACHE.clear()
    bpe._LEARN_CACHE.clear()
    lakehouse._VTABLE_CACHE.clear()
    lakehouse._DVTABLE_CACHE.clear()


def live_caches() -> dict[str, int]:
    """Cache name -> number of still-held entries (test hook).
    Persisted caches count entries that still hold storage memory;
    checkpoint caches count held references — their DISK_ONLY blocks
    are live exactly while the entry exists, because ``evict`` now
    unpersists the checkpointed RDD eagerly on removal."""
    out = {
        name: sum(1 for df in entries.values() if df.storageLevel.useMemory)
        for name, entries in _CACHES.items()
    }
    for name, entries in _CHECKPOINTS.items():
        out[name] = out.get(name, 0) + len(entries)
    return out
