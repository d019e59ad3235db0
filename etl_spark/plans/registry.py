"""Registry mapping query name -> (Spark DataFrame builder, DuckDB oracle SQL).

The driver contract (``__spark_entry__.py``) needs two aligned dicts;
keeping each query's Spark plan and its ANSI-SQL oracle in one place is
what keeps column names, aliases, and semantics from drifting apart.

Builders must:
  * take (spark, sf_dir) and return a DataFrame. Actions at build time
    are allowed only for bounded materialization: populating a shared
    persisted index before a multi-consumer self-join (dedup_*), or
    collecting a config-sized constant (sim_topk's query set) — never
    a data-sized collect;
  * alias every computed column, with the oracle using the same alias;
  * avoid raw double aggregation (see functions/money.py) and raw
    timestamp output columns (format to strings) so the value hash is
    engine-stable.

``oracle`` is None for queries whose semantics are not SQL-expressible
(approximate sketches, LSH bucketing); the driver then records a weaker
rows-only check and pytest carries the real verification.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: add a builder to the registry under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco
