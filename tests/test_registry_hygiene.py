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
