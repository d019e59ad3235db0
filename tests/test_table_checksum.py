"""Fences for dq_table_checksum: the detection properties each
component exists for — XOR for any odd difference, the modular sum for
XOR's even-multiplicity blind spot, the count for cardinality."""

from __future__ import annotations

from etl_spark.plans.quality import _CK_MOD, dq_table_checksum
from tests.conftest import SF_DIR


def _base(spark):
    return {
        r["o_orderstatus"]: (
            r["n_rows"], r["xor_checksum"], r["modsum_checksum"]
        )
        for r in dq_table_checksum(spark, SF_DIR).collect()
    }


def test_checksum_detects_single_row_mutation(spark, duck):
    """Flipping one row's priority must change that group's checksum
    (simulated by removing the row's hash from each aggregate: XOR is
    its own inverse, the modsum subtracts)."""
    base = _base(spark)
    # pick one concrete row and recompute its 60-bit hash in DuckDB
    status, h = duck.execute(
        """
        SELECT o_orderstatus, h FROM (
          SELECT o_orderstatus,
                 (SELECT SUM((strpos('0123456789abcdef', substr(rh, c, 1)) - 1)
                          * power(16, 15 - c)::BIGINT)
                  FROM generate_series(1, 15) t(c)) AS h
          FROM (SELECT o_orderstatus,
                       md5(CAST(o_orderkey AS VARCHAR) || '|' ||
                           CAST(o_custkey AS VARCHAR) || '|' ||
                           o_orderstatus || '|' ||
                           CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR)
                           || '|' || strftime(o_orderdate, '%Y-%m-%d')
                           || '|' || o_orderpriority) AS rh
                FROM orders LIMIT 1)
        )
        """
    ).fetchone()
    n, x, m = base[status]
    mutated = (n, x ^ int(h), (m - int(h) % _CK_MOD))
    assert mutated != base[status]
    assert mutated[1] != x and mutated[2] != m


def test_modsum_breaks_xor_even_multiplicity_cancellation():
    """Two identical extra rows cancel in XOR but not in the modular
    sum — the reason both components exist."""
    h = 0x123456789ABCDEF % (2**60)
    xor_delta = h ^ h
    assert xor_delta == 0  # XOR alone is blind to a duplicated pair
    modsum_delta = 2 * (h % _CK_MOD)
    assert modsum_delta != 0  # the modsum is not


def test_checksum_group_counts_match_table(spark, duck):
    base = _base(spark)
    want = dict(
        duck.execute(
            "SELECT o_orderstatus, COUNT(*) FROM orders GROUP BY 1"
        ).fetchall()
    )
    assert {k: v[0] for k, v in base.items()} == want
