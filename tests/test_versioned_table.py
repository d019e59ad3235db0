"""Versioned snapshot table: every commit must equal the full recompute
at that extraction horizon (time travel), data files must be immutable
(copy-on-write), untouched buckets must be SHARED between versions (the
O(touched) commit), and vacuum must keep exactly what retained
manifests reference."""

from __future__ import annotations

import pathlib

from etl_spark.etl.merge import N_MERGE_BUCKETS
from etl_spark.etl.pipeline import snapshot_records
from etl_spark.etl.versioned import (
    init_versioned_table,
    latest_version,
    merge_versioned_table,
    read_versioned_table,
    vacuum_versioned_table,
    _read_manifest,
)
from etl_spark.etl.merge import load_extraction
from tests.test_etl_pipeline import make_run, write_run


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


def _snapshot_of(spark, tmp_path, *extractions):
    """Full recompute over a fresh zone holding only ``extractions`` —
    the ground truth for what each version must contain."""
    zone = tmp_path / ("truth_" + "_".join(ts for ts, _ in extractions))
    for ts, runs in extractions:
        for run in runs:
            write_run(zone, run["_repo"], ts, run["_run"])
    return snapshot_records(spark, zone)


def _mk(i, repo, status="completed"):
    return {"_repo": repo, "_run": make_run(i, repo, status=status)}


def test_every_version_equals_its_horizon_recompute(spark, tmp_path):
    zone = tmp_path / "zone"
    table = tmp_path / "vtable"
    t1, t2, t3 = "20250101-000000Z", "20250102-000000Z", "20250103-000000Z"

    e1 = [_mk(1, "repo_1", "running"), _mk(2, "repo_2", "queued")]
    e2 = [_mk(1, "repo_1", "completed"), _mk(3, "repo_1", "running")]
    e3 = [_mk(2, "repo_2", "completed")]
    for ts, runs in [(t1, e1), (t2, e2), (t3, e3)]:
        for r in runs:
            write_run(zone, r["_repo"], ts, r["_run"])

    assert init_versioned_table(load_extraction(spark, zone, t1), table) == 0
    assert merge_versioned_table(spark, table, load_extraction(spark, zone, t2)) == 1
    assert merge_versioned_table(spark, table, load_extraction(spark, zone, t3)) == 2

    assert latest_version(table) == 2
    horizons = [
        (0, [(t1, e1)]),
        (1, [(t1, e1), (t2, e2)]),
        (2, [(t1, e1), (t2, e2), (t3, e3)]),
    ]
    for v, exts in horizons:
        got = read_versioned_table(spark, table, version=v)
        want = _snapshot_of(spark, tmp_path, *exts)
        assert _sorted_rows(got) == _sorted_rows(want), f"version {v}"
    # default read = latest
    assert _sorted_rows(read_versioned_table(spark, table)) == _sorted_rows(
        read_versioned_table(spark, table, version=2)
    )


def test_commits_are_copy_on_write_and_share_untouched_buckets(spark, tmp_path):
    zone = tmp_path / "zone"
    table = tmp_path / "vtable"
    t1, t2 = "20250101-000000Z", "20250102-000000Z"
    for i in range(40):  # spread keys over several buckets
        write_run(zone, "r", t1, make_run(i, "r", status="running"))
    init_versioned_table(load_extraction(spark, zone, t1), table)

    v0_files = {
        str(p): p.stat().st_mtime_ns
        for p in pathlib.Path(table, "data", "v0").rglob("*.parquet")
    }
    m0 = _read_manifest(pathlib.Path(table), 0)
    assert len(set(m0.values())) > 2  # layout actually spread out

    write_run(zone, "r", t2, make_run(7, "r", status="completed"))
    merge_versioned_table(spark, table, load_extraction(spark, zone, t2))

    # v0's data files are bit-untouched after the commit
    after = {
        str(p): p.stat().st_mtime_ns
        for p in pathlib.Path(table, "data", "v0").rglob("*.parquet")
    }
    assert after == v0_files
    # exactly the touched bucket's pointer moved; the rest are shared
    m1 = _read_manifest(pathlib.Path(table), 1)
    moved = {b for b in m0 if m1[b] != m0[b]}
    assert len(moved) == 1
    assert all(m1[b] == m0[b] for b in m0 if b not in moved)
    # and v0 still reads correctly (history intact)
    v0 = read_versioned_table(spark, table, version=0)
    assert {r["status"] for r in v0.collect()} == {"running"}


def test_vacuum_keeps_exactly_what_retained_manifests_reference(spark, tmp_path):
    zone = tmp_path / "zone"
    table = tmp_path / "vtable"
    t1, t2, t3 = "20250101-000000Z", "20250102-000000Z", "20250103-000000Z"
    for i in range(40):
        write_run(zone, "r", t1, make_run(i, "r", status="running"))
    init_versioned_table(load_extraction(spark, zone, t1), table)
    write_run(zone, "r", t2, make_run(7, "r", status="completed"))
    merge_versioned_table(spark, table, load_extraction(spark, zone, t2))
    write_run(zone, "r", t3, make_run(8, "r", status="completed"))
    merge_versioned_table(spark, table, load_extraction(spark, zone, t3))

    before = _sorted_rows(read_versioned_table(spark, table))
    removed = vacuum_versioned_table(table, keep_versions=1)
    assert removed  # v0/v1-only bucket dirs and old manifests went away
    # latest still reads identically: carried-over v0 dirs referenced
    # by the latest manifest survived the vacuum
    assert _sorted_rows(read_versioned_table(spark, table)) == before
    live = set(_read_manifest(pathlib.Path(table), latest_version(table)).values())
    assert any(rel.startswith("data/v0") for rel in live)  # sharing is real
    on_disk = {
        str(d.relative_to(table))
        for d in pathlib.Path(table, "data").glob("v*/kb=*")
    }
    assert on_disk == live
    # sanity: bucket count still config-bounded
    assert len(live) <= N_MERGE_BUCKETS


def test_add_column_schema_evolution_across_commits(spark, tmp_path):
    """Additive schema evolution: a later commit's batch carries a NEW
    column. Rows last written before the column existed read as NULL
    under the evolved schema; the pre-evolution version still reads
    with its own (old) schema; latest-wins still works across the
    schema boundary."""
    from pyspark.sql import functions as F

    zone = tmp_path / "zone"
    table = tmp_path / "vtable"
    t1, t2 = "20250101-000000Z", "20250102-000000Z"
    for i in range(10):
        write_run(zone, "r", t1, make_run(i, "r", status="running"))
    init_versioned_table(load_extraction(spark, zone, t1), table)

    # Extraction 2 re-extracts run 3 and arrives with a new column.
    write_run(zone, "r", t2, make_run(3, "r", status="completed"))
    evolved_batch = load_extraction(spark, zone, t2).withColumn(
        "ingest_source", F.lit("api-v2")
    )
    merge_versioned_table(spark, table, evolved_batch)

    latest = read_versioned_table(spark, table)
    assert "ingest_source" in latest.columns
    by_id = {r["id"]: r for r in latest.collect()}
    assert by_id[3]["status"] == "completed"
    assert by_id[3]["ingest_source"] == "api-v2"
    # pre-evolution rows read as NULL in the new column
    assert by_id[1]["ingest_source"] is None
    assert len(by_id) == 10
    # the pre-evolution version keeps its own schema
    v0 = read_versioned_table(spark, table, version=0)
    assert "ingest_source" not in v0.columns


def test_time_travel_checksums_survive_vacuum(spark):
    """The snapshot-export bridge composed with retention: the
    registered query's per-version checksum triples, then vacuum to
    keep_versions=1 — the latest version must re-read with an
    IDENTICAL checksum triple (retention may not disturb served
    bytes), while the below-horizon manifests are really gone."""
    import pytest

    from etl_spark.plans.lakehouse import (
        _built_vtable,
        lakehouse_time_travel_checksums,
    )
    from tests.conftest import SF_DIR

    before = {
        r["version"]: (r["n_rows"], r["xor_checksum"], r["modsum_checksum"])
        for r in lakehouse_time_travel_checksums(spark, SF_DIR).collect()
    }
    assert sorted(before) == [0, 1, 2]
    assert len(set(before.values())) == 3  # each commit changed content

    table = _built_vtable(spark, SF_DIR)
    removed = vacuum_versioned_table(table, keep_versions=1)
    assert removed  # something below the horizon actually went away

    after = read_versioned_table(spark, table)  # latest = v2
    from pyspark.sql import functions as F

    from etl_spark.plans.quality import _CK_MOD

    row_str = F.concat_ws(
        "|", "repo_dir", "file_id", "extract_ts",
        F.col("event_id").cast("string"),
    )
    h = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("bigint")
    got = (
        after.select(h.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(h)").alias("x"),
            F.sum(F.col("h") % _CK_MOD).alias("m"),
        )
        .collect()[0]
    )
    assert (got["n"], got["x"], got["m"]) == before[2]
    # time travel below the retention horizon is really gone
    with pytest.raises(Exception):
        read_versioned_table(spark, table, version=0).collect()
    # rebuild for any later consumer in this session: the cached table
    # is now vacuumed; drop the memo so the next build starts fresh
    from etl_spark.plans.lakehouse import _VTABLE_CACHE

    _VTABLE_CACHE.clear()
