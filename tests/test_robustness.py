"""Failure-path behavior: corrupt input degrades predictably, bad
arguments fail fast."""

from __future__ import annotations

import json
import pathlib

import pytest

from etl_spark.etl.pipeline import snapshot_records
from etl_spark.io import load
from tests.test_etl_pipeline import make_run, write_run


def test_load_unknown_table_fails_fast(spark):
    from tests.conftest import SF_DIR

    with pytest.raises(KeyError):
        load(spark, SF_DIR, "not_a_table")


def test_malformed_run_file_degrades_to_nulls(spark, tmp_path):
    # PERMISSIVE JSON mode: a corrupt file must not kill the snapshot —
    # it surfaces as a null-field row (detectable by an audit), while
    # intact files parse normally.
    ts = "20250101-000000Z"
    write_run(tmp_path, "repo_1", ts, make_run(1, "repo_1"))
    bad = tmp_path / "repo_1" / ts / "runs" / "2.json"
    bad.write_text('{"id": 2, "name": "Broken"')  # truncated JSON

    rows = snapshot_records(spark, tmp_path).collect()
    by_file = {r["file_id"]: r for r in rows}
    assert by_file["1"]["id"] == 1
    assert by_file["2"]["id"] is None  # corrupt row visible, not fatal


def test_empty_repo_dir_is_ignored(spark, tmp_path):
    ts = "20250101-000000Z"
    write_run(tmp_path, "repo_1", ts, make_run(1, "repo_1"))
    (tmp_path / "empty_repo").mkdir()
    rows = snapshot_records(spark, tmp_path).collect()
    assert [r["id"] for r in rows] == [1]


def test_raw_zone_with_non_json_noise(spark, tmp_path):
    # Stray non-run files (pages/, READMEs) must never enter the scan.
    ts = "20250101-000000Z"
    write_run(tmp_path, "repo_1", ts, make_run(1, "repo_1"))
    pages = tmp_path / "repo_1" / ts / "pages"
    pages.mkdir(parents=True, exist_ok=True)
    (pages / "1.json").write_text(json.dumps({"total_count": 1}))
    (tmp_path / "README.txt").write_text("not data")
    rows = snapshot_records(spark, tmp_path).collect()
    assert len(rows) == 1
