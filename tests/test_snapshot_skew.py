"""S14 hot-key skew fence (round-6 verdict item 6): the latest-
snapshot-wins window partitions by (repo_dir, file_id) — sane because
key cardinality scales with the zone — but nothing had ever driven a
PATHOLOGICAL zone where one run is re-extracted 10^4 times (a stuck
scheduler re-snapshotting the same repo every minute for a week).

The fence: 10^4 extractions of ONE run (one window partition holding
10^4 rows — the worst single-key pile-up the shape allows), plus a
normal background repo. The window must (a) return exactly the newest
version of the hot run, (b) leave the background untouched, and
(c) stay a keyed window — the plan must show the (repo_dir, file_id)
partitioning, never a global (empty partitionBy) window. Wall-clock
stays test-suite friendly because 10^4 rows in one partition is
nothing; what this fence really pins is the PLAN shape, which is what
survives the 100x version of the same skew.
"""

from __future__ import annotations

import json
import pathlib

from etl_spark.etl.pipeline import (
    load_workflow_runs,
    snapshot_latest,
    snapshot_records,
)

N_EXTRACTIONS = 10_000


def _write_zone(root: pathlib.Path) -> str:
    """One run re-extracted N_EXTRACTIONS times + a 3-run background
    repo. Returns the newest extract_ts of the hot run. Files are laid
    out exactly as extract_snapshot lands them:
    <repo>/<ts>/runs/<id>.json."""
    newest = ""
    for i in range(N_EXTRACTIONS):
        # Fixed-width ts strings: string-desc == chronological-desc,
        # the same contract the real zone's <ts> format carries.
        ts = f"20250101-{i:06d}Z"
        newest = max(newest, ts)
        p = root / "hot_repo" / ts / "runs" / "42.json"
        p.parent.mkdir(parents=True)
        p.write_text(
            json.dumps(
                {
                    "id": 42,
                    "name": "wf",
                    "status": "completed" if i == N_EXTRACTIONS - 1 else "running",
                    "conclusion": None,
                    "head_sha": f"sha{i}",
                    "created_at": "2025-01-01T00:00:00Z",
                    "updated_at": "2025-01-01T00:00:00Z",
                    "run_started_at": "2025-01-01T00:00:00Z",
                    "repository": {"name": "hot_repo"},
                }
            )
        )
    for rid in (1, 2, 3):
        p = root / "calm_repo" / "20250101-000000Z" / "runs" / f"{rid}.json"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(
            json.dumps(
                {
                    "id": rid,
                    "name": "wf",
                    "status": "completed",
                    "conclusion": "success",
                    "head_sha": "bg",
                    "created_at": "2025-01-01T00:00:00Z",
                    "updated_at": "2025-01-01T00:00:00Z",
                    "run_started_at": "2025-01-01T00:00:00Z",
                    "repository": {"name": "calm_repo"},
                }
            )
        )
    return newest


def test_snapshot_window_survives_hot_key_pileup(spark, tmp_path):
    newest = _write_zone(tmp_path)

    runs = load_workflow_runs(spark, tmp_path)
    assert runs.count() == N_EXTRACTIONS + 3

    # (c) plan fence FIRST: the window is keyed, never global. A
    # global window would put all 10^4 + 3 rows in ONE task at any
    # scale; the keyed form caps a task at max-per-key multiplicity.
    plan = snapshot_latest(runs)._jdf.queryExecution().executedPlan().toString()
    window_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert window_lines, plan
    for ln in window_lines:
        assert "repo_dir" in ln and "file_id" in ln, ln

    rows = {r["id"]: r for r in snapshot_records(spark, tmp_path).collect()}
    # (a) exactly one survivor for the hot key, and it is the newest.
    assert set(rows) == {42, 1, 2, 3}
    assert rows[42]["extract_ts"] == newest
    assert rows[42]["status"] == "completed"
    assert rows[42]["head_sha"] == f"sha{N_EXTRACTIONS - 1}"
    # (b) background repo untouched.
    for rid in (1, 2, 3):
        assert rows[rid]["conclusion"] == "success"
