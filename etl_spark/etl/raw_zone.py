"""Append-only raw zone: layout + extraction (reference S8-S11).

Layout (identical to the reference's persistent data model,
reference main.py:118-137 — the layout IS the contract other tools
depend on):

    <root>/repos/<ts>/pages/<n>.json      raw repo-list pages
    <root>/<repo>/<ts>/pages/<n>.json     raw run-list pages
    <root>/<repo>/<ts>/runs/<id>.json     one file per workflow run
    <root>/workflow_runs.csv              derived export (pipeline.py)

``<ts> = strftime('%Y%m%d-%H%M%SZ')``. Each extraction appends a new
<ts> partition and never rewrites old ones; the snapshot view is
recomputed over ALL partitions (pipeline.py). Timestamps here are
genuine UTC — the reference formatted naive local time with a 'Z'
suffix (main.py:129), flagged in SURVEY.md §1.2 as a bug.

Scale note: file-per-run mirrors the reference for fidelity; at
100 TB the connector would land one JSONL per (repo, ts) instead —
the Spark reader in pipeline.py handles either, because it globs
directories and never assumes one-row-per-file.
"""

from __future__ import annotations

import datetime
import json
import pathlib
from collections.abc import Callable

from etl_spark.etl.ingest import paginate

TS_FORMAT = "%Y%m%d-%H%M%SZ"
API_BASE = "https://api.github.com"
ORG = "alartest"


def utcnow() -> datetime.datetime:
    return datetime.datetime.now(datetime.timezone.utc)


def write_text_file(text: str, filepath: pathlib.Path) -> None:
    """S10: text sink, creating parent dirs."""
    filepath.parent.mkdir(parents=True, exist_ok=True)
    filepath.write_text(text)


def extract_snapshot(
    session,
    output_dir: pathlib.Path,
    datetime_: datetime.datetime,
    write_function: Callable[[str, pathlib.Path], None] = write_text_file,
) -> None:
    """S11: land one full extraction under a fresh <ts> partition.

    Scans the org's repo list (S4/S5), then per repo the workflow-run
    pages (S6), persisting raw pages (S8) and one JSON file per run
    (S7/S9). Rows are landed verbatim (page.text / original run dict)
    so the raw zone is a faithful, replayable record.
    """
    ts = datetime_.strftime(TS_FORMAT)

    repo_names: list[str] = []
    repos_url = f"{API_BASE}/orgs/{ORG}/repos"
    for page_no, page in enumerate(paginate(session, repos_url), start=1):
        write_function(page.text, output_dir / "repos" / ts / "pages" / f"{page_no}.json")
        repo_names.extend(repo["name"] for repo in page.json())

    for repo in repo_names:
        runs_url = f"{API_BASE}/repos/{ORG}/{repo}/actions/runs"
        for page_no, page in enumerate(paginate(session, runs_url), start=1):
            repo_ts_dir = output_dir / repo / ts
            write_function(page.text, repo_ts_dir / "pages" / f"{page_no}.json")
            for run in page.json()["workflow_runs"]:
                write_function(
                    json.dumps(run), repo_ts_dir / "runs" / f"{run['id']}.json"
                )
