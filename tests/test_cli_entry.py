"""The ``python -m etl_spark`` entry point (reference main.py:188-190)
must run the full E→T→L pipeline: mock-API extract → raw zone layout →
byte-exact golden CSV — the same golden as the reference's e2e test,
driven through the CLI body instead of run_pipeline directly."""

from __future__ import annotations

import datetime
import json

import pytest

from etl_spark.__main__ import main
from tests.test_etl_pipeline import (
    ORG_REPOS_URL,
    FakeResponse,
    DictSession,
    make_run,
    runs_url,
)


def test_cli_main_end_to_end_csv_golden(spark, tmp_path, monkeypatch):
    run = make_run(1, "test_repo", head_sha="12345678")
    session = DictSession(
        {
            ORG_REPOS_URL: FakeResponse([{"name": "test_repo"}]),
            runs_url("test_repo"): FakeResponse(
                {"total_count": 1, "workflow_runs": [run]}
            ),
        }
    )
    main(
        [str(tmp_path)],
        session_factory=lambda: session,
        spark=spark,
        now_function=lambda: datetime.datetime(2025, 1, 1),
    )

    raw_run = json.loads(
        (
            tmp_path / "test_repo" / "20250101-000000Z" / "runs" / "1.json"
        ).read_text()
    )
    assert raw_run == run
    csv_text = (tmp_path / "workflow_runs.csv").read_text()
    assert csv_text == (
        "id,repo,name,head_sha,status,conclusion,created_at,updated_at,run_started_at\n"
        "1,test_repo,My Workflow,12345678,pending,,"
        "2025-01-01T00:00:00Z,2025-01-01T00:00:00Z,2025-01-01T00:00:00Z\n"
    )


def test_cli_main_closes_the_session(spark, tmp_path, monkeypatch):
    closed = []

    class ClosingSession(DictSession):
        def close(self):
            closed.append(True)

    session = ClosingSession(
        {ORG_REPOS_URL: FakeResponse([])}
    )
    main(
        [str(tmp_path)],
        session_factory=lambda: session,
        spark=spark,
        now_function=lambda: datetime.datetime(2025, 1, 1),
    )
    assert closed == [True]


def test_cli_requires_token_env(monkeypatch, tmp_path):
    # Without the token env var the CLI must fail fast (KeyError from
    # build_api_session) BEFORE touching Spark or the network.
    monkeypatch.delenv("GITHUB_WORKFLOW_RUNS_TOKEN", raising=False)
    with pytest.raises(KeyError):
        main([str(tmp_path)], spark=object())
