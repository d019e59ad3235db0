"""Connector unit tests (S1-S3): retry semantics incl. the log-line
goldens, return-not-raise after exhaustion, and Link-header pagination.
Sessions are duck-typed — a dict works because RetryingSession/paginate
only call .get(url), which is dict lookup via a tiny adapter."""

from __future__ import annotations

import json
import types

import pytest

from etl_spark.etl.ingest import RetryingSession, build_api_session, paginate


class FakeResponse:
    def __init__(self, payload, next_url=None):
        self.payload = payload
        self.links = {"next": {"url": next_url}} if next_url else {}
        self.status_code = 200

    @property
    def text(self):
        return json.dumps(self.payload)

    def json(self):
        return self.payload

    def raise_for_status(self):
        pass


class FakeErrorResponse:
    def __init__(self, message):
        self.message = message
        self.status_code = 400

    def raise_for_status(self):
        raise Exception(self.message)


class DictSession:
    """url → response mapping; the duck-typed .get(url) surface."""

    def __init__(self, mapping):
        self.mapping = mapping

    def get(self, url):
        return self.mapping[url]


def no_sleep(_seconds):
    return


def test_api_session_reads_token_from_env(monkeypatch):
    monkeypatch.setenv("GITHUB_WORKFLOW_RUNS_TOKEN", "tok-123")
    s = build_api_session()
    assert s.headers["Authorization"] == "Bearer tok-123"
    assert s.params == {"per_page": 100, "format": "json"}
    s.close()


def test_retry_passthrough_on_success(capsys):
    session = DictSession({"u": FakeResponse(["ok"])})
    retry = RetryingSession(session, 3, 0.5, sleep_function=no_sleep)
    assert retry.get("u").json() == ["ok"]
    assert capsys.readouterr().out == ""


def test_retry_exhaustion_returns_response_and_logs(capsys):
    session = DictSession({"bad": FakeErrorResponse("Network error")})
    retry = RetryingSession(session, 3, 0.5, sleep_function=no_sleep)
    response = retry.get("bad")
    # Return-not-raise contract: callers get the failed response back.
    assert response.status_code == 400
    assert capsys.readouterr().out == (
        "Error fetching bad: Network error\n"
        "Retrying in 0.5 seconds (retry attempt 1)...\n"
        "Error fetching bad: Network error\n"
        "Retrying in 1.0 seconds (retry attempt 2)...\n"
        "Error fetching bad: Network error\n"
        "Retrying in 2.0 seconds (retry attempt 3)...\n"
        "Error fetching bad: Network error\n"
        "Maximum retries reached (3).\n"
    )


def test_retry_recovers_after_transient_failures(capsys):
    queue = [FakeErrorResponse("boom")] * 2 + [FakeResponse({"fine": 1})]

    class FlakySession:
        def get(self, url):
            return queue.pop(0)

    retry = RetryingSession(FlakySession(), 3, 0.5, sleep_function=no_sleep)
    assert retry.get("flaky").json() == {"fine": 1}
    out = capsys.readouterr().out
    assert out.count("Error fetching flaky: boom") == 2
    assert "Maximum retries reached" not in out


def test_retry_backoff_schedule_is_exponential():
    delays = []
    session = DictSession({"bad": FakeErrorResponse("x")})
    retry = RetryingSession(session, 4, 0.25, sleep_function=delays.append)
    retry.get("bad")
    assert delays == [0.25, 0.5, 1.0, 2.0]


def test_paginate_follows_link_headers():
    session = DictSession(
        {
            "p1": FakeResponse([1], next_url="p2"),
            "p2": FakeResponse([2], next_url="p3"),
            "p3": FakeResponse([3]),
        }
    )
    pages = paginate(session, "p1")
    assert isinstance(pages, types.GeneratorType)
    assert [p.json() for p in pages] == [[1], [2], [3]]


def test_paginate_single_page():
    session = DictSession({"only": FakeResponse({"a": 1})})
    assert [p.json() for p in paginate(session, "only")] == [{"a": 1}]


def test_build_api_session_requires_env(monkeypatch):
    monkeypatch.delenv("GITHUB_WORKFLOW_RUNS_TOKEN", raising=False)
    with pytest.raises(KeyError):
        build_api_session()


def test_build_api_session_explicit_token_fallback(monkeypatch):
    monkeypatch.delenv("GITHUB_WORKFLOW_RUNS_TOKEN", raising=False)
    s = build_api_session(token="explicit-tok")
    assert s.headers["Authorization"] == "Bearer explicit-tok"
    s.close()


def test_retry_returns_none_when_transport_itself_fails(capsys):
    class DeadTransport:
        def get(self, url):
            raise ConnectionError("DNS failure")

    retry = RetryingSession(DeadTransport(), 2, 0.5, sleep_function=no_sleep)
    # return-not-raise even when no response object ever existed.
    assert retry.get("gone") is None
    out = capsys.readouterr().out
    assert out.count("Error fetching gone: DNS failure") == 3
    assert "Maximum retries reached (2)." in out
