"""REST ingestion connector (reference S1-S3 semantics).

Behavioral contract (parity with reference main.py:47-93, verified by
tests/test_ingest.py goldens):

* S1 session config — bearer token from $GITHUB_WORKFLOW_RUNS_TOKEN,
  default query params per_page=100, format=json
  (reference main.py:47-52).
* S2 retry — up to ``max_retries`` retries with exponential backoff
  ``base_delay * 2**n`` seconds; the retry log lines are part of the
  observable contract; after exhaustion the LAST FAILED RESPONSE is
  returned, not raised (reference main.py:80-82) — callers decide.
* S3 pagination — follow RFC-5988 ``Link: rel="next"`` headers until
  absent (reference main.py:85-93).

Everything here is driver-side pure Python by design: Spark enters
only after the connector lands files (see etl.pipeline). The session
argument everywhere is duck-typed (needs only ``.get(url)``), which is
what makes the connector unit-testable without a network.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterator

try:  # requests is optional: only the real network path needs it.
    import requests as _requests
except ImportError:  # pragma: no cover
    _requests = None

TOKEN_ENV_VAR = "GITHUB_WORKFLOW_RUNS_TOKEN"
DEFAULT_PARAMS = {"per_page": 100, "format": "json"}


def build_api_session(token: str | None = None):
    """S1: authenticated REST session.

    Like the reference (main.py:50), the environment variable is
    authoritative when set; unlike the reference, an explicit ``token``
    argument is honored as a fallback instead of being silently
    ignored (accepting-then-discarding a credential is an API trap).
    Raises KeyError when neither is provided.
    """
    if _requests is None:  # pragma: no cover
        raise RuntimeError("the 'requests' package is required for live ingestion")
    session = _requests.Session()
    token = os.environ.get(TOKEN_ENV_VAR, token)
    if token is None:
        raise KeyError(TOKEN_ENV_VAR)
    session.headers.update({"Authorization": f"Bearer {token}"})
    session.params.update(dict(DEFAULT_PARAMS))
    return session


class RetryingSession:
    """S2: retry wrapper with exponential backoff.

    Delay schedule is ``base_delay_seconds * 2**attempt``. The sleep
    function is injectable so tests run instantly. After the final
    retry the last (failed) response is RETURNED — never raised — so a
    long extraction keeps its partial progress (reference
    main.py:80-82 contract).
    """

    def __init__(
        self,
        session,
        max_retries: int = 3,
        base_delay_seconds: float = 0.5,
        sleep_function: Callable[[float], None] = time.sleep,
    ) -> None:
        self.session = session
        self.max_retries = max_retries
        self.base_delay_seconds = base_delay_seconds
        self.sleep = sleep_function

    def get(self, url: str):
        attempt = 0
        response = None  # stays None if session.get itself raises
        while True:
            try:
                response = self.session.get(url)
                response.raise_for_status()
                return response
            except Exception as error:
                print(f"Error fetching {url}: {error}")
                if attempt >= self.max_retries:
                    print(f"Maximum retries reached ({self.max_retries}).")
                    # Last failed response if one was received; None when
                    # the transport itself failed (connection/DNS error) —
                    # still return-not-raise so a long extraction keeps
                    # its partial progress.
                    return response
                delay = self.base_delay_seconds * (2 ** attempt)
                print(f"Retrying in {delay} seconds (retry attempt {attempt + 1})...")
                attempt += 1
                self.sleep(delay)


def paginate(session, first_page_url: str) -> Iterator[object]:
    """S3: lazily yield responses, following Link rel=next headers."""
    url = first_page_url
    while url is not None:
        response = session.get(url)
        yield response
        next_link = getattr(response, "links", {}).get("next")
        url = next_link["url"] if next_link else None
