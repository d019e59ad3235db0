"""Runnable live-extraction entry point — ``python -m etl_spark
[data_dir]`` — the reference's ``python main.py`` (reference
main.py:188-190: ``with GitHubAPISession() as session:
main(session, pathlib.Path("data"))``).

E → T → L end-to-end: authed REST extract into the raw zone
(``data_dir/<repo>/<ts>/runs/*.json``), Spark snapshot dedup/flatten
over the WHOLE raw zone (all historical extractions, latest snapshot
wins), deterministic CSV export to ``data_dir/workflow_runs.csv``.

Requires the API token env var (``GITHUB_WORKFLOW_RUNS_TOKEN``, same
contract as the reference main.py:50); fails fast with the KeyError
from build_api_session when unset.
"""

from __future__ import annotations

import pathlib
import sys

from etl_spark.etl.ingest import build_api_session
from etl_spark.etl.pipeline import run_pipeline
from etl_spark.session import get_spark


def main(
    argv: list[str] | None = None,
    session_factory=build_api_session,
    spark=None,
    now_function=None,
) -> None:
    """CLI body; ``session_factory``/``spark``/``now_function`` are
    injectable so the mock-API end-to-end test drives the exact code
    path the console entry runs (tests/test_cli_entry.py)."""
    from etl_spark.etl.raw_zone import utcnow

    args = sys.argv[1:] if argv is None else argv
    workflows_dir = pathlib.Path(args[0]) if args else pathlib.Path("data")
    # API session FIRST (the reference's order, main.py:188): a missing
    # token must fail before the multi-second Spark/JVM bring-up, or
    # "fails fast" in the module docstring would be a lie. Spark
    # bring-up happens INSIDE the try so a failed bring-up still
    # closes the already-open HTTP session.
    session = session_factory()
    try:
        spark = spark or get_spark("test-etl-live")
        run_pipeline(
            session, workflows_dir, spark, now_function=now_function or utcnow
        )
    finally:
        close = getattr(session, "close", None)
        if close is not None:
            close()
    print(f"wrote {workflows_dir / 'workflow_runs.csv'}")


if __name__ == "__main__":
    main()
