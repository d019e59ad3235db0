"""Versioned snapshot table: copy-on-write MERGE with manifest-based
time travel — the plain-parquet re-implementation of the commit model
Delta/Iceberg use, layered over ``etl/merge.py``'s bucketed
latest-wins MERGE.

``merge.py`` overwrites touched bucket partitions IN PLACE: the cheap
maintenance shape, but history is gone the moment a merge lands. The
lakehouse answer is immutable data files plus a manifest per commit:

* data files are written once under ``data/v<k>/`` and never edited;
* manifest ``_manifest/v<k>.json`` lists, per bucket, the directory
  whose files make up the table at version k;
* a merge writes NEW files for the TOUCHED buckets only and commits
  manifest k+1 = untouched pointers carried over verbatim + new
  pointers — an O(touched) commit, like merge.py's overwrite;
* time travel = read exactly the directories a manifest lists;
* vacuum deletes bucket directories no retained manifest references.

Single-writer assumption (documented, as in the reference's whole
design): commits are serialized by the caller; the manifest write is
the commit point. Reference parity: the maintained view is S14's
latest-wins snapshot (main.py:149-157) — every version of this table
is WHAT run_pipeline WOULD have produced at that extraction horizon,
which is exactly what the time-travel tests assert.
"""

from __future__ import annotations

import json
import pathlib
import shutil

from pyspark.sql import DataFrame, SparkSession

from etl_spark.etl.merge import _bucketed, latest_wins_merge
from etl_spark.etl.pipeline import snapshot_latest

_BUCKET_COL = "kb"
_DATA = "data"
_MANIFEST = "_manifest"


def _manifest_path(table: pathlib.Path, version: int) -> pathlib.Path:
    return table / _MANIFEST / f"v{version}.json"


def latest_version(table: pathlib.Path) -> int:
    versions = sorted(
        int(p.stem[1:]) for p in (table / _MANIFEST).glob("v*.json")
    )
    if not versions:
        raise FileNotFoundError(f"no manifests under {table}")
    return versions[-1]


def _read_manifest(table: pathlib.Path, version: int) -> dict[str, str]:
    with open(_manifest_path(table, version)) as f:
        doc = json.load(f)
    return doc["buckets"]


def _write_data_version(
    records_bucketed: DataFrame, table: pathlib.Path, version: int
) -> dict[str, str]:
    """Write one immutable data directory for this commit, partitioned
    by bucket, and return {bucket: relative dir} pointers for the
    buckets it contains."""
    vdir = table / _DATA / f"v{version}"
    # Only the manifest rename publishes a commit, so a v<version> dir
    # with no _manifest/v<version>.json is an orphan from a crash
    # between the data write and the commit — clear it, or every
    # retry of this merge would recompute the same version and abort
    # on mode('error') forever. (No later manifest can reference it:
    # manifests only point at versions <= their own.)
    if vdir.exists() and not _manifest_path(table, version).exists():
        shutil.rmtree(vdir)
    records_bucketed.write.partitionBy(_BUCKET_COL).mode("error").parquet(
        str(vdir)
    )
    return {
        d.name.split("=", 1)[1]: str(d.relative_to(table))
        for d in vdir.glob(f"{_BUCKET_COL}=*")
    }


def _commit(
    table: pathlib.Path, version: int, buckets: dict[str, str]
) -> None:
    path = _manifest_path(table, version)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".json.tmp")
    tmp.write_text(json.dumps({"version": version, "buckets": buckets}))
    tmp.rename(path)  # the commit point (atomic on POSIX)


def init_versioned_table(records: DataFrame, table_path: pathlib.Path) -> int:
    """Materialize the latest-wins snapshot as version 0."""
    table = pathlib.Path(table_path)
    buckets = _write_data_version(_bucketed(snapshot_latest(records)), table, 0)
    _commit(table, 0, buckets)
    return 0


def read_versioned_table(
    spark: SparkSession, table_path: pathlib.Path, version: int | None = None
) -> DataFrame:
    """The table AS OF ``version`` (default: latest) — reads exactly
    the files that commit's manifest lists, nothing else."""
    table = pathlib.Path(table_path)
    v = latest_version(table) if version is None else version
    dirs = [str(table / rel) for rel in _read_manifest(table, v).values()]
    # mergeSchema: a manifest may reference dirs written before an
    # ADD-COLUMN evolution — their rows read with the column NULL.
    return spark.read.option("mergeSchema", "true").parquet(*dirs)


def merge_versioned_table(
    spark: SparkSession, table_path: pathlib.Path, batch_records: DataFrame
) -> int:
    """Copy-on-write MERGE: one new commit whose manifest carries
    untouched bucket pointers over verbatim and points touched buckets
    at freshly written files. Reads only touched buckets, writes only
    touched buckets, edits nothing in place."""
    table = pathlib.Path(table_path)
    current_v = latest_version(table)
    current = _read_manifest(table, current_v)

    batch = _bucketed(snapshot_latest(batch_records))
    # Config-bounded collect: at most N_MERGE_BUCKETS distinct ints.
    touched = [
        str(r[0]) for r in batch.select(_BUCKET_COL).distinct().collect()
    ]
    if not touched:
        return current_v
    new_v = current_v + 1

    existing_dirs = [
        str(table / current[b]) for b in touched if b in current
    ]
    if existing_dirs:
        cur_rows = spark.read.option("mergeSchema", "true").parquet(
            *existing_dirs
        )
        # partition-dir reads drop the bucket column; batch carries it,
        # so align columns and re-derive kb after the merge.
        # allow_schema_drift: a batch may carry columns the stored
        # version predates (and vice versa at read-repair time) —
        # additive evolution is part of this table's contract.
        merged = latest_wins_merge(
            _bucketed(cur_rows),
            batch.filter(batch[_BUCKET_COL].isin([int(b) for b in touched])),
            keys=["repo_dir", "file_id"],
            order_cols=["extract_ts"],
            allow_schema_drift=True,
        )
    else:
        merged = batch
    pointers = _write_data_version(merged, table, new_v)

    buckets = dict(current)
    buckets.update(pointers)
    _commit(table, new_v, buckets)
    return new_v


def vacuum_versioned_table(
    table_path: pathlib.Path, keep_versions: int = 1
) -> list[str]:
    """Delete bucket directories referenced by NO retained manifest
    (the newest ``keep_versions`` commits). Returns what was removed.
    Old manifests below the horizon are removed too — after a vacuum,
    time travel is only valid within the retained window, exactly the
    Delta/Iceberg retention contract."""
    table = pathlib.Path(table_path)
    newest = latest_version(table)
    retained_versions = [
        v
        for v in range(max(0, newest - keep_versions + 1), newest + 1)
        if _manifest_path(table, v).exists()
    ]
    live = {
        rel
        for v in retained_versions
        for rel in _read_manifest(table, v).values()
    }
    removed: list[str] = []
    # numeric order (lexicographic glob puts v10 before v2)
    for vdir in sorted(
        (table / _DATA).glob("v*"), key=lambda p: int(p.name[1:])
    ):
        for bdir in sorted(vdir.glob(f"{_BUCKET_COL}=*")):
            rel = str(bdir.relative_to(table))
            if rel not in live:
                shutil.rmtree(bdir)
                removed.append(rel)
        if not any(vdir.iterdir()):
            vdir.rmdir()
    for mpath in (table / _MANIFEST).glob("v*.json"):
        if int(mpath.stem[1:]) not in retained_versions:
            mpath.unlink()
            removed.append(str(mpath.relative_to(table)))
    return removed
