"""Snapshot-versioned Parquet table: append / overwrite / time-travel
/ compaction (lakehouse-lite, the Iceberg/Delta commit protocol shape).

At 100 TB the output of every pipeline stage is itself a table that
other pipelines read while it is being updated; correctness then
hinges on the COMMIT PROTOCOL, not the writer:

* data files are written FIRST, into a directory owned by the
  not-yet-committed version; the manifest (the list of data dirs the
  snapshot consists of) is committed LAST via atomic rename — a reader
  can never observe a half-written snapshot, and a crashed writer
  leaves only an orphan directory;
* orphan data dirs (version >= next uncommitted version, from a
  crashed attempt) are purged before the next write, so re-running an
  append can never double its rows — the same crash-resume rule as the
  crawl checkpoint (`pipelines/crawl.py _purge_uncommitted`);
* every committed manifest is retained, so any historical snapshot can
  be re-read (time travel) until ``vacuum`` drops the manifests and
  any data dirs no retained snapshot references;
* ``compact`` rewrites the CURRENT snapshot into a bounded number of
  files as a new version — readers of old versions are unaffected.

The reference engine's only output contract is one JSON file per
announcement plus file-existence resume (reference
``exchange/binance.py:253-255``); this module is the beyond-reference
scale answer for multi-writer, re-runnable, readable-while-written
table output.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import ray

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"
_V_RE = re.compile(r"^v(\d+)\.json$")
_D_RE = re.compile(r"^v(\d+)$")


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR)


def _versions(table_dir: str) -> list[int]:
    md = _manifest_dir(table_dir)
    if not os.path.isdir(md):
        return []
    out = []
    for name in os.listdir(md):
        m = _V_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(table_dir), f"v{version}.json")) as f:
        return json.load(f)


def latest_version(table_dir: str) -> int | None:
    vs = _versions(table_dir)
    return vs[-1] if vs else None


def _purge_orphans(table_dir: str) -> None:
    """Remove data dirs not referenced by ANY committed manifest —
    leftovers of a writer that died between data write and commit."""
    dd = os.path.join(table_dir, _DATA_DIR)
    if not os.path.isdir(dd):
        return
    referenced: set[str] = set()
    for v in _versions(table_dir):
        referenced.update(_read_manifest(table_dir, v)["dirs"])
    for name in os.listdir(dd):
        rel = os.path.join(_DATA_DIR, name)
        if _D_RE.match(name) and rel not in referenced:
            shutil.rmtree(os.path.join(table_dir, rel), ignore_errors=True)


def _commit(table_dir: str, manifest: dict) -> None:
    md = _manifest_dir(table_dir)
    os.makedirs(md, exist_ok=True)
    tmp = os.path.join(md, f".tmp-v{manifest['version']}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(md, f"v{manifest['version']}.json"))


def _write_version(
    table_dir: str,
    ds: "ray.data.Dataset",
    version: int,
    dirs: list[str],
    op: str,
) -> dict:
    rel = os.path.join(_DATA_DIR, f"v{version}")
    out = os.path.join(table_dir, rel)
    ds.write_parquet(out)
    manifest = {
        "version": version,
        "op": op,
        "dirs": dirs + [rel],
    }
    _commit(table_dir, manifest)
    return manifest


def append(table_dir: str, ds: "ray.data.Dataset") -> int:
    """Append ``ds`` as a new snapshot (previous data + new files)."""
    os.makedirs(table_dir, exist_ok=True)
    _purge_orphans(table_dir)
    cur = latest_version(table_dir)
    prev_dirs = _read_manifest(table_dir, cur)["dirs"] if cur is not None else []
    version = (cur + 1) if cur is not None else 0
    _write_version(table_dir, ds, version, prev_dirs, "append")
    return version


def overwrite(table_dir: str, ds: "ray.data.Dataset") -> int:
    """Replace the table contents as a new snapshot (old versions
    stay readable until ``vacuum``)."""
    os.makedirs(table_dir, exist_ok=True)
    _purge_orphans(table_dir)
    cur = latest_version(table_dir)
    version = (cur + 1) if cur is not None else 0
    _write_version(table_dir, ds, version, [], "overwrite")
    return version


def read_snapshot(
    table_dir: str, version: int | None = None, **read_kwargs
) -> "ray.data.Dataset":
    """Read a committed snapshot (latest by default) — the union of
    exactly the data dirs its manifest lists."""
    if version is None:
        version = latest_version(table_dir)
    if version is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    man = _read_manifest(table_dir, version)
    # expand to files: read_parquet takes a single dir, but a LIST of
    # paths must be files
    paths = []
    for d in man["dirs"]:
        root = os.path.join(table_dir, d)
        for name in sorted(os.listdir(root)):
            if name.endswith(".parquet"):
                paths.append(os.path.join(root, name))
    return ray.data.read_parquet(paths, **read_kwargs)


def compact(table_dir: str, num_files: int = 4) -> int:
    """Rewrite the CURRENT snapshot into ``num_files`` files as a new
    version; time travel to pre-compaction versions is unaffected."""
    cur = latest_version(table_dir)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    _purge_orphans(table_dir)
    ds = read_snapshot(table_dir, cur).repartition(num_files)
    _write_version(table_dir, ds, cur + 1, [], "compact")
    return cur + 1


def vacuum(table_dir: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` manifests, then remove
    data dirs no retained snapshot references.  Returns the versions
    dropped."""
    vs = _versions(table_dir)
    drop = vs[:-keep_last] if keep_last > 0 else vs
    for v in drop:
        os.remove(os.path.join(_manifest_dir(table_dir), f"v{v}.json"))
    _purge_orphans(table_dir)
    return drop
