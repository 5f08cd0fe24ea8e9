"""Sources & sinks (S1/S4 of SURVEY.md section 2.1).

Lance is the contract's table format but pylance is not installed in
this environment, so the storage layer is format-agnostic: Lance when
importable, Parquet (identical schema, fragment-per-file layout)
otherwise.  Outputs are partitioned one directory per shard and written
atomically (tmp + rename) so a restarted job skips committed shards —
see state/manifest.py.
"""
from __future__ import annotations

import os
from typing import List, Optional


def _have_lance() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


def read_documents(uri: str, columns: Optional[List[str]] = None):
    """Interleaved-document table -> ray.data.Dataset.

    Engine twin of the reference's layout-JSON reader
    (extractor.py:63-74): the fixture converter (fixtures.py) turns
    those JSONs into rows of this table.
    """
    import ray.data
    if isinstance(uri, (list, tuple)):
        # explicit file list (e.g. one shard's slice of a directory).
        # read_lance only accepts a single dataset uri, so lance entries
        # read individually and union; a mixed list is an error.
        lances = [u for u in uri if str(u).endswith(".lance")]
        if lances and len(lances) != len(uri):
            raise ValueError("mixed lance/parquet file list")
        if lances:
            dsets = [ray.data.read_lance(u, columns=columns) for u in lances]
            return dsets[0] if len(dsets) == 1 else dsets[0].union(*dsets[1:])
        return ray.data.read_parquet(list(uri), columns=columns)
    if uri.endswith(".lance") or (os.path.isdir(uri) and _have_lance()
                                  and os.path.exists(os.path.join(uri, "_versions"))):
        return ray.data.read_lance(uri, columns=columns)
    return ray.data.read_parquet(uri, columns=columns)


def read_documents_jsonl(uri, columns: Optional[List[str]] = None):
    """JSONL documents table -> ray.data.Dataset — the arrival format
    of most web-corpus drops (Dolma / Common Crawl derivatives ship
    newline-delimited JSON, not parquet).  Distributed line-parallel
    parse via ``ray.data.read_json``; pass ``columns`` to prune after
    parse (JSON is row-major, so unlike parquet the prune cannot skip
    IO — re-encode hot corpora to parquet/lance for the scale path,
    which is exactly what a first curation pass does)."""
    import ray.data
    ds = ray.data.read_json(uri)
    return ds.select_columns(columns) if columns else ds


def write_table(ds, out_dir: str, partition_id: Optional[int] = None):
    """Atomic partitioned write: stream into ``<out_dir>/.tmp-<id>``,
    rename to ``<out_dir>/part-<id>`` on success.  The rename is the
    commit point; a crashed write leaves only a tmp dir that a rerun
    overwrites."""
    name = f"part-{partition_id:05d}" if partition_id is not None else "part-00000"
    tmp = os.path.join(out_dir, f".tmp-{name}")
    final = os.path.join(out_dir, name)
    os.makedirs(out_dir, exist_ok=True)
    if os.path.exists(final):
        import shutil
        shutil.rmtree(final)
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    if _have_lance():
        ds.write_lance(tmp)
    else:
        ds.write_parquet(tmp)
    # a zero-row dataset writes NOTHING (no tmp dir) — an all-filtered
    # shard is still a legitimately committed, empty partition.  Write a
    # schema-bearing zero-row file so the partition list stays readable
    # (read_parquet over a path list chokes on a file-less directory).
    os.makedirs(tmp, exist_ok=True)
    if not os.listdir(tmp):
        _write_empty_marker(ds, tmp)
    os.replace(tmp, final)
    return final


def _write_empty_marker(ds, tmp: str) -> None:
    """Persist a zero-row parquet file carrying the dataset's schema (if
    known) into ``tmp`` so empty partitions read back like any other."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    try:
        sch = ds.schema()
    except Exception:
        sch = None
    base = getattr(sch, "base_schema", None)
    if not isinstance(base, pa.Schema):
        base = pa.schema([])
    pq.write_table(base.empty_table(), os.path.join(tmp, "empty.parquet"))


def read_questions(out_dir: str):
    """Read back a partitioned questions output directory."""
    import ray.data
    parts = sorted(os.path.join(out_dir, d) for d in os.listdir(out_dir)
                   if d.startswith("part-"))
    if not parts:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    # skip file-less partitions (all-filtered shards from before the
    # empty-marker fix); zero-row marker files read back like any other
    nonempty = [p for p in parts if os.listdir(p)]
    if not nonempty:
        import pyarrow as pa
        return ray.data.from_arrow(pa.table({}))
    parts = nonempty
    if _have_lance():
        # partitions were written as Lance datasets: read each and union
        dsets = [ray.data.read_lance(p) for p in parts]
        return dsets[0] if len(dsets) == 1 else dsets[0].union(*dsets[1:])
    # read_parquet accepts a list of FILES or one directory, not a list
    # of directories — enumerate the committed files explicitly
    files: List[str] = []
    for p in parts:
        for root, _dirs, fnames in os.walk(p):
            files.extend(os.path.join(root, f) for f in sorted(fnames)
                         if f.endswith(".parquet"))
    if not files:
        import pyarrow as pa
        return ray.data.from_arrow(pa.table({}))
    return ray.data.read_parquet(files)
