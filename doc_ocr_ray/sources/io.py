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


def read_documents_jsonl(uri, columns: Optional[List[str]] = None,
                         compression: Optional[str] = None):
    """JSONL documents table -> ray.data.Dataset — the arrival format
    of most web-corpus drops (Dolma / Common Crawl derivatives ship
    newline-delimited JSON, not parquet; usually GZIPPED).
    Distributed line-parallel parse via ``ray.data.read_json``, which
    detects gzip PER FILE from the path (``pa.Codec.detect``), so
    plain and ``.jsonl.gz`` members mix freely in one list.  Pass
    ``compression`` only to FORCE one codec for suffix-less paths
    (it applies to every file — don't combine with a mixed list).
    Pass ``columns`` to prune after parse (JSON is row-major, so
    unlike parquet the prune cannot skip IO — re-encode hot corpora
    to parquet/lance for the scale path, which is exactly what a
    first curation pass does)."""
    import ray.data
    kwargs = ({"arrow_open_stream_args": {"compression": compression}}
              if compression else {})
    ds = ray.data.read_json(uri, **kwargs)
    return ds.select_columns(columns) if columns else ds


def read_orc(uri, columns: Optional[List[str]] = None):
    """Distributed ORC read — the remaining big-data arrival format
    (Hive/Trino exports) with no native Ray Data reader in this Ray
    version: file-parallel via ``read_binary_files`` (one decode task
    per file, the same granularity Ray's own file-based datasources
    use), parsed per task with ``pyarrow.orc``.  ``columns`` prunes
    at the stripe reader, so only requested columns leave the ORC
    decoder.  Scale shape: parallelism = file count (the writer-side
    contract for every file-sharded format here); stripe-level splits
    would need a footer pre-pass and are not worth it below
    multi-GB-per-file layouts."""
    import ray.data

    def parse(batch):
        import io as _io

        import pyarrow as pa
        import pyarrow.orc as _orc
        tables = [
            _orc.ORCFile(_io.BytesIO(payload)).read(columns=columns)
            for payload in batch["bytes"].to_pylist()]
        return pa.concat_tables(tables)

    # batch_size=1: one ORC file per decode call keeps peak memory at
    # one file's decoded size and parallelism at the file count
    return ray.data.read_binary_files(uri).map_batches(
        parse, batch_format="pyarrow", batch_size=1)


def write_orc_shards(table, out_dir: str, num_shards: int = 8) -> str:
    """Testbed/export writer: slice an in-memory Arrow table into
    ``num_shards`` ORC files (atomic tmp+rename).  Driver-side by
    design — it exists to materialize bounded testbeds and final
    exports, not to stream a corpus (write Parquet for that)."""
    import pyarrow.orc as _orc
    tmp = out_dir + ".tmp"
    if os.path.isdir(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    n = table.num_rows
    per = max(1, (n + num_shards - 1) // num_shards)
    for s in range(num_shards):
        sl = table.slice(s * per, per)
        if sl.num_rows == 0 and s > 0:
            continue
        # shard 0 always writes, even zero-row: an empty table commits
        # a schema-bearing empty .orc so read_orc round-trips (the
        # empty-partition convention every sink here follows)
        _orc.write_table(sl, os.path.join(tmp, f"part-{s:05d}.orc"))
    if os.path.isdir(out_dir):
        import shutil
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return out_dir


def write_table(ds, out_dir: str, partition_id: Optional[int] = None,
                partition_cols=None, parquet_only: bool = False):
    """Atomic partitioned write: stream into ``<out_dir>/.tmp-<id>``,
    rename to ``<out_dir>/part-<id>`` on success.  The rename is the
    commit point; a crashed write leaves only a tmp dir that a rerun
    overwrites.  ``partition_cols`` hive-partitions the files INSIDE
    the part directory (``part-<id>/col=v/...``) — the spill layout
    the two-phase resumable shuffle jobs key their reduce side on —
    while the rename keeps the whole shard one atomic commit."""
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
    if partition_cols:
        ds.write_parquet(tmp, partition_cols=list(partition_cols))
    elif _have_lance() and not parquet_only:
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


def write_clustered(ds, out_dir: str, key: str, num_shards: int = 8,
                    sample_size: int = 10_000):
    """Range-clustered parquet write with a zone-map manifest — the
    output layout that makes later point/range reads CHEAP: rows
    range-partition by ``key`` (shard bounds from a driver-side
    sample, exact per-shard min/max recorded after the fact), one
    directory per shard written atomically, and ``manifest.json``
    mapping shard -> (min, max, rows).  A reader prunes shards whose
    [min, max] misses its predicate BEFORE any file is opened (see
    :func:`read_clustered_range`) — the storage-level analog of
    parquet row-group pruning, but at directory granularity so a
    256-node job skips whole shards.

    The sample only picks BOUNDARIES (skew moves rows between
    shards, never breaks correctness); the manifest min/max are exact
    aggregates of what each shard actually holds.  The key must be an
    integer column (the manifest stores exact ints; a float key would
    truncate and mis-prune — refused loudly).  Boundary candidates
    come from a BLOCK-SPREAD stride (every block contributes evenly
    spaced keys), not a prefix — ``limit()`` on key-sorted input
    would draw every boundary from the lowest keys and degenerate the
    layout to one giant shard.
    """
    import json
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    if not pa.types.is_integer(ktype):
        raise ValueError(
            f"write_clustered key must be an integer column, got "
            f"{ktype} — the zone-map manifest stores exact ints")

    per_block = max(16, sample_size // 64)

    def key_stride(batch: pd.DataFrame) -> pd.DataFrame:
        idx = np.linspace(0, len(batch) - 1,
                          min(per_block, len(batch))).astype(int)
        return pd.DataFrame({key: batch[key].to_numpy()[np.unique(idx)]})

    sample = (ds.select_columns([key])
              .map_batches(key_stride, batch_format="pandas")
              .limit(sample_size).to_pandas())
    if sample.empty:
        # empty input: commit an empty-but-valid manifest
        tmp0 = out_dir + ".tmp"
        if os.path.isdir(tmp0):
            import shutil
            shutil.rmtree(tmp0)
        os.makedirs(tmp0)
        with open(os.path.join(tmp0, "manifest.json"), "w") as f:
            json.dump({"key": key, "shards": {}}, f, indent=1)
        if os.path.isdir(out_dir):
            import shutil
            shutil.rmtree(out_dir)
        os.replace(tmp0, out_dir)
        return {}
    vals = np.sort(sample[key].to_numpy())
    qs = np.linspace(0, len(vals) - 1, num_shards + 1)[1:-1]
    bounds = np.unique(vals[qs.astype(int)]) if len(vals) else np.array([])

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__shard"] = np.searchsorted(
            bounds, batch[key].to_numpy(), side="right").astype("int64")
        return batch

    tmp = out_dir + ".tmp"
    if os.path.isdir(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    manifest = {}

    def write_shard(group: pd.DataFrame) -> pd.DataFrame:
        sid = int(group["__shard"].iloc[0])
        g = group.drop(columns="__shard").sort_values(key)
        path = os.path.join(tmp, f"shard-{sid:05d}.parquet")
        g.to_parquet(path, index=False)
        return pd.DataFrame({"shard": [sid],
                             "min": [int(g[key].min())],
                             "max": [int(g[key].max())],
                             "rows": [len(g)]})

    stats = (ds.map_batches(assign, batch_format="pandas")
             .groupby("__shard")
             .map_groups(write_shard, batch_format="pandas")
             .to_pandas())
    for _, r in stats.iterrows():
        manifest[str(int(r["shard"]))] = {
            "min": int(r["min"]), "max": int(r["max"]),
            "rows": int(r["rows"])}
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump({"key": key, "shards": manifest}, f, indent=1)
    if os.path.isdir(out_dir):
        # rename(2) cannot replace a non-empty dir: clear a previous
        # layout so a refresh to the same path succeeds atomically
        import shutil
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return manifest


def read_clustered_range(out_dir: str, lo: int, hi: int):
    """Manifest-pruned range read over a :func:`write_clustered`
    layout: only shards whose [min, max] intersects ``[lo, hi]`` are
    opened; the residual row filter applies inside the read.  Returns
    ``(dataset, n_shards_read, n_shards_total)`` so callers (and
    tests) can assert the pruning actually happened.
    """
    import json
    import os

    import ray.data

    with open(os.path.join(out_dir, "manifest.json")) as f:
        mf = json.load(f)
    key = mf["key"]
    hit = [s for s, m in mf["shards"].items()
           if not (m["max"] < lo or m["min"] > hi)]
    if not hit:
        return None, 0, len(mf["shards"])
    files = [os.path.join(out_dir, f"shard-{int(s):05d}.parquet")
             for s in sorted(hit, key=int)]
    import pyarrow.dataset as pads
    ds = ray.data.read_parquet(
        files, filter=(pads.field(key) >= lo) & (pads.field(key) <= hi))
    return ds, len(hit), len(mf["shards"])
