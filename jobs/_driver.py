"""Shared scaffolding for the resumable sharded job drivers
(run_extract.py, run_curate.py): Ray session bring-up, manifest
prepare with fresh-wipe + parameter-drift refusal, and the
file-vs-hash shard slicing rules.  ONE copy so a fix to the
sharding/resume logic cannot drift between drivers.
"""
from __future__ import annotations

import hashlib
import os
import shutil
import sys
from typing import List, Optional


def input_files(path: str) -> List[str]:
    """Resolve an input path to its shardable file list.  A Lance
    dataset directory is ONE input, not a file list — its internal
    entries (data/, _versions/, ...) must not be sharded as if they
    were parquet files.  A directory of committed ``part-*``
    partitions (another job's write_table output) descends ONE level
    and shards by the files inside, so composed jobs file-shard their
    upstream phase's output instead of falling back to the
    re-read-per-shard hash path."""
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "_versions")):
            return [path]
        out = []
        for f in os.listdir(path):
            full = os.path.join(path, f)
            if f.startswith(".") or f == "manifest.json":
                continue
            if os.path.isfile(full):
                out.append(full)
            elif f.startswith("part-") and os.path.isdir(full):
                out.extend(os.path.join(full, g)
                           for g in os.listdir(full)
                           if os.path.isfile(os.path.join(full, g))
                           and not g.startswith("."))
        return sorted(out)
    return [path]


def init_session(num_cpus: int) -> None:
    """Job drivers own the Ray session (unlike library/__ray_entry__)."""
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from doc_ocr_ray.runtime import configure_data_context
    configure_data_context(num_cpus)


def files_fingerprint(path: str) -> str:
    """Shard slices depend on the resolved file list — a file added,
    removed, or renamed between runs would silently shift every slice,
    so the list's fingerprint is part of the job identity."""
    return hashlib.md5("\n".join(input_files(path)).encode()).hexdigest()


def prepare_manifest(output: str, job_params: dict, fresh: bool,
                     param_defaults: dict | None = None):
    """Open (or create) the job manifest under ``output``: ``--fresh``
    wipes the manifest AND all committed partitions (stale partitions
    from a prior, possibly differently-sharded run would be unioned
    into reads); resuming with different parameters is refused.
    ``param_defaults`` backfills parameters ADDED to the identity
    after a manifest was written, so upgrading the job code does not
    refuse resume of semantically-identical old runs.
    Returns (manifest, None) or (None, exit_code)."""
    from doc_ocr_ray.state.manifest import JobManifest
    manifest_path = os.path.join(output, "manifest.json")
    if fresh and os.path.isdir(output):
        if os.path.exists(manifest_path):
            os.remove(manifest_path)
        for d in os.listdir(output):
            if d.startswith("part-") or d.startswith(".tmp-"):
                shutil.rmtree(os.path.join(output, d))
    manifest = JobManifest(manifest_path)
    recorded = manifest.records.get("_job")
    if recorded is not None and param_defaults:
        recorded = {**recorded,
                    "params": {**param_defaults,
                               **recorded.get("params", {})}}
    if recorded is not None and recorded.get("params") != job_params:
        print(f"ERROR: existing manifest was written by a job with "
              f"different parameters {recorded.get('params')} != "
              f"{job_params}; shard indices would mean different "
              f"slices. Use --fresh to restart.", file=sys.stderr)
        return None, 2
    if recorded is None:
        manifest.records["_job"] = {"params": job_params}
        manifest._flush()
    return manifest, None


def shard_slice(input_path: str, shard: int, n_shards: int):
    """One shard's slice of a path input as a Dataset, or None when
    the slice is empty.  Sharded by FILE when the path holds multiple
    files (each shard reads only its files); by md5(doc_id) hash for a
    single unsplittable file (one re-read per shard — the documented
    price of independent shard commits)."""
    from doc_ocr_ray.sources.io import read_documents
    files = input_files(input_path)
    if len(files) >= n_shards or len(files) > 1:
        mine = files[shard::n_shards]
        if not mine:
            return None
        return read_documents(mine)
    import pyarrow as pa

    def pick(batch: pa.Table, shard=shard, n=n_shards) -> pa.Table:
        keep = [i for i, d in enumerate(batch["doc_id"].to_pylist())
                if int(hashlib.md5(str(d).encode()).hexdigest()[:8],
                       16) % n == shard]
        # explicit int32 indices: an empty Python list infers a
        # null-typed array and array_take has no (T, null) kernel —
        # any batch with zero matches for this shard would crash
        return batch.take(pa.array(keep, type=pa.int32()))

    return read_documents(input_path).map_batches(
        pick, batch_format="pyarrow")
