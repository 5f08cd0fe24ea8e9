"""Job driver: resumable GLOBAL exact dedup — `ray job submit`
entrypoint for cross-shard duplicate elimination.

    ray job submit -- python jobs/run_dedup.py \
        --input /data/documents --output /tmp/out/dedup \
        --shards 16 --buckets 32

Cross-shard dedup is NOT shard-independent (a duplicate pair can
straddle any two shards), so the job runs the classic two-phase
checkpointed shuffle — the shuffle itself is materialized as a
hive-partitioned spill so BOTH sides resume at partition
granularity (the MapReduce discipline; the steady-state in-memory
path is ``stages/dedup.exact_dedup`` — this job trades one disk
round-trip for crash-resumability on day-long corpus runs):

- **Phase 1, one task per input shard (resumable per shard):** read
  the shard slice, normalize text and compute its full 128-bit md5
  (the compare key — doc text itself never rides the spill; the
  envelope is an md5 collision, ~2^-64 at 10^12 docs), pre-combine
  in-batch (min doc_id per key is associative), and commit ONE
  atomic part dir hive-partitioned by the md5's coarse bucket.  A
  per-batch ``n_raw`` partial rides the spill so exact input counts
  come from a cheap single-int64-column readback, never a second
  corpus read — lineage totals are deterministic regardless of how
  Ray blocks the input (the in-batch combiner makes spill row
  counts batching-dependent; ``n_raw`` sums are not).
- **Phase 2, one task per bucket (resumable per bucket):** read
  every shard's spill files for this bucket only, keep the min
  doc_id per md5, and commit the bucket's survivors as an atomic
  output partition with lineage (rows_in, n_unique, n_dups).

A killed run resumes exactly: committed phase-1 shards and phase-2
buckets are skipped (manifest ids ``s`` and ``100000 + b``);
``--fresh`` wipes everything.  Output: ``part-*`` parquet of
``(doc_id, text_md5)`` survivors — the doc_id set a downstream
filter pass (semi-join, e.g. ``bloom_semi_join``) applies to the
corpus proper.

This script owns the Ray session (unlike the library / __ray_entry__).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs._driver import (files_fingerprint, init_session,  # noqa: E402
                          prepare_manifest, shard_slice)

PHASE2_BASE = 100000


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet/lance path (doc_id, text)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()

    import ray
    init_session(args.num_cpus)

    import numpy as np
    import pandas as pd

    from doc_ocr_ray.sources.io import write_table
    from doc_ocr_ray.util import typed_if_empty

    job_params = {"input": args.input, "shards": args.shards,
                  "buckets": args.buckets,
                  "input_files_md5": files_fingerprint(args.input)}
    phase1 = os.path.join(args.output, "phase1")
    if args.fresh and os.path.isdir(phase1):
        # prepare_manifest wipes only the top-level part dirs; stale
        # phase-1 spill from a differently-sharded run would be
        # globbed into phase 2
        import shutil
        shutil.rmtree(phase1)
    manifest, err = prepare_manifest(args.output, job_params, args.fresh)
    if manifest is None:
        ray.shutdown()
        return err

    n_buckets = args.buckets
    t_start = time.time()

    def key_batch(batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        from doc_ocr_ray.stages.dedup import _normalize
        norm = _normalize(batch["text"])
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in norm]
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "text_md5": pd.Series(md5s, dtype="object")})
        # in-batch combiner: min doc_id per key is associative, so
        # the spill never carries two rows for one key from one batch
        out = out.sort_values("doc_id").drop_duplicates("text_md5")
        from doc_ocr_ray.util import coarse_part
        out["bucket"] = coarse_part(out["text_md5"], n_buckets)
        # exact-input-count partial (see module docstring)
        out = out.reset_index(drop=True)
        out["n_raw"] = np.int64(0)
        if len(out):
            out.loc[0, "n_raw"] = np.int64(len(batch))
        return typed_if_empty(out)

    # ---- phase 1: keyed spill, one atomic commit per input shard
    for shard in range(args.shards):
        if manifest.is_done(shard):
            print(f"[p1 shard {shard}] already committed, skipping",
                  flush=True)
            continue
        t0 = time.time()
        ds = shard_slice(args.input, shard, args.shards)
        if ds is None:
            manifest.mark_done(shard, rows_in=0, rows_out=0,
                               output="", wall_sec=0.0)
            continue
        keyed = ds.map_batches(key_batch, batch_format="pandas")
        final = write_table(keyed, phase1, partition_id=shard,
                            partition_cols=["bucket"])
        import pyarrow.dataset as pads
        spilled = pads.dataset(final)
        tbl = spilled.to_table(columns=["n_raw"])   # one int64 column
        rows_in = int(tbl["n_raw"].to_numpy().sum()) if tbl.num_rows else 0
        rows_out = spilled.count_rows()
        wall = time.time() - t0
        manifest.mark_done(shard, rows_in=rows_in, rows_out=rows_out,
                           output=final, wall_sec=wall)
        print(f"[p1 shard {shard}] in={rows_in} spilled={rows_out} "
              f"wall={wall:.1f}s", flush=True)

    # ---- phase 2: per-bucket reduce, one atomic commit per bucket
    for b in range(n_buckets):
        mid = PHASE2_BASE + b
        if manifest.is_done(mid):
            print(f"[p2 bucket {b}] already committed, skipping",
                  flush=True)
            continue
        t0 = time.time()
        files = sorted(glob.glob(
            os.path.join(phase1, "part-*", f"bucket={b}", "*.parquet")))
        if not files:
            manifest.mark_done(mid, rows_in=0, rows_out=0,
                               output="", wall_sec=0.0,
                               extra={"n_dups": 0})
            continue
        import pyarrow.dataset as pads
        rows_in = pads.dataset(files).count_rows()  # metadata only
        spill = ray.data.read_parquet(files)

        def reduce_bucket(group: pd.DataFrame) -> pd.DataFrame:
            g = group.sort_values("doc_id")
            return typed_if_empty(
                g.drop_duplicates("text_md5")[["doc_id", "text_md5"]])

        def part_col(batch: pd.DataFrame) -> pd.DataFrame:
            from doc_ocr_ray.util import coarse_part
            out = batch[["doc_id", "text_md5"]].copy()
            out["part"] = coarse_part(out["text_md5"], 64)
            return typed_if_empty(out)

        winners = (spill.map_batches(part_col, batch_format="pandas")
                   .groupby("part")
                   .map_groups(reduce_bucket, batch_format="pandas"))
        final = write_table(winners, args.output, partition_id=b,
                            parquet_only=True)
        n_out = pads.dataset(final).count_rows()
        wall = time.time() - t0
        manifest.mark_done(mid, rows_in=rows_in, rows_out=n_out,
                           output=final, wall_sec=wall,
                           extra={"n_dups": rows_in - n_out})
        print(f"[p2 bucket {b}] in={rows_in} unique={n_out} "
              f"wall={wall:.1f}s", flush=True)

    summary = manifest.summary()
    recs = {k: r for k, r in manifest.records.items()
            if k != "_job" and r.get("state") == "done"}
    p1 = [r for k, r in recs.items() if int(k) < PHASE2_BASE]
    p2 = [r for k, r in recs.items() if int(k) >= PHASE2_BASE]
    summary["p1_shards"] = len(p1)
    summary["p2_buckets"] = len(p2)
    summary["rows_in"] = sum(r.get("rows_in", 0) for r in p1)
    summary["n_unique"] = sum(r.get("rows_out", 0) for r in p2)
    # exact and batching-independent: true input total minus unique
    summary["n_dups"] = summary["rows_in"] - summary["n_unique"]
    summary["job_wall_sec"] = round(time.time() - t_start, 3)
    print(json.dumps(summary), flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
