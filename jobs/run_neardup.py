"""Job driver: resumable GLOBAL MinHash-LSH near-duplicate
elimination — `ray job submit` entrypoint for cross-shard fuzzy dedup
(the Common-Crawl-scale counterpart of jobs/run_dedup.py's exact
pass; cf. Lee et al. 2021 "Deduplicating Training Data Makes
Language Models Better" for why near-dedup is a separate, mandatory
pass).

    ray job submit -- python jobs/run_neardup.py \
        --input /data/documents --output /tmp/out/neardup \
        --shards 16 --buckets 32 --threshold 0.8

Near-dup candidates straddle shards exactly like exact duplicates,
so the job is the same two-phase checkpointed shuffle with a third
global clustering step (the in-memory steady-state path is
``stages/dedup.minhash_dedup_pairs`` + ``dedup_clusters``; this
trades disk round-trips for crash-resume on day-long runs):

- **Phase 1, per input shard (resumable per shard):** shingle +
  MinHash-sign the shard (``MinHashStage`` — permutation params
  built once per worker), explode signatures into band rows
  (``_explode_bands``), and commit ONE atomic part dir
  hive-partitioned by ``band_hash % buckets``.  Text never rides the
  spill — band rows carry (doc_id, band, band_hash, signature) at
  num_perm*4 B/row.  A per-batch ``n_raw`` doc-count partial rides
  along so lineage totals are batching-independent.
- **Phase 2, per bucket (resumable per bucket):** read every
  shard's spill for this bucket only, enumerate candidate pairs
  inside each (band, band_hash) group and verify by signature
  agreement >= ``threshold`` (``band_bucket_pairs`` — the SAME
  reduce the in-memory operator runs), and commit the bucket's
  verified pairs atomically with (rows_in, n_pairs) lineage.
- **Phase 3, global clustering (one resumable step):** cross-bucket
  pair dedupe (the same pair can surface from two bands in two
  different buckets) on a coarse pair-hash exchange, then
  distributed connected components (``dedup_clusters`` — sharded
  label propagation + pointer jumping, nothing graph-sized on the
  driver) and commit ``(doc_id, keep_id)`` rows for every document
  to DROP (keep_id = its cluster's min doc_id).  Single-partition
  granularity is the honest contract here: CC is global by nature,
  and its input (verified pairs) is output-sized, not corpus-sized.

A killed run resumes exactly: committed phase-1 shards (manifest id
``s``), phase-2 buckets (``100000 + b``) and the phase-3 step
(``200000``) are skipped; ``--fresh`` wipes everything including the
spill.  Output: ``part-*`` parquet of (doc_id, keep_id) drop rows —
apply with an anti-semi-join (e.g. ``bloom_semi_join``) over the
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
PHASE3_ID = 200000
PHASE4_BASE = 300000


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet/lance path (doc_id, text)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--num-perm", type=int, default=64)
    ap.add_argument("--num-bands", type=int, default=16)
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--apply", action="store_true",
                    help="phase 4: write the deduplicated corpus "
                         "(per-shard anti-join against the drop table)")
    args = ap.parse_args()

    import ray
    init_session(args.num_cpus)

    import numpy as np
    import pandas as pd

    from doc_ocr_ray.sources.io import write_table
    from doc_ocr_ray.stages.dedup import (MinHashStage, _explode_bands,
                                          band_bucket_pairs,
                                          dedup_clusters)
    from doc_ocr_ray.util import typed_if_empty

    job_params = {"input": args.input, "shards": args.shards,
                  "buckets": args.buckets, "num_perm": args.num_perm,
                  "num_bands": args.num_bands,
                  "shingle_k": args.shingle_k,
                  "threshold": args.threshold,
                  "input_files_md5": files_fingerprint(args.input)}
    phase1 = os.path.join(args.output, "phase1")
    phase2 = os.path.join(args.output, "phase2")
    if args.fresh:
        # wipe ALL derived dirs, including the phase-4 corpus:
        # prepare_manifest clears only top-level part-*, and a stale
        # corpus shard from a differently-sharded run would be
        # globbed into downstream reads
        import shutil
        for d in (phase1, phase2, os.path.join(args.output, "corpus")):
            if os.path.isdir(d):
                shutil.rmtree(d)
    manifest, err = prepare_manifest(args.output, job_params, args.fresh)
    if manifest is None:
        ray.shutdown()
        return err

    n_buckets = args.buckets
    t_start = time.time()

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out = _explode_bands(batch, num_bands=args.num_bands)
        out["bucket"] = (out["band_hash"] % n_buckets).astype("int64")
        out = out.reset_index(drop=True)
        # batching-independent doc-count partial (CLAUDE.md lineage
        # rule): band rows are num_bands x docs, so counting spill
        # rows would overstate by the band factor AND depend on the
        # in-flight block layout
        out["n_raw"] = np.int64(0)
        if len(out):
            out.loc[0, "n_raw"] = np.int64(len(batch))
        return typed_if_empty(out)

    # ---- phase 1: sign + band + keyed spill, one commit per shard
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
        sigs = ds.map_batches(
            MinHashStage, batch_format="pandas",
            fn_constructor_kwargs={"num_perm": args.num_perm,
                                   "shingle_k": args.shingle_k},
            concurrency=(1, max(2, args.num_cpus // 4)))
        banded = sigs.map_batches(band_rows, batch_format="pandas")
        final = write_table(banded, phase1, partition_id=shard,
                            partition_cols=["bucket"])
        import pyarrow.dataset as pads
        spilled = pads.dataset(final)
        tbl = spilled.to_table(columns=["n_raw"])   # one int64 column
        rows_in = int(tbl["n_raw"].to_numpy().sum()) if tbl.num_rows else 0
        rows_out = spilled.count_rows()
        wall = time.time() - t0
        manifest.mark_done(shard, rows_in=rows_in, rows_out=rows_out,
                           output=final, wall_sec=wall)
        print(f"[p1 shard {shard}] docs={rows_in} band_rows={rows_out} "
              f"wall={wall:.1f}s", flush=True)

    # ---- phase 2: per-bucket pair enumeration + verify
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
                               extra={"n_pairs": 0})
            continue
        import pyarrow.dataset as pads
        rows_in = pads.dataset(files).count_rows()  # metadata only
        spill = ray.data.read_parquet(files)

        def add_part(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[["doc_id", "band", "band_hash",
                         "signature"]].copy()
            out["part"] = (out["band_hash"] % 256).astype("int64")
            return typed_if_empty(out)

        def part_pairs(group: pd.DataFrame) -> pd.DataFrame:
            # clique_star: identical-signature clusters (the crawl's
            # boilerplate/empty-page masses) emit O(b) star edges
            # instead of O(b^2) pairs — CC drop set provably equal
            return typed_if_empty(
                band_bucket_pairs(group, args.threshold,
                                  clique_star=True))

        pairs = (spill.map_batches(add_part, batch_format="pandas")
                 .groupby("part")
                 .map_groups(part_pairs, batch_format="pandas"))
        final = write_table(pairs, phase2, partition_id=b,
                            parquet_only=True)
        n_pairs = pads.dataset(final).count_rows()
        wall = time.time() - t0
        manifest.mark_done(mid, rows_in=rows_in, rows_out=n_pairs,
                           output=final, wall_sec=wall,
                           extra={"n_pairs": n_pairs})
        print(f"[p2 bucket {b}] band_rows={rows_in} pairs={n_pairs} "
              f"wall={wall:.1f}s", flush=True)

    # ---- phase 3: cross-bucket pair dedupe + connected components
    if manifest.is_done(PHASE3_ID):
        print("[p3 cluster] already committed, skipping", flush=True)
    else:
        t0 = time.time()
        pfiles = sorted(glob.glob(
            os.path.join(phase2, "part-*", "*.parquet")))
        import pyarrow.dataset as pads
        rows_in = pads.dataset(pfiles).count_rows() if pfiles else 0
        if rows_in == 0:
            manifest.mark_done(PHASE3_ID, rows_in=0, rows_out=0,
                               output="", wall_sec=0.0,
                               extra={"n_dup_docs": 0})
        else:
            raw_pairs = ray.data.read_parquet(pfiles)

            def pair_part(batch: pd.DataFrame) -> pd.DataFrame:
                out = batch[["doc_a", "doc_b"]].copy()
                out["ppart"] = ((out["doc_a"] * 31 + out["doc_b"])
                                % 64).astype("int64")
                return typed_if_empty(out)

            def drop_dup(group: pd.DataFrame) -> pd.DataFrame:
                return typed_if_empty(
                    group.drop_duplicates(["doc_a", "doc_b"])
                    [["doc_a", "doc_b"]])

            pairs = (raw_pairs.map_batches(pair_part,
                                           batch_format="pandas")
                     .groupby("ppart")
                     .map_groups(drop_dup, batch_format="pandas"))
            clusters = dedup_clusters(pairs)

            def drops(batch: pd.DataFrame) -> pd.DataFrame:
                hit = batch[batch["doc_id"] != batch["cluster"]]
                return typed_if_empty(pd.DataFrame({
                    "doc_id": hit["doc_id"].astype("int64"),
                    "keep_id": hit["cluster"].astype("int64")}))

            dup_rows = clusters.map_batches(drops,
                                            batch_format="pandas")
            final = write_table(dup_rows, args.output, partition_id=0,
                                parquet_only=True)
            n_drop = pads.dataset(final).count_rows()
            wall = time.time() - t0
            manifest.mark_done(PHASE3_ID, rows_in=rows_in,
                               rows_out=n_drop, output=final,
                               wall_sec=wall,
                               extra={"n_dup_docs": n_drop})
            print(f"[p3 cluster] pairs_in={rows_in} drop_docs={n_drop} "
                  f"wall={wall:.1f}s", flush=True)

    # ---- phase 4 (--apply): write the deduplicated corpus itself —
    # per input shard (resumable per shard), survivors = shard rows
    # anti-joined against the drop table through Ray's NATIVE hash
    # join (the drop side is dup-count-sized but can approach corpus
    # scale on a highly redundant crawl, so it is hash-partitioned,
    # never broadcast).  --apply is additive: it is deliberately NOT
    # part of the resume identity, so a finished 3-phase run can be
    # re-invoked with --apply and reuse every committed phase.
    if args.apply:
        nparts = max(2, args.num_cpus // 2)
        drop_files = sorted(glob.glob(
            os.path.join(args.output, "part-00000", "*.parquet")))
        corpus_dir = os.path.join(args.output, "corpus")
        for shard in range(args.shards):
            mid = PHASE4_BASE + shard
            if manifest.is_done(mid):
                print(f"[p4 shard {shard}] already committed, skipping",
                      flush=True)
                continue
            t0 = time.time()
            ds = shard_slice(args.input, shard, args.shards)
            if ds is None:
                manifest.mark_done(mid, rows_in=0, rows_out=0,
                                   output="", wall_sec=0.0)
                continue
            if drop_files:
                drops_ds = (ray.data.read_parquet(
                    drop_files, columns=["doc_id"]))
                kept = ds.join(drops_ds, join_type="left_anti",
                               num_partitions=nparts, on=("doc_id",))
            else:
                kept = ds
            final = write_table(kept, corpus_dir, partition_id=shard,
                                parquet_only=True)
            import pyarrow.dataset as pads
            # the raw shard size was already committed by phase 1 —
            # a ds.count() here would re-run the full shard scan
            n_in = manifest.records.get(str(shard), {}).get("rows_in", 0)
            n_out = pads.dataset(final).count_rows()
            wall = time.time() - t0
            manifest.mark_done(mid, rows_in=n_in, rows_out=n_out,
                               output=final, wall_sec=wall)
            print(f"[p4 shard {shard}] in={n_in} kept={n_out} "
                  f"wall={wall:.1f}s", flush=True)

    summary = manifest.summary()
    recs = {k: r for k, r in manifest.records.items()
            if k != "_job" and r.get("state") == "done"}
    p1 = [r for k, r in recs.items() if int(k) < PHASE2_BASE]
    p2 = [r for k, r in recs.items()
          if PHASE2_BASE <= int(k) < PHASE3_ID]
    p3 = recs.get(str(PHASE3_ID), {})
    summary["p1_shards"] = len(p1)
    summary["p2_buckets"] = len(p2)
    summary["n_docs"] = sum(r.get("rows_in", 0) for r in p1)
    summary["n_pairs_raw"] = sum(r.get("rows_out", 0) for r in p2)
    summary["n_dup_docs"] = p3.get("n_dup_docs", p3.get("rows_out", 0))
    p4 = [r for k, r in recs.items() if int(k) >= PHASE4_BASE]
    if p4:
        summary["n_kept_docs"] = sum(r.get("rows_out", 0) for r in p4)
    summary["job_wall_sec"] = round(time.time() - t_start, 3)
    print(json.dumps(summary), flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
