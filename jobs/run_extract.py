"""Job driver: sharded, resumable extraction — `ray job submit` entrypoint.

    ray job submit -- python jobs/run_extract.py \
        --input synth:100000 --output /tmp/out/extract --shards 16

Each shard is one unit of work: read its slice -> extraction pipeline
-> atomic partitioned write -> manifest commit with lineage counters
(docs in, questions out, wall time).  A rerun with the same --output
skips committed shards (checkpoint resume); resuming with DIFFERENT job
parameters (input/shards/seed) is refused — shard indices would mean
different slices and silently lose data.  ``--fresh`` wipes the
manifest AND all committed partitions.

Input forms:
- ``synth:N``       deterministic N-doc corpus (seeded, range-sharded)
- a path            parquet/lance documents table; sharded by FILE when
                    the path holds multiple files (each shard reads
                    only its files), by doc_id hash for a single file
                    (one re-read per shard — the price of independent
                    shard commits on an unsplittable input)

This script owns the Ray session (unlike the library / __ray_entry__).
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _input_files(path: str):
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "_versions")):
            # a Lance dataset directory is ONE input, not a file list —
            # its internal entries (data/, _versions/, ...) must not be
            # sharded as if they were parquet files
            return [path]
        return sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f))
            and not f.startswith(".") and f != "manifest.json")
    return [path]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--mega-doc-every", type=int, default=0)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the prior manifest AND partitions, recompute all")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from doc_ocr_ray.runtime import configure_data_context
    configure_data_context(args.num_cpus)

    from doc_ocr_ray import synth
    from doc_ocr_ray.pipelines.extract import extract_questions
    from doc_ocr_ray.sources.io import read_documents, write_table
    from doc_ocr_ray.state.manifest import JobManifest

    job_params = {"input": args.input, "shards": args.shards,
                  "seed": args.seed, "mega_doc_every": args.mega_doc_every}
    if not args.input.startswith("synth:"):
        # shard slices depend on the resolved file list — a file added,
        # removed, or renamed between runs would silently shift every
        # slice, so the list's fingerprint is part of the job identity
        import hashlib
        job_params["input_files_md5"] = hashlib.md5(
            "\n".join(_input_files(args.input)).encode()).hexdigest()
    manifest_path = os.path.join(args.output, "manifest.json")
    if args.fresh and os.path.isdir(args.output):
        # stale partitions from a prior (possibly differently-sharded)
        # run would be unioned into reads — remove everything
        if os.path.exists(manifest_path):
            os.remove(manifest_path)
        for d in os.listdir(args.output):
            if d.startswith("part-") or d.startswith(".tmp-"):
                shutil.rmtree(os.path.join(args.output, d))
    manifest = JobManifest(manifest_path)
    recorded = manifest.records.get("_job")
    if recorded is not None and recorded.get("params") != job_params:
        print(f"ERROR: existing manifest was written by a job with "
              f"different parameters {recorded.get('params')} != "
              f"{job_params}; shard indices would mean different slices. "
              f"Use --fresh to restart.", file=sys.stderr)
        ray.shutdown()
        return 2
    if recorded is None:
        manifest.records["_job"] = {"params": job_params}
        manifest._flush()

    t_start = time.time()

    for shard in range(args.shards):
        if manifest.is_done(shard):
            print(f"[shard {shard}] already committed, skipping", flush=True)
            continue
        t0 = time.time()
        if args.input.startswith("synth:"):
            n = int(args.input.split(":", 1)[1])
            per = (n + args.shards - 1) // args.shards
            start = shard * per
            count = max(0, min(per, n - start))
            if count == 0:
                manifest.mark_done(shard, rows_in=0, rows_out=0,
                                   output="", wall_sec=0.0)
                continue
            ds = synth.generate_dataset(count, seed=args.seed,
                                        mega_doc_every=args.mega_doc_every,
                                        start=start)
            rows_in = count
        else:
            files = _input_files(args.input)
            if len(files) >= args.shards or len(files) > 1:
                # file-based sharding: each shard reads ONLY its files
                mine = files[shard::args.shards]
                if not mine:
                    manifest.mark_done(shard, rows_in=0, rows_out=0,
                                       output="", wall_sec=0.0)
                    continue
                ds = read_documents(mine)
                rows_in = -1            # unknown without an extra pass
            else:
                # single unsplittable file: hash-shard by doc_id (each
                # shard re-reads the file — documented trade-off)
                ds = read_documents(args.input)
                import hashlib
                import pyarrow as pa

                def pick(batch: pa.Table, shard=shard,
                         n=args.shards) -> pa.Table:
                    keep = [i for i, d in
                            enumerate(batch["doc_id"].to_pylist())
                            if int(hashlib.md5(d.encode()).hexdigest()[:8],
                                   16) % n == shard]
                    return batch.take(keep)
                ds = ds.map_batches(pick, batch_format="pyarrow")
                rows_in = -1
        out = extract_questions(ds)
        final = write_table(out, args.output, partition_id=shard)
        # per-partition lineage metrics computed from the committed
        # output (group-type counts, split/image/error totals)
        import pyarrow.dataset as pads
        import pyarrow.compute as pc
        part = pads.dataset(final)
        cols = part.to_table(columns=["group_type", "split_from_merged",
                                      "n_images", "doc_id"])
        rows_out = cols.num_rows
        gt = cols["group_type"]
        metrics = {
            # docs that produced >=1 output row — NOT docs read (a doc
            # with no extractable content is invisible here); rows_in
            # stays -1 = unknown for path inputs, and summary() reports
            # incompleteness instead of summing the sentinel
            "docs_with_output": pc.count_distinct(cols["doc_id"]).as_py(),
            "questions": pc.sum(pc.cast(pc.equal(gt, "question"),
                                        "int64")).as_py() or 0,
            "errors": pc.sum(pc.cast(pc.equal(gt, "error"),
                                     "int64")).as_py() or 0,
            "splits": pc.sum(pc.cast(cols["split_from_merged"],
                                     "int64")).as_py() or 0,
            "images_claimed": pc.sum(cols["n_images"]).as_py() or 0,
        }
        wall = time.time() - t0
        manifest.mark_done(shard, rows_in=rows_in, rows_out=rows_out,
                           output=final, wall_sec=wall, extra=metrics)
        print(f"[shard {shard}] docs_in={rows_in} questions_out={rows_out} "
              f"wall={wall:.1f}s", flush=True)

    summary = manifest.summary()
    summary["job_wall_sec"] = round(time.time() - t_start, 3)
    print(json.dumps(summary), flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
