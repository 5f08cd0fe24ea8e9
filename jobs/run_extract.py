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
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs._driver import (files_fingerprint, init_session,  # noqa: E402
                          input_files as _input_files, prepare_manifest,
                          shard_slice)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--mega-doc-every", type=int, default=0)
    ap.add_argument("--format", choices=["spans", "html"],
                    default="spans",
                    help="path-input row format: 'spans' = the "
                         "canonical (doc_id, spans) documents table; "
                         "'html' = raw pages (doc_id, html) converted "
                         "through the main-content extractor first")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the prior manifest AND partitions, recompute all")
    args = ap.parse_args()

    import ray
    init_session(args.num_cpus)

    from doc_ocr_ray import synth
    from doc_ocr_ray.pipelines.extract import extract_questions
    from doc_ocr_ray.sources.io import write_table

    job_params = {"input": args.input, "shards": args.shards,
                  "seed": args.seed, "mega_doc_every": args.mega_doc_every,
                  "format": args.format}
    if not args.input.startswith("synth:"):
        job_params["input_files_md5"] = files_fingerprint(args.input)
    manifest, err = prepare_manifest(args.output, job_params, args.fresh,
                                     param_defaults={"format": "spans"})
    if manifest is None:
        ray.shutdown()
        return err

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
            ds = shard_slice(args.input, shard, args.shards)
            if ds is None:
                manifest.mark_done(shard, rows_in=0, rows_out=0,
                                   output="", wall_sec=0.0)
                continue
            rows_in = -1                # unknown without an extra pass
        if args.format == "html" and not args.input.startswith("synth:"):
            # raw crawl pages: main-content extraction nests straight
            # into the canonical documents shape (spans born
            # co-located per page — no restitch shuffle), then the
            # flagship pipeline runs unchanged
            from doc_ocr_ray.stages.html_extract import \
                html_to_documents_batch
            ds = ds.map_batches(html_to_documents_batch,
                                batch_format="pandas")
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
