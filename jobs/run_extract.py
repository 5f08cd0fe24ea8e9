"""Job driver: sharded, resumable extraction — `ray job submit` entrypoint.

    ray job submit -- python jobs/run_extract.py \
        --input synth:100000 --output /tmp/out/extract --shards 16

Each shard is one unit of work: read its slice -> extraction pipeline
-> atomic partitioned write -> manifest commit with lineage counters
(docs in, questions out, wall time).  A rerun with the same --output
skips committed shards (checkpoint resume); `--resume` is therefore
the default behavior and `--fresh` wipes the manifest.

Input forms:
- ``synth:N``       deterministic N-doc corpus (seeded)
- a path            parquet/lance documents table (doc_id, spans)

This script owns the Ray session (unlike the library / __ray_entry__).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
                    help="ignore a prior manifest and recompute all shards")
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

    manifest_path = os.path.join(args.output, "manifest.json")
    if args.fresh and os.path.exists(manifest_path):
        os.remove(manifest_path)
    manifest = JobManifest(manifest_path)

    t_start = time.time()
    total_in = total_out = 0

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
            ds = read_documents(args.input)
            # hash-shard by doc_id so every shard is a disjoint slice
            # (stable md5, independent of file layout)
            import hashlib
            import pyarrow as pa

            def pick(batch: pa.Table, shard=shard, n=args.shards) -> pa.Table:
                keep = [i for i, d in enumerate(batch["doc_id"].to_pylist())
                        if int(hashlib.md5(d.encode()).hexdigest()[:8], 16)
                        % n == shard]
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
                                      "n_images"])
        rows_out = cols.num_rows
        gt = cols["group_type"]
        metrics = {
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
        total_in += max(0, rows_in)
        total_out += rows_out
        print(f"[shard {shard}] docs_in={rows_in} questions_out={rows_out} "
              f"wall={wall:.1f}s", flush=True)

    summary = manifest.summary()
    summary["job_wall_sec"] = round(time.time() - t_start, 3)
    print(json.dumps(summary), flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
