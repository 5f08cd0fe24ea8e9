"""Job driver: sharded, resumable corpus curation — `ray job submit`
entrypoint for the quality funnel.

    ray job submit -- python jobs/run_curate.py \
        --input /data/documents --output /tmp/out/curated --shards 16

Each shard reads its slice of a documents table (doc_id, text[,
source]), runs the composed quality funnel (Gopher rules -> C4 line
cleaning -> phrase blocklist -> entropy floor), writes its survivors
as one atomic partition and commits the manifest with per-shard
lineage metrics (docs kept, clean chars, entropy extrema).  The
funnel is a pure per-document filter chain, so shards are exactly
independent — reruns skip committed shards (checkpoint resume), and
cross-shard stages (global dedup) belong in a follow-up job over the
curated output.  ``--fresh`` wipes manifest AND partitions; resuming
with different parameters is refused (shard slices would shift).

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
                          prepare_manifest, shard_slice)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet/lance path (doc_id, text)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--min-words", type=int, default=50)
    ap.add_argument("--min-sentences", type=int, default=3)
    ap.add_argument("--min-ent-micro", type=int, default=1_000_000)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()

    import ray
    init_session(args.num_cpus)

    from doc_ocr_ray.pipelines.curate import curate_quality_funnel
    from doc_ocr_ray.sources.io import write_table

    job_params = {"input": args.input, "shards": args.shards,
                  "min_words": args.min_words,
                  "min_sentences": args.min_sentences,
                  "min_ent_micro": args.min_ent_micro,
                  "input_files_md5": files_fingerprint(args.input)}
    manifest, err = prepare_manifest(args.output, job_params, args.fresh)
    if manifest is None:
        ray.shutdown()
        return err

    t_start = time.time()
    for shard in range(args.shards):
        if manifest.is_done(shard):
            print(f"[shard {shard}] already committed, skipping",
                  flush=True)
            continue
        t0 = time.time()
        ds = shard_slice(args.input, shard, args.shards)
        if ds is None:
            manifest.mark_done(shard, rows_in=0, rows_out=0,
                               output="", wall_sec=0.0)
            continue
        out = curate_quality_funnel(ds, min_words=args.min_words,
                                    min_sentences=args.min_sentences,
                                    min_ent_micro=args.min_ent_micro)
        final = write_table(out, args.output, partition_id=shard)
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        if os.listdir(final):
            cols = pads.dataset(final).to_table(
                columns=["doc_id", "clean_text", "ent_micro"])
        else:                       # every doc filtered: empty commit
            import pyarrow as pa
            cols = pa.table({"doc_id": pa.array([], pa.int64()),
                             "clean_text": pa.array([], pa.string()),
                             "ent_micro": pa.array([], pa.int64())})
        rows_out = cols.num_rows
        metrics = {
            "docs_kept": rows_out,
            "clean_chars": pc.sum(pc.utf8_length(
                cols["clean_text"])).as_py() or 0,
            "ent_min": pc.min(cols["ent_micro"]).as_py(),
            "ent_max": pc.max(cols["ent_micro"]).as_py(),
        }
        wall = time.time() - t0
        manifest.mark_done(shard, rows_in=-1, rows_out=rows_out,
                           output=final, wall_sec=wall, extra=metrics)
        print(f"[shard {shard}] kept={rows_out} wall={wall:.1f}s",
              flush=True)

    summary = manifest.summary()
    summary["job_wall_sec"] = round(time.time() - t_start, 3)
    print(json.dumps(summary), flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
