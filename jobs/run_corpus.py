"""Composed end-to-end corpus job: extract -> global near-dedup
(-> apply) -> quality curation, as ONE resumable driver with
cross-phase manifest lineage.

    python jobs/run_corpus.py --input synth:1000000 \
        --output /tmp/out/corpus --shards 32

The three heavy phases are the existing resumable drivers invoked as
sequential subprocesses (each owns its own Ray session and per-shard
checkpoint manifest, so a kill mid-phase resumes at the open shard of
the open phase — the composer never re-runs committed work):

- **extract**   jobs/run_extract.py  -> ``<out>/extract/part-*``
  (question rows: the span pipeline over the raw corpus)
- **adapt**     in-process, Ray-free pyarrow streaming (this file):
  question rows -> a (doc_id, text) documents table, one FILE per
  extract shard (``<out>/docs/docs-SSSSS.parquet``, atomic tmp +
  rename, resumable per shard).  doc_id = ``shard << 40 | row_index``
  over the COMMITTED extract partition — deterministic and unique by
  construction (no hash-collision envelope), stable across reruns
  because committed partitions never change.
- **neardup**   jobs/run_neardup.py --apply -> drop table + the
  deduplicated ``<out>/neardup/corpus``
- **trainset**  in-process ``curate_training_set`` over the
  deduplicated corpus -> ``<out>/trainset/part-00000``: PII redaction
  -> token floor -> exact + near dedup -> keep-best -> deterministic
  train/val/test assignment.  One committed step (its dedup/CC stages
  are global by nature, like neardup phase 3); the composer opens its
  own Ray session just for this phase.  ``--min-tokens`` defaults to
  1 because tokens are whitespace-split and the flagship span corpus
  is CJK (one whitespace token per doc is normal); raise it for
  space-delimited corpora.

Cross-phase lineage comes from the CHILD manifests (committed
per-shard counters, batching-independent by each child's own
contract), composed into ``<out>/lineage.json``:
docs in/out per phase plus the end-to-end retention ratio.

Top-level manifest ids: 0-2 mark child phases fully complete (skips
even the subprocess spawn on rerun); 1000+shard mark adapter shards.
``--fresh`` wipes everything (delegated to each child's --fresh plus
the composer's own dirs).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs._driver import init_session, prepare_manifest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXTRACT_DONE = 0
NEARDUP_DONE = 1
TRAINSET_DONE = 2
ADAPT_BASE = 1000


def _run_child(script: str, child_args: list, fresh: bool) -> None:
    cmd = [sys.executable, os.path.join(REPO, "jobs", script)]
    cmd += child_args + (["--fresh"] if fresh else [])
    print(f"[corpus] -> {script} {' '.join(child_args)}", flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        raise SystemExit(
            f"child {script} failed with exit code {r.returncode}")


def _adapt_shard(extract_dir: str, docs_dir: str, shard: int) -> tuple:
    """One extract partition -> one (doc_id, text) parquet FILE.
    Ray-free: a pyarrow streaming scan (bounded memory), atomic tmp +
    os.replace commit.  Returns (rows_in, rows_out, out_path)."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    import numpy as np

    part = os.path.join(extract_dir, f"part-{shard:05d}")
    out_name = f"docs-{shard:05d}.parquet"
    final = os.path.join(docs_dir, out_name)
    tmp = os.path.join(docs_dir, f".tmp-{out_name}")
    os.makedirs(docs_dir, exist_ok=True)
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    if not os.path.isdir(part):        # empty extract shard (output="")
        pq.write_table(schema.empty_table(), tmp)
        os.replace(tmp, final)
        return 0, 0, final
    dset = pads.dataset(part)
    if "merged_text" not in dset.schema.names:   # all-empty marker part
        pq.write_table(schema.empty_table(), tmp)
        os.replace(tmp, final)
        return 0, 0, final
    rows_in = rows_out = 0
    writer = pq.ParquetWriter(tmp, schema)
    try:
        # single-threaded scan: row order must be IDENTICAL across
        # reruns (doc_id = shard<<40 | row_index), and a threaded
        # scanner may interleave fragments nondeterministically
        for batch in dset.scanner(columns=["merged_text"],
                                  batch_size=16384,
                                  use_threads=False).to_batches():
            n = batch.num_rows
            if not n:
                continue
            text = batch.column(0).cast(pa.string()).fill_null("")
            ids = pa.array((shard << 40) + rows_in
                           + np.arange(n, dtype=np.int64), pa.int64())
            writer.write_table(pa.table({"doc_id": ids, "text": text}))
            rows_in += n
            rows_out += n
    finally:
        writer.close()
    os.replace(tmp, final)
    return rows_in, rows_out, final


def _child_manifest(path: str) -> dict:
    mf = os.path.join(path, "manifest.json")
    if not os.path.exists(mf):
        return {}
    with open(mf) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="synth:N or a documents path (run_extract forms)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--num-perm", type=int, default=64)
    ap.add_argument("--num-bands", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--min-tokens", type=int, default=1)
    ap.add_argument("--jaccard", type=float, default=0.6)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()

    extract_dir = os.path.join(args.output, "extract")
    docs_dir = os.path.join(args.output, "docs")
    neardup_dir = os.path.join(args.output, "neardup")
    trainset_dir = os.path.join(args.output, "trainset")

    job_params = {"input": args.input, "shards": args.shards,
                  "seed": args.seed, "buckets": args.buckets,
                  "num_perm": args.num_perm,
                  "num_bands": args.num_bands,
                  "threshold": args.threshold,
                  "min_tokens": args.min_tokens,
                  "jaccard": args.jaccard}
    if args.fresh:
        import shutil
        for d in (docs_dir, trainset_dir):
            if os.path.isdir(d):
                shutil.rmtree(d)
    manifest, err = prepare_manifest(args.output, job_params, args.fresh)
    if manifest is None:
        return err
    t_start = time.time()
    ncpu = ["--num-cpus", str(args.num_cpus)]

    # ---- phase 1: extract (child resumable per shard)
    if manifest.is_done(EXTRACT_DONE):
        print("[corpus] extract already complete, skipping", flush=True)
    else:
        _run_child("run_extract.py",
                   ["--input", args.input, "--output", extract_dir,
                    "--shards", str(args.shards),
                    "--seed", str(args.seed)] + ncpu, args.fresh)
        manifest.mark_done(EXTRACT_DONE, rows_in=-1, rows_out=-1,
                           output=extract_dir, wall_sec=0.0)

    # ---- phase 2: adapt question rows -> documents table (per shard)
    for shard in range(args.shards):
        mid = ADAPT_BASE + shard
        if manifest.is_done(mid):
            print(f"[adapt shard {shard}] already committed, skipping",
                  flush=True)
            continue
        t0 = time.time()
        rows_in, rows_out, final = _adapt_shard(extract_dir, docs_dir,
                                                shard)
        manifest.mark_done(mid, rows_in=rows_in, rows_out=rows_out,
                           output=final, wall_sec=time.time() - t0)
        print(f"[adapt shard {shard}] rows={rows_out} "
              f"wall={time.time() - t0:.1f}s", flush=True)

    # ---- phase 3: global near-dedup + apply (child resumable)
    if manifest.is_done(NEARDUP_DONE):
        print("[corpus] neardup already complete, skipping", flush=True)
    else:
        _run_child("run_neardup.py",
                   ["--input", docs_dir, "--output", neardup_dir,
                    "--shards", str(args.shards),
                    "--buckets", str(args.buckets),
                    "--num-perm", str(args.num_perm),
                    "--num-bands", str(args.num_bands),
                    "--threshold", str(args.threshold),
                    "--apply"] + ncpu, args.fresh)
        manifest.mark_done(NEARDUP_DONE, rows_in=-1, rows_out=-1,
                           output=neardup_dir, wall_sec=0.0)

    # ---- phase 4: training-set curation over the deduplicated corpus
    # (one committed step — dedup/CC inside are global by nature)
    if manifest.is_done(TRAINSET_DONE):
        print("[corpus] trainset already complete, skipping", flush=True)
    else:
        t0 = time.time()
        import ray
        init_session(args.num_cpus)
        from doc_ocr_ray.pipelines.curate import curate_training_set
        from doc_ocr_ray.sources.io import read_documents, write_table
        corpus = read_documents(os.path.join(neardup_dir, "corpus"),
                                columns=["doc_id", "text"])
        out = curate_training_set(corpus, min_tokens=args.min_tokens,
                                  jaccard=args.jaccard, seed=args.seed)
        final = write_table(out, trainset_dir, partition_id=0,
                            parquet_only=True)
        import pyarrow.dataset as pads
        n_out = pads.dataset(final).count_rows()
        ray.shutdown()
        manifest.mark_done(TRAINSET_DONE, rows_in=-1, rows_out=n_out,
                           output=final, wall_sec=time.time() - t0)
        print(f"[corpus] trainset kept={n_out} "
              f"wall={time.time() - t0:.1f}s", flush=True)

    # ---- composed lineage from the committed child manifests (all
    # counters are per-shard committed totals — batching-independent
    # by each child's own lineage contract)
    ex = _child_manifest(extract_dir)
    nd = _child_manifest(neardup_dir)
    ad = {k: r for k, r in manifest.records.items()
          if k.isdigit() and ADAPT_BASE <= int(k) < ADAPT_BASE + 10000
          and r.get("state") == "done"}
    p1 = {k: r for k, r in ex.items()
          if k.isdigit() and r.get("state") == "done"}
    nd1 = {k: r for k, r in nd.items()
           if k.isdigit() and int(k) < 100000
           and r.get("state") == "done"}
    nd3 = nd.get("200000", {})
    nd4 = {k: r for k, r in nd.items()
           if k.isdigit() and int(k) >= 300000
           and r.get("state") == "done"}
    ts = manifest.records.get(str(TRAINSET_DONE), {})
    splits = {}
    ts_out = ts.get("output")
    if ts_out and os.path.isdir(ts_out):
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        st = pads.dataset(ts_out).to_table(columns=["split"])
        if st.num_rows:
            vc = pc.value_counts(st["split"])
            splits = {str(r["values"]): int(r["counts"])
                      for r in vc.to_pylist()}
    lineage = {
        "extract": {
            "docs_in": sum(r.get("rows_in", 0) for r in p1.values()),
            "question_rows_out": sum(r.get("rows_out", 0)
                                     for r in p1.values())},
        "adapt": {
            "rows_in": sum(r.get("rows_in", 0) for r in ad.values()),
            "docs_out": sum(r.get("rows_out", 0) for r in ad.values())},
        "neardup": {
            "docs_in": sum(r.get("rows_in", 0) for r in nd1.values()),
            "dup_docs_dropped": nd3.get("n_dup_docs",
                                        nd3.get("rows_out", 0)),
            "docs_kept": sum(r.get("rows_out", 0) for r in nd4.values())},
        "trainset": {"docs_kept": ts.get("rows_out", 0),
                     "splits": splits},
    }
    lineage["retention_pct"] = round(
        100.0 * lineage["trainset"]["docs_kept"]
        / max(1, lineage["adapt"]["docs_out"]), 2)
    lineage["job_wall_sec"] = round(time.time() - t_start, 3)
    with open(os.path.join(args.output, "lineage.json"), "w") as f:
        json.dump(lineage, f, indent=1)
    print(json.dumps(lineage), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
