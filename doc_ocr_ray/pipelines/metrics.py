"""Corpus aggregates & evaluation metrics (A3-A5 of SURVEY.md 2.5).

- ``corpus_metadata``: the reference's run summary counters
  (extractor.py:116-125) as a distributed partial+final aggregate.
- ``qtype_histogram``: question-type distribution
  (main_extraction.py:197-204).
- ``evaluate``: the evaluator port (evaluator.py:15-133) — detection
  precision/recall/F1 by question-number sets and image-association
  set-equality accuracy, distributed via a tagged union + per-doc
  map_groups (no driver-side loops).
"""
from __future__ import annotations

from typing import Dict

import pandas as pd
import pyarrow as pa


def corpus_metadata(questions_ds) -> Dict[str, int]:
    """total_questions / with_images / total_images / split_count."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["group_type", "n_images", "split_from_merged"]).to_pandas()
        q = df[df["group_type"] == "question"]
        return pa.table({
            "total_questions": pa.array([len(q)], pa.int64()),
            "with_images": pa.array([int((q["n_images"] > 0).sum())], pa.int64()),
            "total_images": pa.array([int(q["n_images"].sum())], pa.int64()),
            "split_count": pa.array([int(q["split_from_merged"].sum())], pa.int64()),
        })
    parts = questions_ds.map_batches(partial, batch_format="pyarrow").take_all()
    out = {"total_questions": 0, "with_images": 0, "total_images": 0, "split_count": 0}
    for p in parts:
        for k in out:
            out[k] += p[k]
    return out


def qtype_histogram(questions_ds):
    """(qtype, n) for question groups."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = batch[batch["group_type"] == "question"]
        return (q.groupby("qtype", sort=False).size()
                 .reset_index(name="n"))
    partials = questions_ds.map_batches(partial, batch_format="pandas")

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"qtype": [group["qtype"].iloc[0]],
                             "n": [int(group["n"].sum())]})
    return partials.groupby("qtype").map_groups(final, batch_format="pandas")


def evaluate(extracted_ds, truth_ds) -> Dict[str, float]:
    """Detection P/R/F1 on per-doc question-number sets + image-set
    equality accuracy (evaluator.py:46-133, re-keyed from bbox IoU to
    the span domain: a question matches by (doc_id, question_number)).
    """
    def project(tag):
        def fn(batch: pa.Table) -> pa.Table:
            df = batch.select(["doc_id", "group_type", "question_number",
                               "spans"]).to_pandas()
            q = df[(df["group_type"] == "question")
                   & (df["question_number"] >= 0)].copy()
            q["images"] = q["spans"].map(
                lambda ss: ",".join(sorted(s["media_ref"] for s in ss
                                           if s["kind"] == "image")))
            q["tag"] = tag
            return pa.Table.from_pandas(
                q[["doc_id", "question_number", "images", "tag"]],
                preserve_index=False)
        return fn

    tagged = (extracted_ds.map_batches(project("got"), batch_format="pyarrow")
              .union(truth_ds.map_batches(project("truth"), batch_format="pyarrow")))

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized SipHash instead of per-row md5 (see restitch)
        from doc_ocr_ray.util import coarse_part
        batch["part"] = coarse_part(batch["doc_id"], 128)
        return batch

    def per_part(group: pd.DataFrame) -> pd.DataFrame:
        # coarse shuffle key: many docs per Ray-level group, per-doc
        # comparison vectorized inside
        out = []
        for _, g in group.groupby("doc_id", sort=False):
            got = g[g["tag"] == "got"]
            truth = g[g["tag"] == "truth"]
            got_n = set(got["question_number"])
            truth_n = set(truth["question_number"])
            tp = len(got_n & truth_n)
            # duplicate question numbers (sections restart numbering):
            # compare the SORTED MULTISET of image-sets per number, so
            # the result is independent of row arrival order
            def img_map(df):
                return {n: tuple(sorted(s))
                        for n, s in df.groupby("question_number")["images"]}
            img_got, img_truth = img_map(got), img_map(truth)
            img_ok = sum(1 for n in (got_n & truth_n)
                         if img_got.get(n) == img_truth.get(n))
            out.append((tp, len(got_n), len(truth_n), img_ok))
        return pd.DataFrame(out, columns=["tp", "n_got", "n_truth", "img_ok"])

    parts = (tagged.map_batches(add_part, batch_format="pandas")
             .groupby("part").map_groups(per_part,
                                         batch_format="pandas").take_all())
    tp = sum(p["tp"] for p in parts)
    n_got = sum(p["n_got"] for p in parts)
    n_truth = sum(p["n_truth"] for p in parts)
    img_ok = sum(p["img_ok"] for p in parts)
    precision = tp / n_got if n_got else 0.0
    recall = tp / n_truth if n_truth else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {
        "precision": round(precision, 4), "recall": round(recall, 4),
        "f1": round(f1, 4),
        "image_assoc_accuracy": round(img_ok / tp, 4) if tp else 0.0,
    }
