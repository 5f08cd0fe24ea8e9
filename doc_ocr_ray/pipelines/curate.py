"""End-to-end corpus curation: the composed training-data pipeline.

interleaved documents
  -> extraction (split/merge -> question groups)
  -> keep question rows with usable text
  -> quality scoring (length/punct ratios)
  -> quality filter
  -> exact dedup on normalized question text (hash-partitioned)
  -> curated question corpus

Everything streams: two map_batches stages, one coarse-key groupby for
the dedup — no full materialization anywhere.  This is the pipeline a
user runs to turn raw page corpora into training text.
"""
from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa

from doc_ocr_ray.config import PipelineConfig, DEFAULT_CONFIG
from doc_ocr_ray.pipelines.extract import extract_questions
from doc_ocr_ray.stages.dedup import exact_dedup
from doc_ocr_ray.stages.text_analysis import quality_score_batch


def curate_corpus(docs_ds, config: Optional[PipelineConfig] = None,
                  min_tokens: int = 2, min_chars: int = 8,
                  max_punct_ratio: float = 0.5):
    """documents Dataset -> curated (doc_id, question_number, text,
    n_tokens) rows, deduplicated on normalized text."""
    config = config or DEFAULT_CONFIG
    questions = extract_questions(docs_ds, config=config)

    def to_text_rows(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["doc_id", "question_id", "question_number",
                           "group_type", "merged_text"]).to_pandas()
        q = df[(df["group_type"] == "question")
               & (df["merged_text"].str.len() > 0)].copy()
        # unique id per question row: question_id is the stable per-doc
        # ordinal (a per-batch cumcount would collide when one doc's
        # rows straddle a batch boundary)
        q["doc_id"] = q["doc_id"] + "#q" + q["question_id"].astype(str)
        return q.rename(columns={"merged_text": "text"})[
            ["doc_id", "question_number", "text"]]

    texts = questions.map_batches(to_text_rows, batch_format="pyarrow")

    def score_filter(batch: pd.DataFrame) -> pd.DataFrame:
        scores = quality_score_batch(batch)
        # script-neutral punctuation ratio: count only ASCII punctuation
        # marks — quality_score_batch's punct_ratio treats every
        # non-Latin letter as punctuation (Latin-script heuristic) and
        # would discard all CJK questions
        text = batch["text"].fillna("")
        ascii_punct = (text.str.count(r"[!-/:-@\[-`{-~]")
                       / text.str.len().clip(lower=1))
        # length floor: whitespace tokens OR raw chars — a spaceless
        # CJK question is one "token" but plenty of content
        long_enough = ((scores["n_tokens"] >= min_tokens)
                       | (text.str.len() >= min_chars))
        keep = long_enough & (ascii_punct <= max_punct_ratio)
        out = batch[keep.to_numpy()].copy()
        out["n_tokens"] = scores.loc[keep, "n_tokens"].to_numpy()
        return out

    filtered = texts.map_batches(score_filter, batch_format="pandas")
    return exact_dedup(filtered, text_col="text")
