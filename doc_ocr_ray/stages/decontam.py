"""Benchmark decontamination: flag/drop training documents that
contain evaluation-set n-grams.

The standard guard (GPT-3 appendix C; Brown et al. 2020) before
training-corpus release: any document sharing a long-enough word
n-gram with a held-out benchmark is contaminated and must be removed
from the training split.

Shape at scale: the benchmark side is SMALL by definition (an eval
set, thousands of documents), so its n-gram set is built once and
broadcast (``ray.put``) — the corpus side streams through one
vectorized ``map_batches`` doing hash-set membership per doc n-gram.
No shuffle, no join: contamination checking is embarrassingly
parallel once the benchmark fits in every worker's memory (a 100k-row
benchmark at 8-gram granularity is tens of MB).

Normalization is the engine-wide SQL-parity contract: lowercase,
edge-strip and collapse on the EXPLICIT whitespace class
``[\\t\\n\\f\\r ]`` (== RE2 ``\\s``), so the DuckDB oracle reproduces
membership bit for bit.
"""
from __future__ import annotations

import re
from typing import Iterable, List, Set

import numpy as np
import pandas as pd

from doc_ocr_ray.util import typed_if_empty

_WS = re.compile(r"[\t\n\f\r ]+")
_EDGE_WS = re.compile(r"^[\t\n\f\r ]+|[\t\n\f\r ]+$")


def _norm_tokens(text: str) -> List[str]:
    t = _EDGE_WS.sub("", (text or "").lower())
    return _WS.split(t) if t else []


def text_ngrams(text: str, n: int) -> Set[str]:
    """Distinct normalized word n-grams of one text."""
    toks = _norm_tokens(text)
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def build_benchmark_ngrams(texts: Iterable[str], n: int = 8) -> Set[str]:
    """Union of the benchmark documents' n-gram sets.  Driver-side on
    purpose: benchmarks are small; the result is broadcast once."""
    out: Set[str] = set()
    for t in texts:
        out |= text_ngrams(t, n)
    return out


# per-worker memo so repeated batches don't re-deserialize the
# broadcast set from the object store on every call
_BENCH_CACHE: dict = {}


def decontaminate(ds, bench_ngrams: Set[str], n: int = 8,
                  text_col: str = "text", drop: bool = False):
    """Flag (default) or drop corpus documents sharing any word
    ``n``-gram with the benchmark set.

    ``drop=False`` returns one row per input doc with ``n_hits`` (how
    many distinct doc n-grams appear in the benchmark) and
    ``contaminated``; ``drop=True`` keeps only clean docs (the
    training-side filter).  The benchmark set rides the object store
    (``ray.put`` once, read per worker), never per-batch pickling."""
    import ray
    ref = ray.put(frozenset(bench_ngrams))

    def fn(batch: pd.DataFrame):
        key = ref.hex()
        bench = _BENCH_CACHE.get(key)
        if bench is None:
            _BENCH_CACHE.clear()        # one live benchmark per worker
            bench = _BENCH_CACHE[key] = ray.get(ref)
        hits = np.fromiter(
            (len(text_ngrams(t, n) & bench)
             for t in batch[text_col].fillna("")),
            dtype="int64", count=len(batch))
        if drop:
            return typed_if_empty(batch[hits == 0].copy())
        out = batch[[c for c in batch.columns if c != text_col]].copy()
        out["n_hits"] = hits
        out["contaminated"] = hits > 0
        return out

    return ds.map_batches(fn, batch_format="pandas")
