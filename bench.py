"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Plain mode prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., "num_cpus": N,
   "docs": N, "docs_per_sec": ...}

--scaling runs the headline extraction twice in fresh processes
(num_cpus=8 then 32) on the same input and reports both throughputs
plus scaling efficiency (the sandbox stand-in for the N-vs-4N-node
cluster criterion; see BASELINE.md).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _bench_docs() -> int:
    """Synthetic corpus size scaled to the sf dir (~20k docs at sf0.1)."""
    if os.environ.get("GRAFT_BENCH_DOCS"):
        return int(os.environ["GRAFT_BENCH_DOCS"])
    import pyarrow.parquet as pq
    lineitem_rows = pq.ParquetFile(f"{SF_DIR}/lineitem.parquet").metadata.num_rows
    return max(2000, lineitem_rows // 30)


def run_benchmarks() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from doc_ocr_ray.runtime import configure_data_context
    configure_data_context(NUM_CPUS)

    from doc_ocr_ray import synth
    from doc_ocr_ray.pipelines import relational
    from doc_ocr_ray.pipelines.extract import extract_questions
    from doc_ocr_ray.stages import dedup, similarity, text_analysis
    import ray.data

    n_docs = _bench_docs()
    timings: dict = {}

    def nrows(x):
        # consume any query result shape: Dataset, Arrow Table, frame
        import pyarrow as _pa

        import ray.data as _rd
        if isinstance(x, _rd.Dataset):
            return x.count()
        if isinstance(x, _pa.Table):
            return x.num_rows
        return len(x)

    # min-of-2 for any op slower than this floor (round-3 verdict item
    # 3: a host load burst once doubled large_volume_orders between
    # sessions with the code unchanged; with min+worst recorded per
    # slow op, such bursts are attributable on sight)
    rerun_floor = float(os.environ.get("GRAFT_BENCH_RERUN_FLOOR", "5.0"))

    def timed(name, fn, force_rerun=False):
        t0 = time.time()
        result = fn()
        elapsed = time.time() - t0
        if force_rerun or elapsed > rerun_floor:
            t1 = time.time()
            fn()
            second = time.time() - t1
            timings[name + "_worst"] = round(max(elapsed, second), 3)
            elapsed = min(elapsed, second)
        timings[name] = round(elapsed, 3)
        return result

    # warm the page cache (untimed) so reads measure compute, not cold disk
    ray.data.read_parquet(f"{SF_DIR}/documents.parquet").count()
    ray.data.read_parquet(f"{SF_DIR}/lineitem.parquet").count()

    # corpus materialized to parquet ONCE (untimed, reused across runs):
    # the timed pipeline is read_parquet -> extract -> count, which is
    # what the production job does — not corpus synthesis
    # FIXED 128-way layout: the writer session's CPU count must not
    # leak into the file count (a corpus first materialized by an
    # 8-CPU scaling subprocess came out as 16 single-row-group files,
    # capping read parallelism at 16 blocks and silently halving every
    # later 32-CPU measurement).  The _p128 suffix retires such
    # corpora.
    corpus = f"/tmp/bench_corpus_v{synth.SYNTH_VERSION}_{n_docs}_p128"
    if not os.path.isdir(corpus) or not os.listdir(corpus):
        # atomic: an interrupted write must not leave a half corpus
        # that later runs silently benchmark against
        tmp = corpus + ".tmp"
        if os.path.isdir(tmp):
            import shutil
            shutil.rmtree(tmp)
        synth.generate_dataset(n_docs, seed=42,
                               mega_doc_every=997).repartition(
                                   128).write_parquet(tmp)
        os.replace(tmp, corpus)

    # warm the worker pool (untimed): touches every worker process so
    # imports/pattern-compilation amortize, as they do over a long job
    extract_questions(ray.data.read_parquet(corpus).limit(2000)).count()

    # --- headline: extraction docs/sec on the interleaved corpus.
    # min-of-2 within one session: the sandbox host takes external
    # load bursts that can double a single run's wall mid-measurement;
    # the min measures the pipeline, the spread is host noise (the
    # capacity probe runs adjacent to, not during, the timed window,
    # so it can miss a burst)
    # min-of-2 + worst come from timed()'s rerun path, FORCED for the
    # headline (it sits under the 5 s floor at bench scale; the old
    # explicit second run stacked on the auto-rerun, running the
    # headline 4x and overwriting the true worst — round-4 review)
    def bench_extract():
        return extract_questions(ray.data.read_parquet(corpus)).count()
    n_questions = timed("extract", bench_extract, force_rerun=True)

    if os.environ.get("GRAFT_BENCH_ONLY") == "extract":
        # scaling subprocesses only consume the headline timing —
        # skip the per-operator suite
        out = {
            "metric": "extraction seconds on deterministic interleaved corpus",
            "value": timings["extract"], "unit": "sec", "queries": timings,
            "sf": SF_DIR, "num_cpus": NUM_CPUS, "docs": n_docs,
            "questions": n_questions,
            "docs_per_sec": round(n_docs / timings["extract"], 1),
        }
        ray.shutdown()
        return out

    # --- corpus curation over the documents table
    docs = lambda cols: ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=cols)
    timed("token_count", lambda: docs(["doc_id", "text"]).map_batches(
        text_analysis.token_count_batch, batch_format="pandas").count())
    timed("quality_score", lambda: docs(["doc_id", "text"]).map_batches(
        text_analysis.quality_score_batch, batch_format="pandas").count())
    timed("dedup_exact", lambda: dedup.exact_dedup(
        docs(["doc_id", "text"])).count())
    timed("dedup_minhash", lambda: dedup.minhash_dedup_pairs(
        docs(["doc_id", "text"]), threshold=0.8).count())

    emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    timed("similarity_topk", lambda: similarity.knn_brute(
        emb, query_ids=list(range(20)), k=5).num_rows)
    timed("similarity_ivf", lambda: similarity.knn_ivf(
        emb, query_ids=list(range(20)), k=5, n_centroids=16,
        nprobe=4).num_rows)
    timed("similarity_pq", lambda: similarity.pq_search(
        emb, query_ids=list(range(20)), k=5, m=4,
        n_codes=8).num_rows)

    # new-in-round-2 operators, timed on their driver-query testbeds
    # (fixed injected-candidate scale) for round-over-round tracking
    import __ray_entry__ as entry
    qs = entry.queries()
    timed("dedup_ngram_verify",
          lambda: qs["dedup_ngram_verify"](SF_DIR).count())
    timed("dedup_clusters", lambda: qs["dedup_clusters"](SF_DIR).count())
    timed("embedding_neardup",
          lambda: qs["embedding_neardup"](SF_DIR).count())
    timed("dedup_keep_best", lambda: qs["dedup_keep_best"](SF_DIR).count())
    timed("asof_clicks_views",
          lambda: qs["asof_clicks_views"](SF_DIR).count())
    timed("tfidf_top_terms", lambda: qs["tfidf_top_terms"](SF_DIR).count())
    timed("pii_redact", lambda: qs["pii_redact"](SF_DIR).count())
    timed("repetition_signals",
          lambda: qs["repetition_signals"](SF_DIR).count())
    timed("dup_ngram_frac", lambda: qs["dup_ngram_frac"](SF_DIR).count())
    timed("decontaminate", lambda: qs["decontaminate"](SF_DIR).count())
    timed("quality_classifier",
          lambda: qs["quality_classifier"](SF_DIR).count())
    timed("pack_sequences", lambda: qs["pack_sequences"](SF_DIR).count())
    timed("per_source_cap", lambda: qs["per_source_cap"](SF_DIR).count())
    timed("kmeans_fit", lambda: qs["kmeans_fit"](SF_DIR).num_rows)
    timed("semdedup", lambda: qs["semdedup"](SF_DIR).count())
    timed("select_top_quality",
          lambda: qs["select_top_quality"](SF_DIR).count())
    timed("quantiles_by_source",
          lambda: qs["quantiles_by_source"](SF_DIR).count())
    timed("curate_semantic", lambda: qs["curate_semantic"](SF_DIR).count())
    timed("mix_plan", lambda: qs["mix_plan"](SF_DIR).count())
    timed("export_shards", lambda: qs["export_shards"](SF_DIR).count())
    timed("curate_training_set",
          lambda: qs["curate_training_set"](SF_DIR).count())
    timed("dedup_lines", lambda: qs["dedup_lines"](SF_DIR).count())
    timed("lm_score", lambda: qs["lm_score"](SF_DIR).count())
    timed("dsir_weights", lambda: qs["dsir_weights"](SF_DIR).count())
    timed("heavy_hitters", lambda: len(qs["heavy_hitters"](SF_DIR)))
    timed("inverted_index", lambda: qs["inverted_index"](SF_DIR).count())
    timed("bm25_search", lambda: len(qs["bm25_search"](SF_DIR)))
    timed("chunk_documents",
          lambda: qs["chunk_documents"](SF_DIR).count())
    timed("dup_substr", lambda: qs["dup_substr"](SF_DIR).count())
    timed("dedup_substr_remove",
          lambda: qs["dedup_substr_remove"](SF_DIR).count())
    timed("cross_source_overlap",
          lambda: qs["cross_source_overlap"](SF_DIR).count())
    timed("media_dedup", lambda: qs["media_dedup"](SF_DIR).count())
    timed("media_neardup_phash",
          lambda: qs["media_neardup_phash"](SF_DIR).count())
    timed("watermark_late", lambda: qs["watermark_late"](SF_DIR).count())
    timed("audio_neardup_fp",
          lambda: qs["audio_neardup_fp"](SF_DIR).count())
    timed("media_dedup_incremental",
          lambda: qs["media_dedup_incremental"](SF_DIR).count())
    timed("crawl_frontier",
          lambda: qs["crawl_frontier"](SF_DIR).count())
    timed("cdc_apply", lambda: qs["cdc_apply"](SF_DIR).count())
    # round 5 repointed the canonical name at its recall gate; the
    # *_approx query is the raw computation earlier rounds timed here
    timed("similarity_ivfpq",
          lambda: nrows(qs["similarity_ivfpq_approx"](SF_DIR)))
    timed("hll_users_by_type",
          lambda: qs["hll_users_by_type"](SF_DIR).count())
    timed("pdf_extract", lambda: qs["pdf_extract"](SF_DIR).count())
    timed("html_tables", lambda: qs["html_tables"](SF_DIR).count())
    timed("warc_html_spans",
          lambda: qs["warc_html_spans"](SF_DIR).count())
    timed("sample_exact_n",
          lambda: qs["sample_exact_n"](SF_DIR).count())
    timed("multimodal_png",
          lambda: qs["multimodal_png"](SF_DIR).count())
    timed("multimodal_jpeg",
          lambda: nrows(qs["multimodal_jpeg"](SF_DIR)))
    timed("media_video_fp",
          lambda: nrows(qs["media_video_fp"](SF_DIR)))
    timed("funnel_counts",
          lambda: qs["funnel_counts"](SF_DIR).count())
    timed("token_budget_select",
          lambda: qs["token_budget_select"](SF_DIR).count())
    timed("boilerplate_prefixes",
          lambda: qs["boilerplate_prefixes"](SF_DIR).count())
    timed("source_salient_terms",
          lambda: qs["source_salient_terms"](SF_DIR).count())
    timed("curate_web_corpus",
          lambda: qs["curate_web_corpus"](SF_DIR).count())
    timed("url_dedup", lambda: qs["url_dedup"](SF_DIR).count())
    timed("domain_filter", lambda: qs["domain_filter"](SF_DIR).count())
    timed("dedup_incremental",
          lambda: qs["dedup_incremental"](SF_DIR).count())
    timed("pack_interleaved",
          lambda: qs["pack_interleaved"](SF_DIR).count())
    timed("events_hopping",
          lambda: qs["events_hopping"](SF_DIR).count())
    timed("pagerank", lambda: qs["pagerank"](SF_DIR).count())
    timed("hits_scores", lambda: nrows(qs["hits_scores"](SF_DIR)))
    timed("zscore_by_source",
          lambda: qs["zscore_by_source"](SF_DIR).count())
    timed("bpe_train", lambda: qs["bpe_train"](SF_DIR).num_rows)
    timed("html_main_content",
          lambda: qs["html_main_content"](SF_DIR).count())
    timed("gopher_filter", lambda: qs["gopher_filter"](SF_DIR).count())
    timed("c4_filter", lambda: qs["c4_filter"](SF_DIR).count())
    timed("ccnet_buckets", lambda: qs["ccnet_buckets"](SF_DIR).count())
    timed("dedup_minhash_incremental",
          lambda: qs["dedup_minhash_incremental"](SF_DIR).count())
    timed("phrase_blocklist",
          lambda: qs["phrase_blocklist"](SF_DIR).count())
    timed("char_entropy", lambda: qs["char_entropy"](SF_DIR).count())
    timed("script_profile",
          lambda: qs["script_profile"](SF_DIR).count())
    timed("media_context", lambda: qs["media_context"](SF_DIR).count())
    timed("revenue_by_nation",
          lambda: qs["revenue_by_nation"](SF_DIR).count())
    timed("events_rollup", lambda: qs["events_rollup"](SF_DIR).num_rows)
    timed("retention_cohorts",
          lambda: qs["retention_cohorts"](SF_DIR).count())
    timed("distinct_users_by_type",
          lambda: qs["distinct_users_by_type"](SF_DIR).count())
    timed("realize_mix", lambda: qs["realize_mix"](SF_DIR).count())
    timed("dup_line_signals",
          lambda: qs["dup_line_signals"](SF_DIR).count())
    timed("anti_join_native",
          lambda: qs["customers_without_events_native"](SF_DIR).count())
    timed("embedding_clusters",
          lambda: qs["embedding_clusters"](SF_DIR).count())
    timed("bpe_apply", lambda: qs["bpe_apply"](SF_DIR).count())
    timed("dedup_edit_verify",
          lambda: qs["dedup_edit_verify"](SF_DIR).count())
    timed("corpus_report",
          lambda: qs["corpus_report"](SF_DIR).num_rows)
    timed("snapshot_diff",
          lambda: qs["snapshot_diff"](SF_DIR).count())
    timed("curate_quality_funnel",
          lambda: qs["curate_quality_funnel"](SF_DIR).count())
    timed("setsim_join", lambda: qs["setsim_join"](SF_DIR).count())
    timed("bloom_semi_orders",
          lambda: qs["bloom_semi_orders"](SF_DIR).count())
    timed("pack_tokens", lambda: qs["pack_tokens"](SF_DIR).count())
    timed("event_value_bands",
          lambda: qs["event_value_bands"](SF_DIR).count())
    timed("host_graph", lambda: qs["host_graph"](SF_DIR).count())
    timed("cms_counts", lambda: nrows(qs["cms_counts"](SF_DIR)))
    timed("resample_locf", lambda: qs["resample_locf"](SF_DIR).count())
    timed("index_delta", lambda: qs["index_delta"](SF_DIR).count())
    timed("validate_table", lambda: qs["validate_table"](SF_DIR).count())
    timed("search_rerank", lambda: nrows(qs["search_rerank"](SF_DIR)))
    timed("triangle_count", lambda: nrows(qs["triangle_count"](SF_DIR)))
    timed("pmi_pairs", lambda: nrows(qs["pmi_pairs"](SF_DIR)))
    timed("scd2_intervals",
          lambda: qs["scd2_intervals"](SF_DIR).count())
    timed("decayed_user_score",
          lambda: qs["decayed_user_score"](SF_DIR).count())
    timed("quantile_hist", lambda: qs["quantile_hist"](SF_DIR).count())
    timed("winsorize_tokens",
          lambda: qs["winsorize_tokens"](SF_DIR).count())
    timed("fuzzy_name_join",
          lambda: qs["fuzzy_name_join"](SF_DIR).count())
    timed("min_cost_supplier",
          lambda: qs["min_cost_supplier"](SF_DIR).count())
    timed("late_orders_by_priority",
          lambda: qs["late_orders_by_priority"](SF_DIR).count())
    timed("copurchase_pairs",
          lambda: qs["copurchase_pairs"](SF_DIR).num_rows)
    timed("week_over_week",
          lambda: qs["week_over_week"](SF_DIR).count())
    timed("ivm_refresh", lambda: qs["ivm_refresh"](SF_DIR).count())
    timed("supplier_variety",
          lambda: qs["supplier_variety"](SF_DIR).count())
    timed("sample_k_per_source",
          lambda: qs["sample_k_per_source"](SF_DIR).count())
    timed("gram_matrix", lambda: qs["gram_matrix"](SF_DIR).count())
    timed("hard_negatives",
          lambda: qs["hard_negatives"](SF_DIR).num_rows)
    timed("search_snippets",
          lambda: len(qs["search_snippets"](SF_DIR)))
    timed("unpivot_lineitem",
          lambda: qs["unpivot_lineitem"](SF_DIR).count())
    timed("count_anomalies",
          lambda: qs["count_anomalies"](SF_DIR).count())
    timed("extract_entities",
          lambda: qs["extract_entities"](SF_DIR).count())
    timed("csv_source", lambda: qs["csv_source"](SF_DIR).count())
    timed("pareto_parts", lambda: qs["pareto_parts"](SF_DIR).count())
    timed("rolling_dau", lambda: qs["rolling_dau"](SF_DIR).count())
    timed("type_share_by_day",
          lambda: qs["type_share_by_day"](SF_DIR).count())
    timed("followed_by", lambda: qs["followed_by"](SF_DIR).count())
    timed("session_stats",
          lambda: qs["session_stats"](SF_DIR).count())
    timed("invalid_transitions",
          lambda: qs["invalid_transitions"](SF_DIR).count())
    timed("rank_fusion", lambda: nrows(qs["rank_fusion"](SF_DIR)))
    timed("behavior_strings",
          lambda: qs["behavior_strings"](SF_DIR).count())
    timed("mad_outliers",
          lambda: qs["mad_outliers"](SF_DIR).count())
    timed("skipgram_pairs",
          lambda: nrows(qs["skipgram_pairs"](SF_DIR)))

    from doc_ocr_ray.pipelines.events import sessionize
    timed("sessionize", lambda: sessionize(
        ray.data.read_parquet(f"{SF_DIR}/events.parquet",
                              columns=["user_id", "event_id", "ts"])).count())

    timed("lineitem_pricing", lambda: relational.lineitem_pricing(
        ray.data.read_parquet(
            f"{SF_DIR}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount"])).count())
    timed("events_by_type", lambda: relational.events_by_type(
        ray.data.read_parquet(f"{SF_DIR}/events.parquet",
                              columns=["event_type", "value"])).count())
    timed("range_join_lookback",
          lambda: qs["range_join_lookback"](SF_DIR).count())
    timed("orders_per_cust_hist",
          lambda: qs["orders_per_cust_hist"](SF_DIR).count())
    timed("shipping_priority",
          lambda: qs["shipping_priority"](SF_DIR).count())
    timed("large_volume_orders",
          lambda: qs["large_volume_orders"](SF_DIR).count())

    # new-in-round-3 operators
    timed("anchor_corpus", lambda: qs["anchor_corpus"](SF_DIR).count())
    timed("bfs_hops", lambda: qs["bfs_hops"](SF_DIR).count())
    timed("kcore", lambda: nrows(qs["kcore"](SF_DIR)))
    timed("median_value_hist",
          lambda: nrows(qs["median_value_hist"](SF_DIR)))
    timed("knn_graph", lambda: qs["knn_graph"](SF_DIR).count())
    timed("important_parts",
          lambda: qs["important_parts"](SF_DIR).count())
    timed("dominant_suppliers",
          lambda: qs["dominant_suppliers"](SF_DIR).count())
    timed("split_leakage", lambda: qs["split_leakage"](SF_DIR).count())
    timed("sitemap_urls", lambda: qs["sitemap_urls"](SF_DIR).count())
    timed("robots_sitemaps",
          lambda: qs["robots_sitemaps"](SF_DIR).count())
    timed("embedding_drift",
          lambda: qs["embedding_drift"](SF_DIR).count())
    timed("random_walks", lambda: qs["random_walks"](SF_DIR).count())
    timed("temperature_mix",
          lambda: qs["temperature_mix"](SF_DIR).count())
    # round 5 repointed the canonical knn_graph_lsh name at its
    # recall GATE; the *_approx query is the same raw computation
    # earlier rounds timed under this label
    timed("knn_graph_lsh",
          lambda: qs["knn_graph_lsh_approx"](SF_DIR).count())
    timed("politeness_schedule",
          lambda: qs["politeness_schedule"](SF_DIR).count())
    timed("domain_reputation",
          lambda: qs["domain_reputation"](SF_DIR).count())
    timed("ks_drift", lambda: qs["ks_drift"](SF_DIR).count())
    timed("vocab_coverage",
          lambda: qs["vocab_coverage"](SF_DIR).count())
    timed("robots_delays",
          lambda: qs["robots_delays"](SF_DIR).count())
    timed("url_templates",
          lambda: qs["url_templates"](SF_DIR).count())
    timed("walk_skipgrams",
          lambda: qs["walk_skipgrams"](SF_DIR).count())
    timed("dedup_minhash_recall",
          lambda: qs["dedup_minhash_recall"](SF_DIR).num_rows)

    # new-in-round-5 operators
    timed("multimodal_gif",
          lambda: nrows(qs["multimodal_gif"](SF_DIR)))
    timed("bitext_candidates",
          lambda: nrows(qs["bitext_candidates"](SF_DIR)))

    out = {
        "metric": "extraction seconds on deterministic interleaved corpus "
                  "(plus per-operator seconds)",
        "value": timings["extract"],
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": n_docs,
        "questions": n_questions,
        "docs_per_sec": round(n_docs / timings["extract"], 1),
    }
    ray.shutdown()
    return out


def _spin(n: int) -> float:
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i * i % 7
    return time.time() - t0


def _effective_cores(n_procs: int) -> float:
    """Measured parallel Python capacity of this machine at n_procs
    worker processes (the sandbox host is oversubscribed: 32 requested
    CPUs deliver ~22 effective cores, 8 deliver ~7, so the HARDWARE
    ceiling for 8->32 'scaling efficiency' is ~(22/7)/4 ~= 0.79).
    Reported alongside so the pipeline's own scaling is separable from
    the host's."""
    import multiprocessing as mp

    n = 8_000_000
    t1 = min(_spin(n) for _ in range(3))          # noise-resistant baseline
    with mp.Pool(n_procs) as pool:
        pool.map(_spin, [n // 10] * n_procs)      # warm the pool
        wall = 1e9
        for _ in range(2):
            t0 = time.time()
            pool.map(_spin, [n] * n_procs)
            wall = min(wall, time.time() - t0)
    # a probe can't see more cores than processes
    return round(min(float(n_procs), n_procs * t1 / wall), 2)


def run_scaling() -> dict:
    """Same headline job, fresh processes at 8 and 32 CPUs, on a larger
    corpus so fixed costs amortize; reports raw efficiency plus the
    machine-capacity-normalized efficiency."""
    docs = int(os.environ.get("GRAFT_SCALING_DOCS", "100000"))

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SF_DIR=SF_DIR, GRAFT_BENCH_DOCS=str(docs),
                   GRAFT_BENCH_ONLY="extract")
        proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                              env=env, capture_output=True, text=True,
                              check=True)
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # probe host capacity immediately adjacent to each timed run — the
    # sandbox host's capacity drifts by the minute
    cap_8 = _effective_cores(8)
    lo = one(8)
    cap_32 = _effective_cores(32)
    hi = one(32)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (32 / 8)
    hw_ceiling = (cap_32 / cap_8) / (32 / 8)
    return {
        "metric": "scaling efficiency, extraction at num_cpus=8 vs 32",
        "sec_8": t_lo, "sec_32": t_hi,
        "docs_per_sec_8": lo["docs_per_sec"],
        "docs_per_sec_32": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "effective_cores_8": cap_8, "effective_cores_32": cap_32,
        "hardware_ceiling": round(hw_ceiling, 3),
        "pipeline_efficiency_vs_hardware": round(eff / hw_ceiling, 3),
        "docs": docs, "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmarks()))
