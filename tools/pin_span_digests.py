"""Regenerate the pinned span-pipeline digest expectations.

Runs the six canonical digest-gate queries (which reduce the full
pipeline outputs via __ray_entry__._digest_gate) at each testdata tier
and prints the (check, n_rows, digest) rows to paste into the
``oracle_sql()`` literals.  Only ``extract_questions`` depends on the
tier (via the documents row count feeding synth.generate_dataset); the
other five are pinned by their fixed synth/fixture/dense-prefix
inputs.

Run after any intentional change to the span-pipeline semantics (and
only after tests/test_fixture_equality.py is green — the fixtures are
the primary gate; these digests are the driver-facing projection of the
same trust model).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPAN_QUERIES = ["extract_questions", "extract_fixture_replay",
                "extract_flat_restitch", "split_spans", "curate_corpus",
                "v3_parse"]


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from doc_ocr_ray.runtime import configure_data_context
    configure_data_context(8)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    tiers = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]
    for sf_dir in tiers:
        for name in SPAN_QUERIES:
            row = qs[name](sf_dir)
            print(f"{sf_dir}  {name}: n_rows={int(row['n_rows'][0])} "
                  f"digest={row['digest'][0]}")
    ray.shutdown()


if __name__ == "__main__":
    main()
