"""Local stand-in for the driver's correctness gate: run every
queries() entry, compare against oracle_sql() via DuckDB (row count +
column names + order-insensitive value equality)."""
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])        # optional: restrict to named queries


def to_pandas(result):
    import ray.data
    import pyarrow as pa
    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
        if not len(df) and not len(df.columns):
            # zero-row Dataset.to_pandas() drops the column list
            # (CLAUDE.md) — rebuild it from the schema so a correct
            # empty answer still passes the column compare
            df = pd.DataFrame({c: pd.Series([], dtype="object")
                               for c in result.schema().names})
        return df
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from doc_ocr_ray.runtime import configure_data_context
    configure_data_context(8)
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(SF_DIR)))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s) [rows-only]")
            continue
        want = canon(con.sql(oracles[name]).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} vs {len(want)}")
            failures += 1
            continue
        try:
            # tolerant float compare after canonical sort
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
        except AssertionError as e:
            print(f"FAIL  {name}: value mismatch ({dt:.1f}s)")
            print(str(e)[:400])
            failures += 1
            continue
        # driver-style exactness: stringified sorted values must hash
        # equal (a float differing in the 12th decimal passes the
        # tolerant compare but breaks a value hash)
        import hashlib

        def vhash(df):
            return hashlib.md5(
                df.astype(str).to_csv(index=False).encode()).hexdigest()
        if vhash(got) != vhash(want):
            print(f"WARN  {name}: tolerant-equal but value-hash differs "
                  f"({dt:.1f}s) — check float formatting")
            failures += 1
        else:
            print(f"OK    {name}: {len(got)} rows ({dt:.1f}s)")
    print("failures:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
