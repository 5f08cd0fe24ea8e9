"""Checkpoint/resume: manifest, atomic writes, shard skipping."""
import glob
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_manifest_roundtrip(tmp_path):
    from doc_ocr_ray.state.manifest import JobManifest
    path = str(tmp_path / "m.json")
    out_dir = tmp_path / "part-00000"
    out_dir.mkdir()
    m = JobManifest(path)
    assert not m.is_done(0)
    m.mark_done(0, rows_in=10, rows_out=50, output=str(out_dir),
                wall_sec=1.2)
    m2 = JobManifest(path)
    assert m2.is_done(0) and not m2.is_done(1)
    assert m2.summary()["rows_out"] == 50
    # trust-but-verify: manifest says done but the committed output was
    # deleted out-of-band -> the shard must be redone, not skipped
    out_dir.rmdir()
    assert not m2.is_done(0)


@pytest.mark.usefixtures("ray_session")
def test_write_table_atomic_and_readback(tmp_path):
    import ray.data
    from doc_ocr_ray import synth
    from doc_ocr_ray.sources.io import write_table, read_questions
    ds = ray.data.from_arrow(synth.generate_table(10, seed=42))
    out = str(tmp_path / "out")
    final = write_table(ds, out, partition_id=3)
    assert final.endswith("part-00003")
    assert not any(d.startswith(".tmp") for d in os.listdir(out))
    back = read_questions(out)
    assert back.count() == 10


def test_partial_resume_recomputes_only_missing(tmp_path):
    """Drop one shard from the manifest -> rerun recomputes only it."""
    out = str(tmp_path / "job")
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    cmd = [sys.executable, os.path.join(REPO, "jobs", "run_extract.py"),
           "--input", "synth:200", "--output", out, "--shards", "2",
           "--num-cpus", "4"]
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    manifest_path = os.path.join(out, "manifest.json")
    with open(manifest_path) as f:
        records = json.load(f)
    assert records["0"]["state"] == "done" and records["1"]["state"] == "done"
    rows_out_0 = records["0"]["rows_out"]
    # simulate a crash after shard 1 only
    del records["0"]
    with open(manifest_path, "w") as f:
        json.dump(records, f)
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "[shard 1] already committed, skipping" in r2.stdout
    assert "[shard 0] docs_in=" in r2.stdout
    with open(manifest_path) as f:
        records2 = json.load(f)
    assert records2["0"]["rows_out"] == rows_out_0    # deterministic recompute


@pytest.mark.usefixtures("ray_session")
def test_poison_doc_contained():
    """A document whose spans break the chain becomes one 'error' row;
    the rest of the batch still extracts."""
    import ray.data
    import pyarrow as pa
    from doc_ocr_ray.pipelines.extract import extract_questions
    from doc_ocr_ray.config import PipelineConfig
    from doc_ocr_ray.schema import SPAN_STRUCT

    good = [{"kind": "text", "text": "1.这是一道完整的题目内容。",
             "media_ref": "", "offset": 0}]
    # None offsets make the offset sort compare None<int -> TypeError
    poison = [{"kind": "text", "text": "x", "media_ref": "", "offset": None},
              {"kind": "text", "text": "y", "media_ref": "", "offset": 1}]
    tbl = pa.table({
        "doc_id": pa.array(["good", "poison"], pa.string()),
        "spans": pa.array([good, poison], pa.list_(SPAN_STRUCT)),
    })
    rows = extract_questions(ray.data.from_arrow(tbl)).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert any(r["group_type"] == "question" for r in by_doc["good"])
    err = by_doc["poison"]
    assert len(err) == 1 and err[0]["group_type"] == "error"
    assert "TypeError" in err[0]["merged_text"]
    # fail_fast surfaces the (poison TypeError) exception instead
    with pytest.raises(Exception, match="TypeError"):
        extract_questions(ray.data.from_arrow(tbl),
                          config=PipelineConfig(fail_fast=True)).take_all()


@pytest.mark.usefixtures("ray_session")
def test_orc_source_roundtrip_and_pruning(tmp_path):
    """ORC arrival format: write_orc_shards slices into N files,
    read_orc reads them file-parallel with column pruning; values and
    dtypes survive the roundtrip; short tables leave trailing shards
    empty (absent) without breaking the read."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest
    from doc_ocr_ray.sources.io import read_orc, write_orc_shards
    tbl = pa.table({
        "a": pa.array(np.arange(100, dtype=np.int64)),
        "b": pa.array([f"s{i}" for i in range(100)]),
        "c": pa.array(np.arange(100) * 0.5)})
    out = str(tmp_path / "orc")
    write_orc_shards(tbl, out, num_shards=8)
    files = sorted(os.listdir(out))
    assert len(files) == 8 and all(f.endswith(".orc") for f in files)
    back = read_orc(out).to_pandas().sort_values("a").reset_index(drop=True)
    assert back["a"].tolist() == list(range(100))
    assert back["b"].tolist() == [f"s{i}" for i in range(100)]
    assert back["c"].tolist() == [i * 0.5 for i in range(100)]
    pruned = read_orc(out, columns=["a"]).to_pandas()
    assert list(pruned.columns) == ["a"] and len(pruned) == 100
    # 3 rows over 8 shards: trailing shards absent, read still whole
    small = str(tmp_path / "orc_small")
    write_orc_shards(tbl.slice(0, 3), small, num_shards=8)
    assert read_orc(small).count() == 3
    # zero-row table commits a schema-bearing empty shard (the
    # empty-partition convention) and round-trips as an empty read
    empty = str(tmp_path / "orc_empty")
    write_orc_shards(tbl.slice(0, 0), empty, num_shards=8)
    eds = read_orc(empty)
    assert eds.count() == 0
    assert set(eds.schema().names) == {"a", "b", "c"}
    # unknown column fails loudly, not silently empty
    with _pytest.raises(Exception):
        read_orc(out, columns=["nope"]).materialize()


@pytest.mark.usefixtures("ray_session")
def test_read_documents_accepts_file_list(tmp_path):
    import ray.data
    from doc_ocr_ray import synth
    from doc_ocr_ray.sources.io import read_documents
    d = str(tmp_path / "docs")
    ray.data.from_arrow(synth.generate_table(20, seed=42)).repartition(4) \
        .write_parquet(d)
    files = sorted(os.path.join(d, f) for f in os.listdir(d))
    assert len(files) >= 2
    # a shard's slice: every other file
    part = read_documents(files[::2])
    whole = read_documents(d)
    assert 0 < part.count() < whole.count() == 20


def test_run_curate_resume_and_empty_partition(tmp_path):
    """Curation job commits, resumes, and an all-filtered shard still
    commits an EMPTY partition (zero-row write must not crash)."""
    import hashlib
    import pandas as pd
    inp = str(tmp_path / "docs.parquet")
    # docs 0..39: every doc hashing into shard 0 (the driver's md5 pick
    # rule) gets 3 proper sentences (funnel survivors at min-words 5);
    # shard-1 docs stay single-line -> shard 1 commits an EMPTY partition
    rows = []
    n_keep = 0
    for i in range(40):
        shard = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2
        t = "the cat and a dog of the barn is in town to see it"
        if shard == 0:
            n_keep += 1
            t += ("\nFirst proper sentence with enough words here."
                  "\nSecond proper sentence with enough words too."
                  "\nThird proper sentence with enough words again.")
        rows.append({"doc_id": i, "text": t})
    assert n_keep not in (0, 40)    # both shard fates represented
    pd.DataFrame(rows).to_parquet(inp, index=False)
    out = str(tmp_path / "job")
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    cmd = [sys.executable, os.path.join(REPO, "jobs", "run_curate.py"),
           "--input", inp, "--output", out, "--shards", "2",
           "--min-words", "5", "--num-cpus", "4"]
    r1 = subprocess.run(cmd, env=env, capture_output=True, text=True)
    assert r1.returncode == 0, r1.stderr[-2000:]
    summary = json.loads(r1.stdout.strip().splitlines()[-1])
    assert summary["shards_done"] == 2
    assert summary["rows_out"] == n_keep  # only shard-0 docs survive
    # one partition is empty but still committed AND the partitioned
    # output reads back whole (empty marker file, not a bare dir)
    assert r1.stdout.count("kept=0") == 1
    read_cmd = [sys.executable, "-c",
                "import sys; sys.path.insert(0, %r); "
                "import ray; ray.init(address='local', num_cpus=4, "
                "include_dashboard=False, logging_level='ERROR'); "
                "from doc_ocr_ray.sources.io import read_questions; "
                "print('ROWS', read_questions(%r).count()); "
                "ray.shutdown()" % (REPO, out)]
    rb = subprocess.run(read_cmd, env=env, capture_output=True, text=True)
    assert rb.returncode == 0, rb.stderr[-2000:]
    assert f"ROWS {n_keep}" in rb.stdout
    # resume: both shards skip
    r2 = subprocess.run(cmd, env=env, capture_output=True, text=True)
    assert r2.returncode == 0
    assert r2.stdout.count("already committed") == 2
    # parameter drift is refused
    r3 = subprocess.run(cmd[:-3] + ["7", "--num-cpus", "4"], env=env,
                        capture_output=True, text=True)
    assert r3.returncode == 2


def test_run_extract_html_format(tmp_path):
    """--format html: raw crawl pages flow through the main-content
    extractor into the flagship pipeline, sharded + resumable."""
    import pandas as pd
    pages = pd.DataFrame({
        "doc_id": pd.Series(range(40), dtype="int64"),
        "html": [f"<nav><a>junk</a></nav><h1>Page {i}</h1>"
                 f"<p>{'content words ' * 4}for page {i}.</p>"
                 f"<img src='im/{i}.png'><footer>f</footer>"
                 for i in range(40)]})
    src = str(tmp_path / "pages.parquet")
    pages.to_parquet(src)
    out = str(tmp_path / "job")
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    cmd = [sys.executable, os.path.join(REPO, "jobs", "run_extract.py"),
           "--input", src, "--output", out, "--shards", "2",
           "--format", "html", "--num-cpus", "4"]
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    import pyarrow.dataset as pads
    tbl = pads.dataset(out, format="parquet",
                       ignore_prefixes=[".", "_", "manifest"]).to_table()
    df = tbl.to_pandas()
    # every page contributed groups under its html- provenance id
    assert df["doc_id"].str.startswith("html-").all()
    assert df["doc_id"].nunique() == 40
    # rerun skips both committed shards
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "[shard 0] already committed, skipping" in r2.stdout
    assert "[shard 1] already committed, skipping" in r2.stdout


def test_run_dedup_two_phase_resume(tmp_path):
    """Global dedup job: duplicates straddling input files are caught
    (the cross-shard case shard-independent jobs cannot handle), the
    min-doc_id winner survives norm-equality, and deleting one
    phase-2 bucket's record + partition recomputes ONLY that bucket
    with byte-identical output."""
    import glob as _glob
    import shutil

    import pandas as pd
    inp = str(tmp_path / "docs")
    os.makedirs(inp)
    rows1 = [{"doc_id": i, "text": f"unique text {i}"}
             for i in range(20)]
    rows2 = ([{"doc_id": 100 + i, "text": f"unique text {i}"}
              for i in range(5)]           # straddles the two files
             + [{"doc_id": 300, "text": "  Unique   TEXT 0 "}])
    pd.DataFrame(rows1).to_parquet(f"{inp}/a.parquet", index=False)
    pd.DataFrame(rows2).to_parquet(f"{inp}/b.parquet", index=False)
    out = str(tmp_path / "job")
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    cmd = [sys.executable, os.path.join(REPO, "jobs", "run_dedup.py"),
           "--input", inp, "--output", out, "--shards", "2",
           "--buckets", "3", "--num-cpus", "4"]
    r1 = subprocess.run(cmd, env=env, capture_output=True, text=True)
    assert r1.returncode == 0, r1.stderr[-2000:]
    summary = json.loads(r1.stdout.strip().splitlines()[-1])
    assert summary["n_unique"] == 20 and summary["n_dups"] == 6

    def survivors():
        fs = [f for f in sorted(_glob.glob(
            f"{out}/part-*/**/*.parquet", recursive=True))
            if "phase1" not in f]
        return pd.concat([pd.read_parquet(f) for f in fs])

    s1 = survivors()
    assert 0 in set(s1["doc_id"])          # min doc_id wins its group
    assert not {100, 300} & set(s1["doc_id"])
    # partial resume: drop ONE phase-2 bucket
    man = json.load(open(f"{out}/manifest.json"))
    del man["100001"]
    json.dump(man, open(f"{out}/manifest.json", "w"))
    shutil.rmtree(f"{out}/part-00001")
    r2 = subprocess.run(cmd, env=env, capture_output=True, text=True)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert r2.stdout.count("skipping") == 4      # 2 shards + 2 buckets
    assert sorted(survivors()["doc_id"]) == sorted(s1["doc_id"])
    # parameter drift refused without --fresh
    r3 = subprocess.run(cmd[:-4] + ["--buckets", "5", "--num-cpus", "4"],
                        env=env, capture_output=True, text=True)
    assert r3.returncode == 2 and "different parameters" in r3.stderr


def test_run_neardup_three_phase_resume(tmp_path):
    """Near-dup job: fuzzy duplicates straddling input files are
    caught, transitive chains collapse to one keeper (min doc_id),
    clean docs survive, and deleting one phase-2 bucket's record +
    partition plus the phase-3 record recomputes only those steps
    with identical output."""
    import glob as _glob
    import shutil

    import pandas as pd
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    inp = str(tmp_path / "docs")
    os.makedirs(inp)
    # file a: original (1) + clean docs; file b: near-copies of 1
    # (one-word edits -> high signature agreement) forming a chain
    rows1 = ([{"doc_id": 1, "text": base}]
             + [{"doc_id": 10 + i,
                 "text": " ".join(f"w{i}x{j}" for j in range(30))}
                for i in range(6)])     # zero shared shingles
    rows2 = [{"doc_id": 101, "text": base + " extra"},
             {"doc_id": 102, "text": base + " extra more"}]
    pd.DataFrame(rows1).to_parquet(f"{inp}/a.parquet", index=False)
    pd.DataFrame(rows2).to_parquet(f"{inp}/b.parquet", index=False)
    out = str(tmp_path / "job")
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    cmd = [sys.executable, os.path.join(REPO, "jobs", "run_neardup.py"),
           "--input", inp, "--output", out, "--shards", "2",
           "--buckets", "3", "--threshold", "0.5", "--num-cpus", "4"]
    r1 = subprocess.run(cmd, env=env, capture_output=True, text=True)
    assert r1.returncode == 0, r1.stderr[-2000:]
    summary = json.loads(r1.stdout.strip().splitlines()[-1])
    assert summary["n_docs"] == 9

    def drop_rows():
        fs = [f for f in sorted(_glob.glob(
            f"{out}/part-*/**/*.parquet", recursive=True))
            if "phase1" not in f and "phase2" not in f]
        return pd.concat([pd.read_parquet(f) for f in fs])

    d1 = drop_rows()
    # 101 and 102 are near-dups of 1 (cross-file!) -> dropped, keep 1
    assert sorted(d1["doc_id"]) == [101, 102]
    assert set(d1["keep_id"]) == {1}
    assert summary["n_dup_docs"] == 2
    # resume: drop one phase-2 bucket and the phase-3 step
    man = json.load(open(f"{out}/manifest.json"))
    del man["100001"], man["200000"]
    json.dump(man, open(f"{out}/manifest.json", "w"))
    shutil.rmtree(f"{out}/phase2/part-00001", ignore_errors=True)
    shutil.rmtree(f"{out}/part-00000")
    r2 = subprocess.run(cmd, env=env, capture_output=True, text=True)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert r2.stdout.count("skipping") == 4      # 2 shards + 2 buckets
    d2 = drop_rows()
    pd.testing.assert_frame_equal(
        d1.sort_values("doc_id").reset_index(drop=True),
        d2.sort_values("doc_id").reset_index(drop=True))
    # parameter drift refused without --fresh
    r3 = subprocess.run(cmd[:8] + ["--buckets", "5"] + cmd[10:],
                        env=env, capture_output=True, text=True)
    assert r3.returncode == 2 and "different parameters" in r3.stderr
    # phase 4 (--apply) is additive: reuses all committed phases and
    # writes the deduplicated corpus (survivors = docs minus drops)
    r4 = subprocess.run(cmd + ["--apply"], env=env,
                        capture_output=True, text=True)
    assert r4.returncode == 0, r4.stderr[-2000:]
    assert r4.stdout.count("skipping") == 6      # 2 shards, 3 bkts, p3
    s4 = json.loads(r4.stdout.strip().splitlines()[-1])
    assert s4["n_kept_docs"] == 7                # 9 docs - 2 dropped
    kept = pd.concat([pd.read_parquet(f) for f in sorted(_glob.glob(
        f"{out}/corpus/part-*/*.parquet"))])
    assert sorted(kept["doc_id"]) == [1, 10, 11, 12, 13, 14, 15]
    # re-invoking --apply skips the committed corpus shards too
    r5 = subprocess.run(cmd + ["--apply"], env=env,
                        capture_output=True, text=True)
    assert r5.returncode == 0
    assert r5.stdout.count("[p4 shard") == 2
    assert r5.stdout.count("already committed, skipping") == 8


def test_run_corpus_composed_chain_and_resume(tmp_path):
    """The composed end-to-end corpus driver (extract -> adapt ->
    neardup --apply -> trainset) runs as ONE command, writes composed
    cross-phase lineage whose sums tie out across phase boundaries,
    and a kill mid-chain (one adapter shard + one neardup phase-1
    shard record dropped) recomputes ONLY the open work with
    identical lineage."""
    import shutil

    out = str(tmp_path / "corpus")
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    cmd = [sys.executable, os.path.join(REPO, "jobs", "run_corpus.py"),
           "--input", "synth:120", "--output", out, "--shards", "2",
           "--buckets", "2", "--num-cpus", "4"]
    r1 = subprocess.run(cmd, env=env, capture_output=True, text=True)
    assert r1.returncode == 0, r1.stderr[-2000:]
    lineage1 = json.loads(r1.stdout.strip().splitlines()[-1])
    # cross-phase lineage ties out: every extract question row became
    # exactly one adapter doc; neardup read exactly those docs; the
    # trainset kept a subset of the neardup survivors
    assert lineage1["extract"]["docs_in"] == 120
    assert lineage1["adapt"]["rows_in"] == \
        lineage1["extract"]["question_rows_out"]
    assert lineage1["adapt"]["docs_out"] == lineage1["adapt"]["rows_in"]
    assert lineage1["neardup"]["docs_in"] == \
        lineage1["adapt"]["docs_out"]
    assert lineage1["neardup"]["docs_kept"] == \
        lineage1["neardup"]["docs_in"] \
        - lineage1["neardup"]["dup_docs_dropped"]
    assert 0 < lineage1["trainset"]["docs_kept"] \
        <= lineage1["neardup"]["docs_kept"]
    assert sum(lineage1["trainset"]["splits"].values()) == \
        lineage1["trainset"]["docs_kept"]
    assert os.path.exists(os.path.join(out, "lineage.json"))

    # kill-and-resume: reopen one adapter shard and one neardup
    # phase-1 shard (record + committed partition), rerun
    top = json.load(open(f"{out}/manifest.json"))
    del top["1001"]
    json.dump(top, open(f"{out}/manifest.json", "w"))
    os.remove(f"{out}/docs/docs-00001.parquet")
    nd = json.load(open(f"{out}/neardup/manifest.json"))
    del nd["1"], nd["200000"]
    json.dump(nd, open(f"{out}/neardup/manifest.json", "w"))
    shutil.rmtree(f"{out}/neardup/phase1/part-00001")
    shutil.rmtree(f"{out}/neardup/part-00000")
    # the neardup child must re-run (its phase-1 shard is open), so
    # reopen the composer's neardup/trainset markers too — exactly
    # what a mid-phase kill leaves behind
    top = json.load(open(f"{out}/manifest.json"))
    del top["1"], top["2"]
    json.dump(top, open(f"{out}/manifest.json", "w"))
    shutil.rmtree(f"{out}/trainset")
    r2 = subprocess.run(cmd, env=env, capture_output=True, text=True)
    assert r2.returncode == 0, r2.stderr[-2000:]
    # extract child never re-spawned; committed shards all skipped
    assert "[corpus] extract already complete, skipping" in r2.stdout
    assert "[adapt shard 0] already committed, skipping" in r2.stdout
    assert "[adapt shard 1] rows=" in r2.stdout
    assert "[p1 shard 0] already committed, skipping" in r2.stdout
    assert "[p1 shard 1] docs=" in r2.stdout
    lineage2 = json.loads(r2.stdout.strip().splitlines()[-1])
    for k in ("extract", "adapt", "neardup", "trainset"):
        assert lineage2[k] == lineage1[k], k


def test_pagerank_round_checkpoint_resume(tmp_path, ray_session):
    """Iterative checkpoint resume: pagerank with a checkpoint dir
    commits one atomic rank partition per round; a run that stops at
    round 1 and a fresh call continuing to round 3 produce ranks
    BIT-IDENTICAL to an uninterrupted 3-round run, and the resumed
    call recomputes only the missing rounds (round-1 checkpoint file
    untouched)."""
    import pandas as pd
    import ray.data
    from doc_ocr_ray.stages.graph import pagerank

    edges = pd.DataFrame({"src": [0, 1, 2, 3, 4, 0, 2],
                          "dst": [1, 2, 3, 4, 0, 2, 0]})
    nodes = pd.DataFrame({"node": list(range(5))})

    def run(iters, ckpt=None):
        return (pagerank(ray.data.from_pandas(edges),
                         ray.data.from_pandas(nodes), iters=iters,
                         checkpoint_dir=ckpt)
                .to_pandas().sort_values("node")
                .reset_index(drop=True))

    want = run(3)                                   # uninterrupted
    ck = str(tmp_path / "pr")
    run(1, ckpt=ck)                                 # "crashes" after r1
    p1 = glob.glob(f"{ck}/part-00001/**/*.parquet", recursive=True)
    assert p1
    mtime = os.path.getmtime(p1[0])
    got = run(3, ckpt=ck)                           # resumes at r2
    pd.testing.assert_frame_equal(got, want)
    assert os.path.getmtime(p1[0]) == mtime         # r1 not recomputed
    assert os.path.isdir(f"{ck}/part-00003")
    # a third call finds all rounds committed and recomputes nothing
    mt3 = os.path.getmtime(glob.glob(
        f"{ck}/part-00003/**/*.parquet", recursive=True)[0])
    got2 = run(3, ckpt=ck)
    pd.testing.assert_frame_equal(got2, want)
    assert os.path.getmtime(glob.glob(
        f"{ck}/part-00003/**/*.parquet", recursive=True)[0]) == mt3
