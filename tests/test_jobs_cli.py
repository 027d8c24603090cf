"""spark-submit job entries exercised in-process (they getOrCreate the
session): extract→resume→build_graph end to end."""

import json

from code_index_spark.schema import TRANSCRIPTS
from code_index_spark.synth import synthesize
from jobs import build_graph as build_graph_job
from jobs import extract_triples as extract_job


def test_jobs_end_to_end(spark, tmp_path, capsys):
    pdf, _ = synthesize(20, seed=42)
    in_dir = str(tmp_path / "transcripts")
    spark.createDataFrame(pdf, schema=TRANSCRIPTS).write.parquet(in_dir)

    argv = [
        "--input", in_dir,
        "--output", str(tmp_path / "triples"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--buckets", "8",
    ]
    extract_job.main(argv)
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["processed_buckets"] == 8 and first["triples_written"] > 0

    extract_job.main(argv)  # resume: nothing to do
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second == {"processed_buckets": 0, "triples_written": 0,
                      "reconciled_buckets": 0}

    build_graph_job.main([
        "--triples", str(tmp_path / "triples"),
        "--output", str(tmp_path / "graph"),
    ])
    g = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert g["vertices"] > 0 and g["edges"] > 0


def test_dedupe_job_cli(spark, tmp_path, capsys):
    from jobs import dedupe_corpus as dedupe_job

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, base + " tail"), (3, "something else entirely here")],
        "doc_id long, text string",
    )
    in_dir = str(tmp_path / "docs")
    docs.write.parquet(in_dir)
    out = str(tmp_path / "pairs")
    dedupe_job.main(["--input", in_dir, "--output", out, "--strategy", "verified",
                     "--threshold", "0.7"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] >= 1  # the exact dup pair survives rescoring
    got = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(out).collect()}
    assert (0, 1) in got and all(3 not in p for p in got)

    clean = str(tmp_path / "cleaned")
    dedupe_job.main(["--input", in_dir, "--output", clean,
                     "--strategy", "passages", "--window", "3"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == 4  # one row per doc, cleaned corpus
    cleaned = {r["doc_id"]: r for r in spark.read.parquet(clean).collect()}
    assert cleaned[1]["cleaned_text"] == ""  # byte copy of 0, emptied
    assert cleaned[0]["n_removed"] == 0


def test_curate_job_cli(spark, tmp_path, capsys):
    from jobs import curate_corpus as curate_job

    good = "the quick brown fox and the lazy dog of the meadow in town"
    docs = spark.createDataFrame(
        [(0, good), (1, good), (2, good + " tonight"), (3, "x"),
         (4, "el la de el la de uno dos tres cuatro cinco seis")],
        "doc_id long, text string",
    )
    in_dir = str(tmp_path / "cdocs")
    docs.write.parquet(in_dir)
    out, lab = str(tmp_path / "curated"), str(tmp_path / "labels")
    curate_job.main(["--input", in_dir, "--output", out, "--labels", lab])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["reasons"]["keep"]["n_docs"] == 1
    assert res["reasons"]["exact_dup"]["n_docs"] == 1
    surviving = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert surviving == {0}
    labels = {r["doc_id"]: r["reason"] for r in spark.read.parquet(lab).collect()}
    assert labels == {0: "keep", 1: "exact_dup", 2: "near_dup",
                      3: "low_quality", 4: "non_en"}


def test_prepare_job_cli(spark, tmp_path, capsys):
    """jobs/prepare_corpus.py end to end: survivors written REDACTED and
    partitioned by split, audit table carries every reason, run report
    aggregates via prepare.summarize_labels (one definition)."""
    from jobs import prepare_corpus as prepare_job

    good = "the quick brown fox and the lazy dog of the meadow in town"
    piiish = ("ping the code and test the data of the trade in main then"
              " email me at user@example.org now")
    docs = spark.createDataFrame(
        [(0, good), (1, good), (2, good + " tonight"), (3, "x"),
         (4, "el la de el la de uno dos tres cuatro cinco seis"),
         (5, "alpha beta gamma"), (6, piiish)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, "alpha beta gamma delta")],
                               "doc_id long, text string")
    in_dir, ev_dir = str(tmp_path / "pdocs"), str(tmp_path / "pev")
    docs.write.parquet(in_dir)
    ev.write.parquet(ev_dir)
    out, lab = str(tmp_path / "prepared"), str(tmp_path / "plabels")
    prepare_job.main(["--input", in_dir, "--eval", ev_dir, "--output", out,
                      "--labels", lab, "--gram-n", "3"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    reasons = {(r["reason"]) for r in res["report"]}
    assert {"keep", "exact_dup", "near_dup", "low_quality", "non_en",
            "contaminated"} <= reasons
    survivors = spark.read.parquet(out).collect()
    assert {r["doc_id"] for r in survivors} == {0, 6}
    by_id = {r["doc_id"]: r for r in survivors}
    assert "user@example.org" not in by_id[6]["text"]  # redacted
    assert "<EMAIL>" in by_id[6]["text"]
    assert by_id[0]["split"] in ("train", "val", "test")  # split column kept
    labels = {r["doc_id"]: r["reason"]
              for r in spark.read.parquet(lab).collect()}
    assert labels[5] == "contaminated" and labels[1] == "exact_dup"


def test_train_tokenizer_job_cli(spark, tmp_path, capsys):
    """jobs/train_tokenizer.py: merge table persisted and reloadable,
    encoded table carries the compression the report claims."""
    from jobs import train_tokenizer as tok_job

    docs = spark.createDataFrame(
        [(0, "low low low low low"), (1, "lower lower newest newest"),
         (2, "newest newest newest newest"), (3, "widest widest widest")],
        "doc_id long, text string",
    )
    in_dir = str(tmp_path / "tdocs")
    docs.write.parquet(in_dir)
    merges_dir, enc_dir = str(tmp_path / "merges"), str(tmp_path / "enc")
    tok_job.main(["--input", in_dir, "--merges", merges_dir,
                  "--encoded", enc_dir, "--n-merges", "10",
                  "--min-count", "1"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["merges_learned"] == 10 and rep["chars_per_token"] > 1
    got = spark.read.parquet(merges_dir)
    assert got.count() == 10
    assert {r["rank"] for r in got.collect()} == set(range(10))
    enc = spark.read.parquet(enc_dir)
    assert enc.count() == 4
    assert enc.filter("learned_tokens > base_chars").count() == 0


def test_materialize_training_set_job_cli(spark, tmp_path, capsys):
    """jobs/materialize_training_set.py: mixture epochs honored,
    per-shard token streams contiguous, block count matches the
    report, layout partitioned by shard and deterministic on re-run."""
    import os

    from jobs import materialize_training_set as mts_job

    vocab = ["alpha", "beta", "gamma", "delta", "omega"]
    rows = [(i, "a" if i % 2 == 0 else "b",
             " ".join(vocab[(i * 7 + j) % 5] for j in range(6)))
            for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    in_dir = str(tmp_path / "prepared")
    docs.write.parquet(in_dir)
    out_dir = str(tmp_path / "layout")
    argv = ["--input", in_dir, "--output", out_dir,
            "--rates", '{"a": 2.0, "b": 1.0}', "--stratum-col", "source",
            "--n-merges", "4", "--min-count", "1",
            "--budget", "8", "--n-shards", "2"]
    mts_job.main(argv)
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # rate 2.0 -> exactly 2 copies of every 'a' doc; 1.0 -> one 'b' copy
    assert rep["n_units"] == 2 * 6 + 6 and rep["oversample"] == 1.5
    assert os.path.isdir(os.path.join(out_dir, "shard=0"))
    # the one-pass encode lands as a reusable artifact
    assert spark.read.parquet(rep["counts"]).count() == 12

    got = spark.read.parquet(out_dir).toPandas()
    assert len(got) == rep["n_units"]
    a_epochs = got[got.doc_id % 2 == 0].groupby("doc_id").epoch.agg(set)
    assert all(e == {0, 1} for e in a_epochs)
    blocks = 0
    for _, g in got.groupby("shard"):
        g = g.sort_values("tok_start")
        # contiguous stream: each unit starts where the previous ended
        assert (g.tok_start == g.n_tokens.cumsum() - g.n_tokens).all()
        total = int(g.n_tokens.sum())
        blocks += -(-total // 8)
        assert (g.block_first == g.tok_start // 8).all()
    assert rep["blocks"] == blocks and rep["merges_used"] == 4

    mts_job.main(argv)  # deterministic layout: bytes differ, values don't
    capsys.readouterr()
    again = spark.read.parquet(out_dir).toPandas()
    cols = ["doc_id", "epoch", "shard", "n_tokens", "tok_start"]
    assert (got[cols].sort_values(cols).values
            == again[cols].sort_values(cols).values).all()


def test_prepare_job_bucket_store(spark, tmp_path, capsys):
    """--bucket-store: same results as the plain run, and the
    corpus×labels id-join — the one every nightly consumer repeats —
    plans with ZERO Exchange off the persisted tables. Second run
    re-attaches the existing docs layout instead of rewriting it."""
    from jobs import prepare_corpus as prepare_job
    from jobs.prepare_corpus import store_tables

    good = "the quick brown fox and the lazy dog of the meadow in town"
    docs = spark.createDataFrame(
        [(0, good), (1, good), (2, good + " tonight"), (3, "x"),
         (4, "alpha beta gamma")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, "alpha beta gamma delta")],
                               "doc_id long, text string")
    in_dir, ev_dir = str(tmp_path / "bdocs"), str(tmp_path / "bev")
    docs.write.parquet(in_dir)
    ev.write.parquet(ev_dir)
    store = str(tmp_path / "store")
    argv = ["--input", in_dir, "--eval", ev_dir, "--gram-n", "3",
            "--bucket-store", store, "--n-buckets", "4"]

    prepare_job.main(argv + ["--output", str(tmp_path / "out_b")])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["bucket_store"]["n_buckets"] == 4

    prepare_job.main(["--input", in_dir, "--eval", ev_dir, "--gram-n", "3",
                      "--output", str(tmp_path / "out_plain")])
    capsys.readouterr()
    want = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "out_plain")).select("doc_id", "text").collect()))
    got = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "out_b")).select("doc_id", "text").collect()))
    assert got == want

    # the recurring consumer join, exactly as the job plans it
    docs_tbl, labels_tbl = store_tables(store)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(docs_tbl).join(
            spark.table(labels_tbl)
            .filter("reason = 'keep'").select("doc_id", "split"),
            "doc_id",
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # rerun: docs dir exists → register (no rewrite), labels refreshed
    docs_files = set(spark.table(docs_tbl).inputFiles())
    prepare_job.main(argv + ["--output", str(tmp_path / "out_b2")])
    capsys.readouterr()
    assert set(spark.table(docs_tbl).inputFiles()) == docs_files

    # grown corpus dir: the input signature no longer matches the
    # sidecar, so the store RE-INGESTS instead of silently preparing
    # yesterday's snapshot — the new doc must reach the output
    spark.createDataFrame(
        [(9, "the new omega document joins the corpus and is kept today")],
        "doc_id long, text string",
    ).write.mode("append").parquet(in_dir)
    prepare_job.main(argv + ["--output", str(tmp_path / "out_b3")])
    capsys.readouterr()
    out3_ids = {r["doc_id"] for r in spark.read.parquet(
        str(tmp_path / "out_b3")).select("doc_id").collect()}
    assert 9 in out3_ids
    assert {r["doc_id"] for r in spark.table(docs_tbl)
            .select("doc_id").collect()} == {0, 1, 2, 3, 4, 9}
    spark.sql(f"DROP TABLE IF EXISTS `{docs_tbl}`")
    spark.sql(f"DROP TABLE IF EXISTS `{labels_tbl}`")


def test_prepare_stream_job_cli(spark, tmp_path, capsys):
    """jobs/prepare_stream_job.py: first invocation drains batch 1 and
    reports stream labels (no near_dup — deferred); a later invocation
    drains only the NEW file and, with --compact, writes the upgraded
    labels table equal to batch prepare_corpus over everything."""
    from code_index_spark.operators.prepare import prepare_corpus
    from jobs import prepare_stream_job

    good = "the quick brown fox and the lazy dog of the meadow in town"
    b1 = [(0, good), (3, "x")]
    b2 = [(20, good + " tonight"),   # cross-batch near-dup of 0
          (22, good)]                # cross-batch exact dup of 0
    ev = spark.createDataFrame([(100, "alpha beta gamma delta")],
                               "doc_id long, text string")
    in_dir, ev_dir = str(tmp_path / "in"), str(tmp_path / "ev")
    state, ck = str(tmp_path / "state"), str(tmp_path / "ck")
    comp = str(tmp_path / "compacted")
    ev.write.parquet(ev_dir)
    base = ["--input", in_dir, "--eval", ev_dir, "--state", state,
            "--checkpoint", ck, "--gram-n", "3"]

    spark.createDataFrame(b1, "doc_id long, text string").coalesce(
        1).write.mode("overwrite").parquet(in_dir)
    prepare_stream_job.main(base)
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["labels"] == "stream" and res["n_docs"] == 2
    assert "near_dup" not in res["reasons"]

    spark.createDataFrame(b2, "doc_id long, text string").coalesce(
        1).write.mode("append").parquet(in_dir)
    prepare_stream_job.main(base + ["--compact", comp])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["labels"] == "compacted" and res["n_docs"] == 4
    assert res["reasons"].get("near_dup") == 1

    full = spark.createDataFrame(b1 + b2, "doc_id long, text string")
    want = sorted(map(tuple, prepare_corpus(full, ev,
                                            decontam_gram_n=3).collect()))
    got = sorted(map(tuple, spark.read.parquet(comp).collect()))
    assert got == want


def test_build_search_index_job_cli(spark, tmp_path, capsys):
    """Both serving indexes built + bucketed by the job, probe query
    served from the persisted form (the batch half of the reference's
    index-then-serve split)."""
    from code_index_spark.operators.extract import extract_triples_sql
    from jobs import build_search_index as job

    pdf, _ = synthesize(20, seed=42)
    t = spark.createDataFrame(pdf, schema=TRANSCRIPTS)
    triples_dir = str(tmp_path / "triples")
    extract_triples_sql(t).write.parquet(triples_dir)
    docs_dir = str(tmp_path / "docs")
    t.selectExpr(
        "conv_id || '-' || turn_idx AS doc_id", "text"
    ).write.parquet(docs_dir)

    try:
        job.main([
            "--triples", triples_dir, "--docs", docs_dir,
            "--output", str(tmp_path / "idx"), "--buckets", "8",
            "--id-col", "doc_id", "--probe", "acme corp widget",
        ])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["entities_rows"] > 0 and out["bm25_postings"] > 0
        assert out["probe_entities_ms"] > 0 and out["probe_bm25_ms"] > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS search_index_entities")
        spark.sql("DROP TABLE IF EXISTS search_index_bm25")
