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
