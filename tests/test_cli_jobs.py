"""End-to-end CLI smoke: build a checkpointed index with
scripts/run_index_job.py, then retrieve + evaluate with
scripts/run_retrieve_job.py (the reference's index_*.sh /
retrieve_*.sh workflow shape)."""

import json
import sys

import pytest


def _json_lines(out: str) -> list[dict]:
    rows = []
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            rows.append(json.loads(line))
    return rows


@pytest.mark.parametrize("feedback", [False, True])
def test_index_then_retrieve_cli(spark, tmp_path, monkeypatch, capsys,
                                 feedback):
    import scripts.run_index_job as rij
    import scripts.run_retrieve_job as rrj

    idx_dir = str(tmp_path / "idx")
    queries = tmp_path / "queries.tsv"
    queries.write_text("c1\tspark join window\nc2\tstream hash\n")
    qrels = tmp_path / "qrels.txt"
    qrels.write_text(
        "".join(f"c1 0 {d} {d % 2}\n" for d in range(20))
        + "".join(f"c2 0 {d} {(d + 1) % 2}\n" for d in range(20))
    )
    run_out = str(tmp_path / "res.txt")

    monkeypatch.setattr(sys, "argv", [
        "run_index_job.py",
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--index", idx_dir, "--slices", "2", "--analyzer", "simple",
    ])
    rij.main()
    build_out = _json_lines(capsys.readouterr().out)
    assert any(o.get("stage") == "build" for o in build_out)

    argv = [
        "run_retrieve_job.py", "--index", idx_dir,
        "--queries", str(queries), "--qrels", str(qrels),
        "--run-out", run_out, "--k", "10",
        "--analyzer", "simple", "--sim", "lmjm",
    ]
    if feedback:
        argv.append("--feedback")
    monkeypatch.setattr(sys, "argv", argv)
    rrj.main()
    out = _json_lines(capsys.readouterr().out)
    stages = {o["stage"]: o for o in out}
    assert stages["retrieve"]["rows"] == 20  # 2 queries x k=10
    assert 0.0 <= stages["evaluate"]["map"] <= 1.0
    assert stages["evaluate"]["num_queries"] == 2
    # TREC run written, 6 columns, rank-ascending
    lines = open(run_out).read().splitlines()
    assert len(lines) == 20
    assert lines[0].split("\t")[1] == "Q0"


def test_pipeline_cli(spark, tmp_path, monkeypatch, capsys):
    """End-to-end hygiene pipeline CLI: dedup -> quality -> PII ->
    sample -> chunk, manifest counts monotone non-increasing through
    the filters."""
    import scripts.run_pipeline_job as rpj

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    body = (
        "This is a long enough sentence with plenty of ordinary words. "
        * 6
    )
    rows = [(i, body + f"unique token{i} mail{i}@example.com", "web")
            for i in range(20)]
    rows += [(100 + i, rows[i][1], "web") for i in range(5)]  # dupes
    spark.createDataFrame(
        rows, "doc_id long, content string, source string"
    ).write.parquet(in_dir)

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline_job.py", "--input", in_dir, "--output", out_dir,
         "--stratum-col", "source", "--rate", "web=1.0",
         "--chunk-tokens", "16", "--chunk-overlap", "4"],
    )
    rpj.main()
    out = _json_lines(capsys.readouterr().out)[-1]
    st = out["stages"]
    assert st["input"] == 25
    assert st["dedup"] == 20            # 5 exact dupes dropped
    assert st["quality"] <= st["dedup"]
    assert st["sample"] == st["quality"]  # rate 1.0 keeps all
    assert st["chunks"] >= st["sample"]
    got = spark.read.parquet(out_dir)
    assert got.count() == st["chunks"]
    assert "chunk_text" in got.columns
    # PII scrub happened before chunking
    assert got.filter(got.chunk_text.contains("@example.com")).count() == 0
    assert got.filter(got.chunk_text.contains("[PII]")).count() > 0
