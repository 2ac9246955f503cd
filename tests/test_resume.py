"""Exact resume: kill mid-job -> resume -> byte-identical output
(north rule checkpoint requirement; progressive_metadata.py analog)."""

import json
import os

import pytest


def _table_hash(spark, path: str) -> tuple[int, str]:
    import pyspark.sql.functions as F

    df = spark.read.parquet(path).select("triple_id", "subj", "pred", "obj",
                                         "src_url", "rule_id")
    n = df.count()
    h = df.agg(F.coalesce(F.expr(
        "bit_xor(xxhash64(triple_id, subj, pred, obj, src_url, rule_id))"
    ), F.lit(0))).collect()[0][0]
    return n, str(h)


def test_kill_resume_identical(spark, kg_small, tmp_path):
    from code_indexer_spark.plans.checkpoint import (
        load_done, run_triples_checkpointed)

    full_dir = str(tmp_path / "full")
    run_triples_checkpointed(spark, kg_small, full_dir, partitions=6)
    expect = _table_hash(spark, os.path.join(full_dir, "triples"))

    # crash after 2 slices...
    crash_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_triples_checkpointed(spark, kg_small, crash_dir, partitions=6,
                                 fail_after=2)
    assert len(load_done(crash_dir, "triples")) == 2

    # ...resume completes only the remaining slices
    run_triples_checkpointed(spark, kg_small, crash_dir, partitions=6)
    done = load_done(crash_dir, "triples")
    assert done == set(range(6))
    got = _table_hash(spark, os.path.join(crash_dir, "triples"))
    assert got == expect  # value-identical output after kill+resume


def test_checkpoint_rows_have_lineage(spark, kg_small, tmp_path):
    from code_indexer_spark.plans.checkpoint import run_triples_checkpointed

    out = str(tmp_path / "ck")
    run_triples_checkpointed(spark, kg_small, out, partitions=4)
    rows = [json.loads(line)
            for line in open(os.path.join(out, "checkpoints.jsonl"))]
    assert len(rows) == 4
    for r in rows:
        assert r["status"] == "done"
        assert r["rows_in"] > 0 and r["rows_out"] >= 0
        assert r["wall_ms"] >= 0 and r["input_fingerprint"]
    # slices partition the input exactly
    n_pages = spark.read.parquet(f"{kg_small}/pages.parquet").count()
    assert sum(r["rows_in"] for r in rows) == n_pages
