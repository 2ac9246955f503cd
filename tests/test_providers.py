"""E6 provider chain/failover/parallel routing (query_strategy.py
semantics) with deterministic local providers."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, float(100 - i), float((i * 37) % 50)) for i in range(30)],
        ["doc_id", "sa", "sb"])


def _p(docs, col):
    return lambda: docs.select("doc_id", F.col(col).alias("score"))


def _boom():
    raise RuntimeError("provider down")


def test_primary_only_and_specific(spark, docs):
    from code_indexer_spark.plans.providers import (
        execute_primary_only, execute_specific)

    got = execute_primary_only(_p(docs, "sa"), limit=5).collect()
    assert len(got) == 5
    got2 = execute_specific({"a": _p(docs, "sa"), "b": _p(docs, "sb")},
                            "b", limit=3).collect()
    assert len(got2) == 3
    with pytest.raises(KeyError):
        execute_specific({"a": _p(docs, "sa")}, "zzz")


def test_failover_routes_on_error(spark, docs):
    from code_indexer_spark.plans.providers import execute_failover

    # healthy primary: secondary never used
    got = {r.doc_id for r in execute_failover(
        _p(docs, "sa"), _boom, limit=3).collect()}
    assert len(got) == 3
    # broken primary: secondary serves
    got2 = execute_failover(_boom, _p(docs, "sb"), limit=4).collect()
    assert len(got2) == 4


def test_parallel_fuses_and_degrades(spark, docs):
    from code_indexer_spark.plans.providers import execute_parallel

    fused = execute_parallel(_p(docs, "sa"), _p(docs, "sb"),
                             fusion="rrf", limit=10).collect()
    assert len(fused) == 10
    # a doc ranked top by BOTH providers outranks single-provider docs:
    # doc 0 is rank 1 for sa; compute expected RRF winner by hand
    rrf = {}
    sa = sorted(range(30), key=lambda i: (-(100 - i), i))
    sb = sorted(range(30), key=lambda i: (-((i * 37) % 50), i))
    for rank, i in enumerate(sa[:20], 1):
        rrf[i] = rrf.get(i, 0) + 1 / (60 + rank)
    for rank, i in enumerate(sb[:20], 1):
        rrf[i] = rrf.get(i, 0) + 1 / (60 + rank)
    want_top = max(sorted(rrf), key=lambda i: (round(rrf[i], 6), -i))
    assert fused[0].doc_id == want_top

    # one dead branch -> surviving branch's top-k (partial results)
    alive = execute_parallel(_p(docs, "sa"), _boom, limit=5).collect()
    assert [r.doc_id for r in alive] == [0, 1, 2, 3, 4]
    with pytest.raises(RuntimeError):
        execute_parallel(_boom, _boom, limit=5)


def test_parallel_multiply_average(spark, docs):
    from code_indexer_spark.plans.providers import execute_parallel

    for fusion in ("multiply", "average"):
        got = execute_parallel(_p(docs, "sa"), _p(docs, "sb"),
                               fusion=fusion, limit=7).collect()
        assert len(got) == 7
        vals = [r.fused for r in got]
        assert vals == sorted(vals, reverse=True)


def test_parallel_degraded_schema_matches_healthy(spark, docs):
    """The day failover actually triggers, consumers must keep working:
    the degraded single-branch result carries the SAME columns as the
    healthy fused result, for every fusion mode."""
    from code_indexer_spark.plans.providers import execute_parallel

    for mode in ("rrf", "multiply", "average"):
        healthy = execute_parallel(_p(docs, "sa"), _p(docs, "sb"),
                                   fusion=mode, limit=5)
        degraded = execute_parallel(_p(docs, "sa"), _boom,
                                    fusion=mode, limit=5)
        assert degraded.columns == healthy.columns, mode
        assert degraded.count() == 5, mode
