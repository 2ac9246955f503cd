"""E6 provider chain / failover / parallel routing (SURVEY.md §2.3).

Re-imagines the reference's query-strategy layer
(services/query_strategy.py:26-56 enums; :344-392
execute_parallel_query / execute_failover_query) over DataFrames:

- a *provider* is a zero-arg callable returning a ranked DataFrame
  (doc_id, score) — the Spark analog of one embedding/search backend;
- PRIMARY_ONLY / SPECIFIC pick one provider;
- FAILOVER runs the primary and falls back to the secondary when the
  primary RAISES (analysis error, missing table — the Spark analog of
  the reference's HTTP 5xx set, query_strategy.py:45);
- PARALLEL declares BOTH branches in one plan (a union — Spark
  schedules the branches concurrently; no ThreadPoolExecutor needed)
  and fuses with the §2.6 operators, over-fetching
  PARALLEL_FETCH_MULTIPLIER×limit per branch before the final top-k
  (query_strategy.py: PARALLEL_FETCH_MULTIPLIER=2, MAX_PARALLEL_FETCH=40).

The score-gate constants (ratio 0.80 / floor 0.70) live in
operators.fusion.score_gate — identical to query_strategy.py's
SCORE_GATE_RATIO / SCORE_GATE_FLOOR.

Network providers stay out of scope (no external services in this
engine); the chain semantics are fully exercised with deterministic
local providers in tests/test_providers.py.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.fusion import add_rank, fuse_average, fuse_multiply, fuse_rrf

PARALLEL_FETCH_MULTIPLIER = 2
MAX_PARALLEL_FETCH = 40

Provider = Callable[[], DataFrame]


def execute_primary_only(primary: Provider, limit: int = 10) -> DataFrame:
    return primary().limit(limit)


def execute_specific(providers: dict[str, Provider], name: str,
                     limit: int = 10) -> DataFrame:
    if name not in providers:
        raise KeyError(f"unknown provider: {name!r}")
    return providers[name]().limit(limit)


def execute_failover(primary: Provider, secondary: Provider,
                     limit: int = 10) -> DataFrame:
    """Primary wins; any error constructing/analyzing the primary plan
    routes to the secondary (query_strategy.py:381-392). Runtime task
    failures are Spark's own retry domain — the failover seam here is
    the provider boundary, same as the reference's per-request try."""
    try:
        df = primary()
        # force analysis so schema/table errors surface NOW, not at the
        # terminal action where the secondary can no longer be swapped in
        df.schema
        return df.limit(limit)
    except Exception:
        return secondary().limit(limit)


def execute_parallel(primary: Provider, secondary: Provider,
                     fusion: str = "rrf", limit: int = 10,
                     key_cols: list[str] | None = None) -> DataFrame:
    """Both branches in ONE declarative plan, fused (A1/A5/A6).

    Each branch is ranked independently and truncated to
    min(PARALLEL_FETCH_MULTIPLIER*limit, MAX_PARALLEL_FETCH) before the
    fusion shuffle — the reference's dual-provider over-fetch contract
    (Story #638 constants). A branch that errors at plan time degrades
    to the surviving branch (reference: logged warning + partial
    results)."""
    key_cols = key_cols or ["doc_id"]
    fetch = min(PARALLEL_FETCH_MULTIPLIER * limit, MAX_PARALLEL_FETCH)

    def branch(p: Provider, name: str) -> DataFrame | None:
        try:
            df = p()
            df.schema
        except Exception:
            return None
        ranked = add_rank(
            df.withColumn("provider", F.lit(name)),
            ["provider"], "score", key_cols[0],
        ).filter(F.col("rank") <= fetch)
        return ranked.select(*key_cols, "provider", "rank", "score")

    a = branch(primary, "primary")
    b = branch(secondary, "secondary")
    if a is None and b is None:
        raise RuntimeError("both providers failed")
    # a dead branch degrades by running the SAME fusion over the one
    # surviving branch — the output schema is identical to the healthy
    # path (rrf_score/n_providers/providers, or score_a/score_b/fused
    # with the dead side null), so consumers keep working on the exact
    # day failover triggers; fuse_rrf just sums one provider, and the
    # explicit pivot values below materialize the missing side as null
    # (fuse_multiply: 0.5; fuse_average: single-side rule)
    u = (a.unionByName(b) if a is not None and b is not None
         else (a if a is not None else b))
    if fusion == "rrf":
        fused = fuse_rrf(u.select(*key_cols, "provider", "rank"), key_cols)
        order = [F.desc("rrf_score")] + [F.asc(c) for c in key_cols]
        return fused.orderBy(*order).limit(limit)
    # multiply/average fuse on normalized scores per key: pivot the two
    # branches to (key, score_a, score_b) — same shape as §2.6
    wide = (
        u.groupBy(*key_cols)
        .pivot("provider", ["primary", "secondary"])
        .agg(F.max("score"))
        .withColumnRenamed("primary", "score_a")
        .withColumnRenamed("secondary", "score_b")
    )
    fused = (fuse_multiply(wide) if fusion == "multiply"
             else fuse_average(wide))
    order = [F.desc("fused")] + [F.asc(c) for c in key_cols]
    return fused.orderBy(*order).limit(limit)
