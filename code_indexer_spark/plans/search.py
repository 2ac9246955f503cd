"""Read-side query plans — the reference's `cidx query` surface
(SURVEY.md §3.2) as parameterized DataFrame jobs over the chunks table.

Lifecycle parity with filesystem_vector_store.search (:2630-3117):

  query text -> deterministic query embedding (kernel.embed — the
  coalesced query-embed of :2829-2853, exact-key semantics per the
  empirical study) -> ANN candidates (accuracy profile) -> payload
  filters (operators.filters grammar) -> score threshold -> top-k ->
  snippet/context extraction.

Accuracy profiles map the reference's HNSW ef knob
(`ef {fast:20, balanced:50, high:200}`, server/services/
search_service.py:466-467) to retrieval strategies:
  - 'high'     -> exact brute-force cosine (the oracle path);
  - 'balanced' -> IVF probe (operators.similarity.ivf_topk);
  - 'fast'     -> LSH bucket match (single-bucket candidate set).
All three over-fetch 2x before filtering, like prefetch_limit
(filesystem_vector_store.py:2968-2970).

`hybrid_search` is the FTS ∥ semantic RRF merge
(server/query/semantic_query_manager.py:2592-2660, A2 in SURVEY §2.6).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.columns import snippet as snippet_expr
from ..kernel.embed import embed_text
from ..operators.filters import build_filter, detect_filter_conflicts
from ..operators.fusion import fuse_rrf
from ..operators.similarity import cosine_expr, lsh_bucket_expr


def _query_vec_lit(query_text: str):
    """Embed on the driver (one row — the 2-worker load∥embed trick of
    :2913-2927 is moot under Spark) and inline as a literal array, so
    the scoring expression stays in whole-stage codegen."""
    v = embed_text(query_text)
    return F.array(*[F.lit(float(x)) for x in v])


def semantic_search(
    chunks: DataFrame,
    query_text: str,
    k: int = 10,
    filter_spec: dict | None = None,
    accuracy: str = "high",
    score_threshold: float | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """chunks(url, chunk_index, text, embedding, vbucket, ...) ->
    (url, chunk_index, score, text) top-k for one query string."""
    if filter_spec:
        conflicts = detect_filter_conflicts(filter_spec)
        if conflicts:
            raise ValueError(f"contradictory filter: {conflicts}")

    qv = _query_vec_lit(query_text)
    cand = chunks
    if accuracy == "fast":
        # LSH multi-probe: the query's bucket plus its 8 one-bit-flip
        # neighbors (same Hamming-1 policy as operators.similarity.
        # lsh_topk) — near-boundary queries keep their recall. The probe
        # ids are driver-side literals, so the filter is a pushable isin.
        qb = int(cand.sparkSession.range(1).select(
            lsh_bucket_expr_lit(query_text).alias("qb")).collect()[0]["qb"])
        probes = [qb] + [qb ^ (1 << i) for i in range(8)]
        cand = cand.withColumn("_b", lsh_bucket_expr(vec_col)).filter(
            F.col("_b").isin(probes))
    elif accuracy == "balanced":
        # IVF-lite: restrict to the query's vbucket prefix family
        # (first 2 hex chars of the 2-bit quantization = coarse cell)
        from ..kernel.embed import bucket_of

        qb = bucket_of(embed_text(query_text))
        cand = cand.filter(F.col("vbucket").startswith(qb[:2]))
    # 'high': full scan (exact)

    scored = cand.withColumn("score", F.round(
        cosine_expr(F.col(vec_col), qv), 4))
    if score_threshold is not None:
        scored = scored.filter(F.col("score") >= score_threshold)
    if filter_spec:
        scored = scored.filter(build_filter(filter_spec))
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition
    # top-k on the map side, merge of k-row heaps on the driver — never
    # a single-partition global sort. (A row_number() window with no
    # partitionBy would funnel every scored row through ONE task; the
    # reference's prefetch_limit over-fetch is subsumed because filters
    # already ran above, so the exact top-k IS the answer.)
    return (
        scored.orderBy(F.desc("score"), F.asc("url"), F.asc("chunk_index"))
        .limit(k)
        .select("url", "chunk_index", "score", "text")
    )


def lsh_bucket_expr_lit(query_text: str):
    """LSH bucket id of the query embedding, as a literal-input expr."""
    qv = _query_vec_lit(query_text)
    from ..operators.similarity import N_PLANES, _hyperplane_weights

    weights = _hyperplane_weights(N_PLANES, 64)
    out = F.lit(0)
    for p in range(N_PLANES):
        w = F.array(*[F.lit(x) for x in weights[p]])
        proj = F.aggregate(
            F.zip_with(qv, w, lambda x, y: x * y),
            F.lit(0.0).cast("double"), lambda acc, x: acc + x)
        out = F.shiftleft(out, 1) + F.when(proj > 0, 1).otherwise(0)
    return out


def keyword_search(
    chunks: DataFrame, query_text: str, k: int = 10,
) -> DataFrame:
    """FTS analog: case-insensitive containment, ranked by term
    frequency then position (tantivy_index_manager.py:658 semantics,
    without a separate index — the scan IS the index at rest)."""
    import re

    needle = query_text.lower()
    # escape: the query is a literal term, not a regex
    tf = (F.length(F.lower("text"))
          - F.length(F.regexp_replace(F.lower("text"), re.escape(needle), ""))
          ) / max(len(needle), 1)
    return (
        chunks.filter(F.lower("text").contains(needle))
        .withColumn("score", tf.cast("double"))
        .withColumn("snippet", snippet_expr("text", query_text))
        .orderBy(F.desc("score"), F.asc("url"), F.asc("chunk_index"))
        .limit(k)
        .select("url", "chunk_index", "score", "snippet")
    )


def hybrid_search(
    chunks: DataFrame, query_text: str, k: int = 10,
) -> DataFrame:
    """FTS ∥ semantic -> RRF merge on (url, chunk_index) — A2.

    Each branch is ranked independently; fuse_rrf sums 1/(60+rank)
    per key (semantic_query_manager.py:2592-2660)."""
    sem = semantic_search(chunks, query_text, k=k).select(
        "url", "chunk_index",
        F.row_number().over(Window.orderBy(
            F.desc("score"), F.asc("url"), F.asc("chunk_index"))).alias("rank"),
    ).withColumn("provider", F.lit("semantic"))
    kw = keyword_search(chunks, query_text, k=k).select(
        "url", "chunk_index",
        F.row_number().over(Window.orderBy(
            F.desc("score"), F.asc("url"), F.asc("chunk_index"))).alias("rank"),
    ).withColumn("provider", F.lit("fts"))
    fused = fuse_rrf(sem.unionByName(kw), ["url", "chunk_index"])
    return fused.orderBy(F.desc("rrf_score"), "url", "chunk_index").limit(k)
