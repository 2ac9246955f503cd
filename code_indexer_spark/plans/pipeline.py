"""The KG-construction pipeline: pages -> extract -> (chunks, triples)
-> canonicalize -> nodes/edges.

One declarative DataFrame job per stage; Catalyst fuses the extract +
triple UDF stages into a single pass over pages (both are narrow
mapInPandas transforms). The reference's thread-pool lifecycle
(smart_indexer.py:277-640 -> high_throughput_processor.py:262-802) is
replaced by Spark stage parallelism — SURVEY.md §3.1 mapping.

Partitioning at scale (SURVEY.md §7.1 step 7):
- pages: days(warc_ts) + bucket(url) (Iceberg spec; here the parquet
  layout is the fixture's natural row order and we repartition on read);
- chunks: vbucket (2-bit vector quantization prefix — the reference's
  own vector-space partitioning, vector_quantizer.py:129-155);
- edges: salted head-entity key — `salt = pmod(xxhash64(src_url), 16)`
  appended to the subject key so one mega-entity ("hub" aliases) cannot
  pin a whole shuffle partition; AQE skew-join handles the residual.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.canonicalize import apply_canonical, canonical_mapping
from ..operators.extract import chunk_stage, embed_stage, extract_stage
from ..operators.triples import broadcast_alias_rows, mentions_stage, triples_stage

EDGE_SALT_BUCKETS = 16


def read_pages(spark: SparkSession, kg_dir: str,
               for_udf: bool = False) -> DataFrame:
    """Read the pages table. With for_udf=True, ensure at least
    defaultParallelism input partitions for the CPU-bound Arrow-UDF
    stages. Spark's file scan already targets
    spark.sql.files.minPartitionNum = defaultParallelism splits, so the
    repartition (a shuffle of the raw html bytes) only triggers when the
    scan genuinely can't split enough — at cluster scale the table is
    partitioned by days(warc_ts)/bucket(url) and this is a no-op."""
    df = spark.read.parquet(f"{kg_dir}/pages.parquet")
    if for_udf:
        want = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < max(2, want // 2):
            df = df.repartition(want)
    return df


def read_alias(spark: SparkSession, kg_dir: str) -> DataFrame:
    return spark.read.parquet(f"{kg_dir}/alias_dict.parquet")


def read_entities(spark: SparkSession, kg_dir: str) -> DataFrame:
    return spark.read.parquet(f"{kg_dir}/entities.parquet")


def build_chunks(spark: SparkSession, kg_dir: str) -> DataFrame:
    """pages -> embedded chunks table (the reference's vector points).
    Uses the fused one-pass UDF stage; build_chunks_staged keeps the
    3-stage form for intermediate inspection."""
    from ..operators.extract import build_chunks_fused

    pages = read_pages(spark, kg_dir, for_udf=True)
    return build_chunks_fused(pages)


def build_chunks_staged(spark: SparkSession, kg_dir: str) -> DataFrame:
    pages = read_pages(spark, kg_dir, for_udf=True)
    return embed_stage(chunk_stage(extract_stage(pages)))


def build_raw_triples(spark: SparkSession, kg_dir: str,
                      pages: DataFrame | None = None) -> DataFrame:
    """html -> raw triples via the fused one-pass UDF stage (see
    operators.triples.extract_triples_fused)."""
    from ..operators.triples import extract_triples_fused

    pages = pages if pages is not None else read_pages(spark, kg_dir,
                                                       for_udf=True)
    alias_bc = broadcast_alias_rows(spark, read_alias(spark, kg_dir))
    return extract_triples_fused(pages, alias_bc)


def build_mentions(spark: SparkSession, kg_dir: str) -> DataFrame:
    """Fused one-pass path; build_mentions_staged keeps the 3-stage
    chain for intermediate inspection."""
    from ..operators.triples import mentions_fused

    alias_bc = broadcast_alias_rows(spark, read_alias(spark, kg_dir))
    pages = read_pages(spark, kg_dir, for_udf=True)
    return mentions_fused(pages, alias_bc)


def build_mentions_staged(spark: SparkSession, kg_dir: str) -> DataFrame:
    alias_bc = broadcast_alias_rows(spark, read_alias(spark, kg_dir))
    pages = read_pages(spark, kg_dir, for_udf=True)
    return mentions_stage(chunk_stage(extract_stage(pages)), alias_bc)


# (applicationId, kg_dir) -> persisted mapping DataFrame. The mapping
# is O(#entities) (tiny next to triples) and identical for every query
# in a session, so compute it once and persist — the reference's
# collection-metadata cache analog (filesystem_vector_store.py:307-426).
# applicationId (not id(spark)) so a recycled object address can never
# serve a DataFrame from a stopped session.
_MAPPING_CACHE: dict[tuple[str, str], DataFrame] = {}


def cached_canonical_mapping(spark: SparkSession, kg_dir: str) -> DataFrame:
    from ..util import cached_persist

    return cached_persist(
        _MAPPING_CACHE, (spark.sparkContext.applicationId, kg_dir),
        lambda: canonical_mapping(read_entities(spark, kg_dir)))


# chunks table, persisted once per (session, kg_dir): multi-branch
# read plans (hybrid search scans it twice) must not re-run the fused
# extract+chunk+embed UDF per branch, and repeated query invocations in
# one session must REUSE one cache entry — persisting a fresh
# build_chunks() per call would leak a new storage-memory entry (chunk
# text + embeddings) on every invocation.
_CHUNKS_CACHE: dict[tuple[str, str], DataFrame] = {}


def cached_chunks(spark: SparkSession, kg_dir: str) -> DataFrame:
    from ..util import cached_persist

    return cached_persist(
        _CHUNKS_CACHE, (spark.sparkContext.applicationId, kg_dir),
        lambda: build_chunks(spark, kg_dir))


def build_canonical_triples(spark: SparkSession, kg_dir: str,
                            pages: DataFrame | None = None) -> DataFrame:
    raw = build_raw_triples(spark, kg_dir, pages=pages)
    mapping = cached_canonical_mapping(spark, kg_dir)
    return apply_canonical(raw, mapping)


def build_nodes(triples: DataFrame, entities: DataFrame,
                mapping: DataFrame) -> DataFrame:
    """nodes(entity_id, canonical_name, entity_type, n_mentions):
    one row per canonical entity; n_mentions = triple endpoints touching
    it. Canonical metadata comes from the canonical id's own record."""
    mention_counts = (
        triples.select(F.col("subj").alias("entity_id"))
        .union(triples.select(F.col("obj").alias("entity_id")))
        .groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )
    canon_ids = mapping.select(
        F.col("canonical_id").alias("entity_id")
    ).distinct()
    return (
        canon_ids.join(entities, "entity_id", "left")
        .join(mention_counts, "entity_id", "left")
        .select(
            "entity_id", "canonical_name", "entity_type",
            F.coalesce("n_mentions", F.lit(0)).alias("n_mentions"),
        )
    )


def build_edges(triples: DataFrame) -> DataFrame:
    """edges(subj, pred, obj, n_sources, confidence, salted_key):
    aggregated multigraph with a salted subject key for head-entity skew
    (north rule). The salt spreads one hot subject over
    EDGE_SALT_BUCKETS shuffle partitions; readers strip it with
    split(salted_key, '#')[0]."""
    return (
        triples.groupBy("subj", "pred", "obj")
        .agg(
            F.countDistinct("src_url").alias("n_sources"),
            F.max("confidence").alias("confidence"),
        )
        .withColumn(
            "salted_key",
            F.concat_ws(
                "#", "subj",
                (F.pmod(F.xxhash64("pred", "obj"), F.lit(EDGE_SALT_BUCKETS))
                 ).cast("string"),
            ),
        )
    )


def run_incremental(
    spark: SparkSession,
    kg_dir: str,
    prior_triples: DataFrame,
    indexed_index: DataFrame,
) -> DataFrame:
    """U4 reconcile wired into the incremental pipeline (VERDICT r1
    item 10; ref smart_indexer.py:1323-1785): compare the indexed
    (url, h) snapshot against current page content, re-extract ONLY the
    added/changed urls, MERGE the fresh triples over the prior table
    with orphan cleanup scoped to the re-processed urls, and drop
    triples of deleted urls.

    Only the work-list pages ever enter the Arrow-UDF extract stage —
    the unchanged majority is never re-parsed (tests/test_resume.py
    proves the processed-page count equals |added| + |changed| via an
    Observation on the UDF input). At 100 TB this is the steady-state
    daily job: work list ~ the crawl delta, not the corpus.

    Orphan cleanup is scoped by the WORK LIST, not by the urls present
    in the fresh output: a changed page that now yields zero triples
    must still lose its stale rows (the reference deletes a re-indexed
    file's old points even when the new parse emits none)."""
    from ..sources.tables import reconcile_status

    pages = read_pages(spark, kg_dir, for_udf=True)
    current_index = pages.select("url", F.md5(F.col("html")).alias("h"))
    status = reconcile_status(indexed_index, current_index, ["url"])
    work = status.filter(F.col("status").isin("added", "changed")) \
        .select("url")
    work_pages = pages.join(work, "url")
    fresh = build_canonical_triples(spark, kg_dir, pages=work_pages)
    stale_scope = status.filter(
        F.col("status").isin("added", "changed", "deleted")
    ).select(F.col("url").alias("src_url"))
    kept = prior_triples.join(stale_scope, "src_url", "left_anti")
    return kept.unionByName(fresh)


def run_pipeline(spark: SparkSession, kg_dir: str, out_dir: str) -> dict:
    """Full batch run: materialize chunks, triples, nodes, edges.

    Row counts come from the Observation API (A12 metrics in SURVEY
    §2.6) attached to each write — zero extra scan jobs, the same
    mechanism that would feed lineage metrics on a cluster — instead
    of re-reading all four tables."""
    from pyspark.sql import Observation

    entities = read_entities(spark, kg_dir)
    mapping = cached_canonical_mapping(spark, kg_dir)

    raw = build_raw_triples(spark, kg_dir)
    triples = apply_canonical(raw, mapping)
    triples.persist()

    obs = {name: Observation(name) for name in
           ("triples", "nodes", "edges", "chunks")}

    def observed(df, name):
        return df.observe(obs[name], F.count(F.lit(1)).alias("n"))

    observed(triples, "triples").write.mode("overwrite").parquet(
        f"{out_dir}/triples.parquet")
    nodes = build_nodes(triples, entities, mapping)
    observed(nodes, "nodes").write.mode("overwrite").parquet(
        f"{out_dir}/nodes.parquet")
    edges = build_edges(triples)
    observed(edges.repartition(F.col("salted_key")), "edges") \
        .write.mode("overwrite").parquet(f"{out_dir}/edges.parquet")
    chunks = build_chunks(spark, kg_dir)
    # repartition on the partition column first: one file per bucket
    # instead of (tasks x buckets) tiny files — at 100 TB this is the
    # difference between 65k and millions of output files
    observed(chunks.repartition(F.col("vbucket")), "chunks") \
        .write.mode("overwrite").partitionBy("vbucket") \
        .parquet(f"{out_dir}/chunks.parquet")
    counts = {name: o.get["n"] for name, o in obs.items()}
    triples.unpersist()
    # mapping stays persisted — it is the session-scoped cache
    return counts
