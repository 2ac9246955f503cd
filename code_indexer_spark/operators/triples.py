"""Mention detection, entity linking, and SPO triple emission stages.

The alias dictionary (~5k rows) is broadcast to executors once per job
via ``SparkContext.broadcast`` and rebuilt lazily into an AliasIndex
inside each Python worker (a plain broadcast variable — the Spark analog
of the reference keeping its payload indexes in process memory,
filesystem_vector_store.py:307-426).

Reference parity (SURVEY.md §7.0):
- mention detection <- FTS identifiers side channel
  (smart_indexer.py:1309) upgraded to longest-match dictionary scan;
- entity-link scoring <- ANN + rerank funnel
  (filesystem_vector_store.py:2968-3100, cli_search_funnel.py:52-150);
- SPO rules <- X-Ray rule-as-data evaluator
  (xray/search_engine.py:231-507);
- triple idempotency key <- content-addressed point ids
  (file_chunking_manager.py:376-387): sha2(subj|pred|obj|src_url).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, StringType, StructField, StructType,
)

TRIPLE_SCHEMA = StructType(
    [
        StructField("src_url", StringType()),
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("rule_id", StringType()),
        StructField("confidence", DoubleType()),
    ]
)

MENTION_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("chunk_index", IntegerType()),
        StructField("token_pos", IntegerType()),
        StructField("alias_norm", StringType()),
        StructField("entity_id", StringType()),
        StructField("link_score", DoubleType()),
        StructField("entity_id_candidates", ArrayType(StringType())),
    ]
)


def broadcast_alias_rows(spark: SparkSession, alias_df: DataFrame):
    """Collect + broadcast the alias dictionary (small dim, <10 MB)."""
    rows = [
        (r["alias"], r["entity_id"], r["entity_type"], float(r["prior"]),
         r["canonical_name"])
        for r in alias_df.select(
            "alias", "entity_id", "entity_type", "prior", "canonical_name"
        ).collect()
    ]
    return spark.sparkContext.broadcast(rows)


def _index_of(bc):
    """Rebuild (and memoize per worker) the AliasIndex from broadcast rows."""
    from ..kernel.nlp import AliasIndex

    cache = getattr(_index_of, "_cache", None)
    if cache is None or cache[0] is not bc:
        _index_of._cache = (bc, AliasIndex(bc.value))
    return _index_of._cache[1]


def triples_stage(extracted: DataFrame, alias_bc,
                  text_col: str = "text_extracted") -> DataFrame:
    """pages-with-text -> raw triples (pre-canonicalization).

    One Arrow batch in, zero-or-more triple rows out (mapInPandas is the
    right shape for a row-expanding UDF stage).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.nlp import extract_triples_from_text

        idx = None
        for pdf in batches:
            if idx is None:
                idx = _index_of(alias_bc)
            rows = []
            for url, text in zip(pdf["url"], pdf[text_col]):
                for s, p, o, rid, conf in extract_triples_from_text(text or "", idx):
                    rows.append((url, s, p, o, rid, conf))
            yield pd.DataFrame(
                rows, columns=["src_url", "subj", "pred", "obj", "rule_id",
                               "confidence"],
            )

    raw = extracted.select("url", text_col).mapInPandas(run, schema=TRIPLE_SCHEMA)
    return raw.withColumn(
        "triple_id",
        F.sha2(F.concat_ws("|", "subj", "pred", "obj", "src_url"), 256),
    )


def extract_triples_fused(pages: DataFrame, alias_bc) -> DataFrame:
    """Fused extract + rule-match + link stage: html -> triples in ONE
    mapInPandas pass (one Arrow round trip instead of two; the full
    extracted text never crosses the JVM/Python boundary).

    Same semantics as triples_stage(extract_stage(pages)) — both call
    the identical kernels; the fused form is the hot production path,
    the staged form keeps intermediate tables inspectable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.extract import extract_text
        from ..kernel.nlp import extract_triples_from_text

        idx = None
        for pdf in batches:
            if idx is None:
                idx = _index_of(alias_bc)
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = extract_text(html)
                for s, p, o, rid, conf in extract_triples_from_text(text, idx):
                    rows.append((url, s, p, o, rid, conf))
            yield pd.DataFrame(
                rows, columns=["src_url", "subj", "pred", "obj", "rule_id",
                               "confidence"],
            )

    raw = pages.select("url", "html").mapInPandas(run, schema=TRIPLE_SCHEMA)
    return raw.withColumn(
        "triple_id",
        F.sha2(F.concat_ws("|", "subj", "pred", "obj", "src_url"), 256),
    )


def mentions_fused(pages: DataFrame, alias_bc) -> DataFrame:
    """Fused extract + chunk + mention-detect + link: html -> mention
    rows in ONE mapInPandas pass (same kernels as
    mentions_stage(chunk_stage(extract_stage(pages))); one Arrow round
    trip instead of three — the html/extracted text never re-crosses
    the JVM/Python boundary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.chunker import chunk_text
        from ..kernel.embed import embed_text
        from ..kernel.extract import extract_text

        idx = None
        for pdf in batches:
            if idx is None:
                idx = _index_of(alias_bc)
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = extract_text(html)
                for c in chunk_text(text, 1000):
                    ments = idx.detect_mentions(c["text"])
                    if not ments:
                        continue
                    ctx = embed_text(c["text"])
                    for pos, norm, _ in ments:
                        linked = idx.link(norm, None, ctx)
                        if linked is None:
                            continue
                        eid, score, cands = linked
                        rows.append((url, int(c["chunk_index"]), pos, norm,
                                     eid, round(score, 6), cands))
            yield pd.DataFrame(
                rows, columns=["url", "chunk_index", "token_pos",
                               "alias_norm", "entity_id", "link_score",
                               "entity_id_candidates"],
            )

    return pages.select("url", "html").mapInPandas(run, schema=MENTION_SCHEMA)


def mentions_stage(chunks: DataFrame, alias_bc) -> DataFrame:
    """chunks -> mentions(url, chunk_index, token_pos, alias_norm,
    entity_id, link_score, entity_id_candidates).

    Linking context = the chunk's own embedding context (sentence-free
    variant): score each candidate by prior × (0.5 + 0.5·cos(chunk_vec,
    name_vec)) — same funnel as triples linking.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.embed import embed_text

        idx = None
        for pdf in batches:
            if idx is None:
                idx = _index_of(alias_bc)
            rows = []
            for url, ci, text in zip(pdf["url"], pdf["chunk_index"], pdf["text"]):
                ments = idx.detect_mentions(text or "")
                if not ments:
                    continue
                ctx = embed_text(text or "")
                for pos, norm, _ in ments:
                    linked = idx.link(norm, None, ctx)
                    if linked is None:
                        continue
                    eid, score, cands = linked
                    rows.append((url, int(ci), pos, norm, eid,
                                 round(score, 6), cands))
            yield pd.DataFrame(
                rows, columns=["url", "chunk_index", "token_pos",
                               "alias_norm", "entity_id", "link_score",
                               "entity_id_candidates"],
            )

    return chunks.select("url", "chunk_index", "text").mapInPandas(
        run, schema=MENTION_SCHEMA
    )
