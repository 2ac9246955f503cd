"""The P/R gate: Spark pipeline triples vs the plain-Python
reference-oracle over the same seed-fixed pages (north rule: P/R >= 0.95;
by shared-kernel construction it is 1.0)."""

import pyarrow.parquet as pq
import pytest

from code_indexer_spark.kernel.canon import canonical_map
from code_indexer_spark.kernel.nlp import AliasIndex, extract_triples_from_text


@pytest.fixture(scope="module")
def oracle(kg_small):
    pages = pq.read_table(f"{kg_small}/pages.parquet").to_pylist()
    aliases = pq.read_table(f"{kg_small}/alias_dict.parquet").to_pylist()
    ents = pq.read_table(f"{kg_small}/entities.parquet").to_pylist()
    idx = AliasIndex([(a["alias"], a["entity_id"], a["entity_type"],
                       a["prior"], a["canonical_name"]) for a in aliases])
    cmap = canonical_map([(e["entity_id"], e["canonical_name"],
                           e["entity_type"]) for e in ents])
    triples = set()
    for r in pages:
        for s, p, o, rid, conf in extract_triples_from_text(r["text"], idx):
            triples.add((cmap.get(s, s), p, cmap.get(o, o), r["url"]))
    return triples


def test_pipeline_matches_oracle(spark, kg_small, oracle):
    from code_indexer_spark.plans.pipeline import build_canonical_triples

    got = {(r["subj"], r["pred"], r["obj"], r["src_url"])
           for r in build_canonical_triples(spark, kg_small).collect()}
    inter = len(got & oracle)
    precision = inter / max(1, len(got))
    recall = inter / max(1, len(oracle))
    assert len(oracle) > 1000  # fixture actually yields a graph
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0  # shared-kernel exactness


def test_triples_deterministic_across_runs(spark, kg_small):
    from code_indexer_spark.plans.pipeline import build_canonical_triples

    a = sorted(r["triple_id"]
               for r in build_canonical_triples(spark, kg_small).collect())
    b = sorted(r["triple_id"]
               for r in build_canonical_triples(spark, kg_small).collect())
    assert a == b
