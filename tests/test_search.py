"""Read-side search plans (the reference's `cidx query` surface) over
the chunks table — SURVEY §3.2 lifecycle parity."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def chunks(spark, kg_small):
    from code_indexer_spark.plans.pipeline import build_chunks

    df = build_chunks(spark, kg_small).persist()
    df.count()
    yield df
    df.unpersist()


def test_semantic_search_exact_finds_query_chunk(spark, chunks):
    """Searching with a chunk's own text must return that chunk first
    (cosine(v, v) = 1)."""
    from code_indexer_spark.plans.search import semantic_search

    probe = chunks.limit(1).collect()[0]
    top = semantic_search(chunks, probe.text, k=3).collect()
    assert top[0].url == probe.url
    assert top[0].chunk_index == probe.chunk_index
    assert top[0].score >= 0.999


def test_semantic_search_profiles_agree_on_top1(spark, chunks):
    """fast/balanced candidates are subsets; when the true neighbor is
    in the bucket, top-1 matches exact."""
    from code_indexer_spark.plans.search import semantic_search

    probe = chunks.limit(1).collect()[0]
    exact = semantic_search(chunks, probe.text, k=1, accuracy="high").collect()
    fast = semantic_search(chunks, probe.text, k=1, accuracy="fast").collect()
    bal = semantic_search(chunks, probe.text, k=1, accuracy="balanced").collect()
    for res in (fast, bal):
        assert res and (res[0].url, res[0].chunk_index) == \
            (exact[0].url, exact[0].chunk_index)


def test_semantic_search_filters_and_threshold(spark, chunks):
    from code_indexer_spark.plans.search import semantic_search

    probe = chunks.limit(1).collect()[0]
    spec = {"must": [{"key": "lang", "match": {"value": "en"}}]}
    rows = semantic_search(chunks, probe.text, k=5, filter_spec=spec,
                           score_threshold=0.1).collect()
    assert rows
    langs = {r["lang"] for r in chunks.select("url", "lang").distinct()
             .join(spark.createDataFrame(
                 [(x.url,) for x in rows], ["url"]), "url").collect()}
    assert langs == {"en"}


def test_semantic_search_rejects_conflicting_filter(spark, chunks):
    from code_indexer_spark.plans.search import semantic_search

    spec = {"must": [{"key": "lang", "match": {"value": "en"}}],
            "must_not": [{"key": "lang", "match": {"value": "en"}}]}
    with pytest.raises(ValueError, match="contradictory"):
        semantic_search(chunks, "anything", filter_spec=spec)


def test_keyword_and_hybrid_search(spark, chunks):
    from code_indexer_spark.plans.search import hybrid_search, keyword_search

    kw = keyword_search(chunks, "partners", k=5).collect()
    assert kw and all(r.snippet for r in kw)
    hy = hybrid_search(chunks, "partners", k=5).collect()
    assert hy
    # hybrid keys must come from one of the branches
    kw_keys = {(r.url, r.chunk_index) for r in kw}
    assert any((r.url, r.chunk_index) in kw_keys for r in hy)


def test_keyword_search_literal_metachars(spark, chunks):
    """A query containing regex metacharacters is treated literally."""
    from code_indexer_spark.plans.search import keyword_search

    rows = keyword_search(chunks, "€100 at the café", k=5).collect()
    # fixture pages include '"Budget approx €100 at the café résumé desk."'
    assert rows and all("€100" in (r.snippet or "") for r in rows)
    # and a pure-metachar query must not blow up / match everything
    assert keyword_search(chunks, "a.*b(", k=5).count() == 0
