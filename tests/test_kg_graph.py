"""G1–G5/pagerank over the REAL KG edges table (VERDICT r2 item 5):
the graph operators must compose with build_edges output — salted_key
stripped back to src — not just the TPC-H co-supplier analog.

Counts are pinned on the seed-fixed sf_small fixture (1000 pages);
kernel/fixture determinism means these are stable across runs,
partitionings, and hosts."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def kg_sf_dir(kg_small) -> str:
    # queries() callables take the TESTDATA sf dir; _kg_dir maps
    # sf0.001 -> the kg_small fixture the session fixture generated
    return "/root/testdata/sf0.001"


def test_kg_graph_impact_pinned(spark, kg_sf_dir):
    import __spark_entry__ as e

    rows = e.queries()["kg_graph_impact"](spark, kg_sf_dir).collect()
    assert len(rows) == 485
    by_dist = {}
    for r in rows:
        by_dist[r.dist] = by_dist.get(r.dist, 0) + 1
    # BFS layers are disjoint (min-dist semantics) and seeds excluded
    assert set(by_dist) == {1, 2, 3}
    assert sum(by_dist.values()) == len(set(r.node for r in rows)) == 485


def test_kg_pagerank_pinned(spark, kg_sf_dir):
    import __spark_entry__ as e

    rows = e.queries()["kg_pagerank"](spark, kg_sf_dir).collect()
    assert len(rows) == 20
    # the hub entity and its per-round-rounded score are exact pins
    assert rows[0].node == "E00928"
    assert rows[0].pr == pytest.approx(13.40375469, abs=1e-8)
    # scores are returned in strictly ranked order
    prs = [r.pr for r in rows]
    assert prs == sorted(prs, reverse=True)
