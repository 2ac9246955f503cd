"""code_indexer_spark — PySpark-native knowledge-graph construction engine.

A from-scratch re-imagination of LightspeedDMS/code-indexer's
chunk -> embed -> index -> search flow as a Spark-first pipeline:
extract -> chunk -> embed -> mention-detect/link -> triple-emit ->
canonicalize -> materialize graph, over Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)``.

Layout:
  kernel/     plain-Python deterministic semantics (shared by fixture
              generation, the reference oracle, and the Spark UDFs —
              this is how byte-identical extraction is guaranteed)
  fixtures/   seed-fixed synthetic data generators (pages, alias dict,
              SPO rules, goldens)
  operators/  Spark DataFrame / Arrow-UDF implementations of every
              operator in SURVEY.md §2
  sources/    table readers/writers (parquet locally; Iceberg at scale)
  plans/      end-to-end pipeline orchestration + checkpoint/resume
"""

__version__ = "0.1.0"
