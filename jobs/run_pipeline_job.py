"""spark-submit entry point for the full KG-construction pipeline.

The north rule's deployment shape: the same job runs unchanged on a
multi-executor cluster at N and 4N executors —

    zip -r dist/code_indexer_spark.zip code_indexer_spark
    spark-submit --master <cluster> \
        --py-files dist/code_indexer_spark.zip \
        jobs/run_pipeline_job.py --kg-dir <pages table> --out-dir <out>

In-sandbox the master is local[N]; on a real cluster only --master and
the executor count change (partitioning already targets tasks >> slots,
session.py). Writes triples/nodes/edges/chunks tables and prints one
JSON line of row counts + wall seconds.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kg-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--checkpointed", action="store_true",
                    help="slice-by-slice with exact-resume checkpoints")
    args = ap.parse_args()

    # import AFTER spark-submit has placed --py-files on sys.path
    from pyspark.sql import SparkSession

    from code_indexer_spark.plans.checkpoint import run_triples_checkpointed
    from code_indexer_spark.plans.pipeline import run_pipeline
    from code_indexer_spark.session import engine_conf

    b = SparkSession.builder.appName("kg-pipeline")
    for k, v in engine_conf().items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # driver-side fail-fast (same check session.get_spark runs): a
    # numpy reduction-order drift must abort BEFORE reading 100 TB,
    # not minutes later inside the first executor UDF batch
    from code_indexer_spark.kernel.embed import assert_embed_golden

    assert_embed_golden()
    t0 = time.monotonic()
    if args.checkpointed:
        out = run_triples_checkpointed(spark, args.kg_dir, args.out_dir)
        counts = {"triples": spark.read.parquet(out).count()}
    else:
        counts = run_pipeline(spark, args.kg_dir, args.out_dir)
    print(json.dumps({"counts": counts,
                      "wall_sec": round(time.monotonic() - t0, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
