"""Generate committed golden parquets for the smart chunker
(VERDICT r3 item 2: turn the last ``no_oracle`` driver cell green).

The legacy smart chunker (kernel.chunker.smart_chunk_text; ref
indexing/chunker.py:21-126,773-814) is a greedy line-packing loop with
no SQL form, so its oracle cannot be an independent DuckDB
recomputation. Instead we commit its seed-fixed expected output —
computed here by the SAME plain-Python kernel that pytest pins
byte-exactly in tests/test_chunker.py, executed OUTSIDE Spark — and
``oracle_sql('chunk_smart')`` reads the parquet back. This is a golden,
not an independent recomputation: it proves the distributed Arrow-UDF
plan reproduces the pinned kernel on the driver's tables, with full
rows+schema+value-hash strength.

Each row carries ``doc_text_hash = md5(utf8(text))`` of its source
document so a single static SQL string can select the right scale's
rows: the three testdata scales reuse doc_ids with different content,
and the oracle joins goldens to the active ``documents`` view on
(doc_id, md5(text)). Within one scale rows are unique (chunk_index is
per-doc unique), so a DISTINCT guards against any cross-scale
(doc_id, text) collision double-matching.

Usage: python tools/gen_chunk_goldens.py   # rewrites data/goldens/
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from code_indexer_spark.kernel.chunker import smart_chunk_text  # noqa: E402

SCALES = ["sf0.001", "sf0.01", "sf0.1"]
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "goldens", "chunk_smart")
CHUNK_SIZE = 200  # must match q_chunk_smart in __spark_entry__.py

SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("chunk_index", pa.int32()),
    ("total_chunks", pa.int32()),
    ("size", pa.int32()),
    ("line_start", pa.int32()),
    ("line_end", pa.int32()),
    ("content_hash", pa.string()),
    ("doc_text_hash", pa.string()),
])


def golden_rows(docs_parquet: str) -> dict[str, list]:
    cols: dict[str, list] = {name: [] for name in SCHEMA.names}
    tbl = pq.read_table(docs_parquet, columns=["doc_id", "text"])
    for doc_id, text in zip(tbl.column("doc_id").to_pylist(),
                            tbl.column("text").to_pylist()):
        text = text or ""
        th = hashlib.md5(text.encode("utf-8")).hexdigest()
        for c in smart_chunk_text(text, CHUNK_SIZE):
            cols["doc_id"].append(int(doc_id))
            cols["chunk_index"].append(c["chunk_index"])
            cols["total_chunks"].append(c["total_chunks"])
            cols["size"].append(c["size"])
            cols["line_start"].append(c["line_start"])
            cols["line_end"].append(c["line_end"])
            cols["content_hash"].append(
                hashlib.sha256(c["text"].encode("utf-8")).hexdigest())
            cols["doc_text_hash"].append(th)
    return cols


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for sf in SCALES:
        src = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(src):
            print(f"skip {sf}: {src} missing")
            continue
        cols = golden_rows(src)
        out = os.path.join(OUT_DIR, f"{sf}.parquet")
        pq.write_table(pa.table(cols, schema=SCHEMA), out,
                       compression="zstd")
        print(f"{out}: {len(cols['doc_id'])} rows")


if __name__ == "__main__":
    main()
