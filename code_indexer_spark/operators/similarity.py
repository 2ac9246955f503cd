"""Similarity search over embedding columns (SURVEY.md §2.5).

- brute-force cosine top-k: exact baseline (and the correctness oracle
  for any ANN variant) — crossJoin + window top-k, the Spark form of the
  reference's "similarity = 1 - distance, sort desc, limit"
  (filesystem_vector_store.py:3008-3100);
- LSH-bucketed ANN: random-hyperplane signature buckets (the same
  Johnson-Lindenstrauss/random-projection idea as the reference's
  vector quantizer, projection_matrix_manager.py:26-57) -> join on
  bucket -> exact rescoring inside buckets. At 100 TB the crossJoin is
  infeasible; the bucket join shuffles O(n·probes) rows instead of
  O(n·q).

Hyperplanes are derived from md5 bytes of (plane, dim) — deterministic,
no stored model, reproducible on any engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, x: acc + x)


def _norm(c):
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x),
                              F.lit(0.0).cast("double"),
                              lambda acc, x: acc + x))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """(query_id, neighbor_id, rank, sim) — exact top-k by cosine;
    ties broken by neighbor id for cross-engine determinism."""
    joined = queries.withColumn("_qn", _norm(F.col(qvec_col))).crossJoin(
        emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("_v"),
                   _norm(F.col(vec_col)).alias("_vn"))
    ).withColumn(
        "sim",
        F.round(_dot(F.col(qvec_col), F.col("_v"))
                / (F.col("_qn") * F.col("_vn")), 4),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "neighbor_id", "rank", "sim")
    )


N_PLANES = 8


def _hyperplane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """±1 weight per (plane, dim): parity of the first hex digit's value
    of md5('<plane>|<dim>') — deterministic and reproducible anywhere
    (SQL form: ('0x'||substr(md5(p||'|'||d),1,1))::int % 2)."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16) % 2
            else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket_expr(vec_col: str, n_planes: int = N_PLANES, dim: int = 64):
    """Bucket id = sign-pattern of n_planes ±1 random hyperplanes.

    Weights are literal arrays (computed driver-side with the same md5
    rule), so the plan is one zip_with/aggregate per plane instead of a
    512-node element_at tree."""
    weights = _hyperplane_weights(n_planes, dim)
    out = F.lit(0)
    for p in range(n_planes):
        w = F.array(*[F.lit(x) for x in weights[p]])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), w, lambda x, y: x * y),
            F.lit(0.0).cast("double"), lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1)).otherwise(F.lit(0))
        out = F.shiftleft(out, 1) + bit
    return out


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: deterministic coarse quantizer + inverted lists.

    Scale path beyond LSH: assign every vector to its nearest centroid
    (broadcast centroid table, JVM-side dot products), then probe only
    the n_probe nearest lists per query — the scan shrinks by
    ~n_centroids/n_probe. Centroids are a deterministic id-stratified
    sample (every (n/n_centroids)-th row by id rank), so the index is
    reproducible with no iterative training job; at 100 TB the same
    plan holds with KMeans-refined centroids swapped in.

    Returns (query_id, neighbor_id, rank, sim) — approximate: recall
    depends on n_probe/n_centroids (rows-only check, like ann_lsh).
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.orderBy(id_col)
    ranked = emb.select(F.col(id_col), F.col(vec_col),
                        F.row_number().over(w).alias("_rn"))
    n = ranked.count()
    stride = max(n // n_centroids, 1)
    centroids = (
        ranked.filter((F.col("_rn") - 1) % stride == 0)
        .limit(n_centroids)
        .select(F.col("_rn").alias("centroid_id"),
                F.col(vec_col).alias("centroid_vec"))
    )

    def nearest(df, key, vcol, top):
        j = df.crossJoin(F.broadcast(centroids)).withColumn(
            "_sim", cosine_expr(F.col(vcol), F.col("centroid_vec")))
        ww = Window.partitionBy(key).orderBy(
            F.desc("_sim"), F.asc("centroid_id"))
        return (
            j.withColumn("_cr", F.row_number().over(ww))
            .filter(F.col("_cr") <= top)
            .select(df.columns + [F.col("centroid_id").alias("list_id")])
        )

    assigned = nearest(emb.select(id_col, vec_col), id_col, vec_col, 1)
    probed = nearest(queries.select("query_id", "query_vec"),
                     "query_id", "query_vec", n_probe)

    cand = probed.join(assigned, "list_id")
    sim = cosine_expr(F.col("query_vec"), F.col(vec_col))
    wk = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        cand.withColumn("sim", F.round(sim, 4))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "sim")
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
    n_planes: int = N_PLANES,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share the hyperplane bucket, then
    exact cosine rescoring + window top-k inside the bucket."""
    e = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("_v"),
                   _norm(F.col(vec_col)).alias("_vn"),
                   lsh_bucket_expr(vec_col, n_planes, dim).alias("bucket"))
    q = queries.withColumn("bucket", lsh_bucket_expr(qvec_col, n_planes, dim)) \
               .withColumn("_qn", _norm(F.col(qvec_col)))
    joined = q.join(e, "bucket").withColumn(
        "sim",
        F.round(_dot(F.col(qvec_col), F.col("_v"))
                / (F.col("_qn") * F.col("_vn")), 4),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "neighbor_id", "rank", "sim")
    )
