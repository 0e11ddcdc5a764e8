"""Similarity search over the ``embeddings`` table (vec_id, embedding:
array<float>, label).

* brute-force cosine top-k — the exactness baseline: controlled cross
  join + JVM-side higher-order dot product (``aggregate``/``zip_with``),
  rank by quantized similarity with a deterministic tie-break;
* LSH-bucketed ANN — random-hyperplane signatures from md5-derived
  pseudo-hyperplanes (deterministic, engine-portable), bucket join, then
  exact cosine only within buckets: the linear-cost scale path.

At 100 TB the brute-force variant broadcasts the (small) query set and
scans the corpus once; the LSH variant replaces the scan-per-query with
one shuffle on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TOP_K = 5
N_QUERIES = 20
LSH_PLANES = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _r6(col):
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def q_ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for the first 20 vectors (queries
    broadcast against the corpus scan)."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = (emb.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv")))
    cand = emb.select(F.col("vec_id").alias("cand_id"),
                      F.col("v").alias("cv"))
    sims = (F.broadcast(q).crossJoin(cand)
            .filter(F.col("query_id") != F.col("cand_id"))
            .select("query_id", "cand_id",
                    _r6(_cosine(F.col("qv"), F.col("cv"))).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("cand_id").asc())
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "rank", "cand_id", "cos_sim")
            .orderBy("query_id", "rank"))


ORACLE_ANN_TOPK_COSINE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         FLOOR((list_sum(list_transform(range(1, length(q.v) + 1),
                  i -> q.v[i] * c.v[i]))
                / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
                   * sqrt(list_sum(list_transform(c.v, x -> x * x)))))
               * 1000000 + 0.5) / 1000000 AS cos_sim
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
), ranked AS (
  SELECT query_id, cand_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, cand_id ASC) AS rank
  FROM sims
)
SELECT query_id, rank, cand_id, cos_sim
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _plane_sign(v, p: int):
    """Sign of <v, h_p> where hyperplane h_p's component d is an
    md5-derived pseudo-random value in [-0.5, 0.5): deterministic and
    identical in both engines."""
    prod = F.aggregate(
        F.zip_with(v, F.sequence(F.lit(0), F.size(v) - 1),
                   lambda x, d: x * (
                       F.conv(F.substring(
                           F.md5(F.concat(F.lit(f"plane{p}d"),
                                          d.cast("string"))), 1, 8),
                           16, 10).cast("double") / F.lit(float(16 ** 8))
                       - 0.5)),
        F.lit(0.0), lambda acc, x: acc + x)
    return (prod > 0).cast("int")


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 8-bit signature per vector (bucket id);
    vectors sharing a bucket are ANN candidates.  Returns per-vector
    signatures plus the bucket population (candidate-set size)."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    sig = sum((_plane_sign(F.col("v"), p) * F.lit(2 ** p)).cast("bigint")
              for p in range(LSH_PLANES)).alias("bucket")
    b = emb.select("vec_id", sig)
    w = Window.partitionBy("bucket")
    return (b.select("vec_id", "bucket",
                     F.count(F.lit(1)).over(w).alias("bucket_size"))
            .orderBy("vec_id"))


def _plane_sql(p: int) -> str:
    return (f"list_sum(list_transform(range(1, length(v) + 1), "
            f"i -> v[i] * (('0x' || substr(md5('plane{p}d' || "
            f"(i - 1)::VARCHAR), 1, 8))::BIGINT::DOUBLE / {float(16 ** 8)} "
            f"- 0.5))) > 0")


ORACLE_ANN_LSH_BUCKETS = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), sig AS (
  SELECT vec_id,
         CAST({" + ".join(f"(CASE WHEN {_plane_sql(p)} THEN {2 ** p} ELSE 0 END)"
                           for p in range(LSH_PLANES))} AS BIGINT) AS bucket
  FROM e
)
SELECT vec_id, bucket,
       COUNT(*) OVER (PARTITION BY bucket) AS bucket_size
FROM sig
ORDER BY vec_id
"""


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norms + intra-label mean cosine to centroid —
    the aggregation side of embedding analytics (posexplode + groupBy,
    no UDF)."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    dims = emb.select("label", "vec_id",
                      F.posexplode("v").alias("d", "x"))
    cent = (dims.groupBy("label", "d").agg(F.avg("x").alias("c"))
            .groupBy("label")
            .agg(_r6(F.sqrt(F.sum(F.col("c") * F.col("c"))))
                 .alias("centroid_norm"),
                 F.count(F.lit(1)).alias("n_dims")))
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return (cent.join(counts, "label")
            .select("label", "n_vecs", "n_dims", "centroid_norm")
            .orderBy("label"))


ORACLE_EMBEDDING_CENTROIDS = """
WITH dims AS (
  SELECT label, vec_id,
         unnest(range(0, len(embedding))) AS d,
         unnest(embedding)::DOUBLE AS x
  FROM embeddings
), cent AS (
  SELECT label, d, AVG(x) AS c FROM dims GROUP BY label, d
), norms AS (
  SELECT label,
         FLOOR(sqrt(SUM(c * c)) * 1000000 + 0.5) / 1000000
           AS centroid_norm,
         COUNT(*) AS n_dims
  FROM cent GROUP BY label
), counts AS (
  SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY label
)
SELECT label, n_vecs, n_dims, centroid_norm
FROM norms JOIN counts USING (label)
ORDER BY label
"""


QUERIES = {
    "ann_topk_cosine": q_ann_topk_cosine,
    "ann_lsh_buckets": q_ann_lsh_buckets,
    "embedding_centroids": q_embedding_centroids,
}

ORACLES = {
    "ann_topk_cosine": ORACLE_ANN_TOPK_COSINE,
    "ann_lsh_buckets": ORACLE_ANN_LSH_BUCKETS,
    "embedding_centroids": ORACLE_EMBEDDING_CENTROIDS,
}
