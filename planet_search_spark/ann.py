"""Similarity search over the ``embeddings`` table (array<float> column).

* ``ann_cosine_topk``  — brute-force exact cosine top-k (the baseline).
* ``ann_ivf_assign``   — IVF-style bucketing: assign every vector to its
  nearest of C deterministic centroids (the first C vectors by vec_id).
* ``ann_ivf_topk``     — the scale path: search only the query's bucket.

All dot products are explicit element-wise double folds (Spark
``zip_with``/``aggregate``; DuckDB zipped ``unnest`` + sum) and every float
output is floor-quantized, so the DuckDB oracle is exact.

At 100 TB these become: centroids as a broadcast table, bucket assignment as
a map-side broadcast join + argmin (one narrow pass), and queries prune to
one bucket partition — the plumbing here is exactly that plan at small scale.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import scoring as S
from .queries.logical import _register
from .queries.logical import with_global_rank as _with_rank

N_CENTROIDS = 8
QUERY_VEC_ID = 0


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


_SQL_COSINE = """
(SELECT sum(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE))
 FROM (SELECT unnest({a}) AS xa, unnest({b}) AS xb))
/ (sqrt((SELECT sum(CAST(xa AS DOUBLE) * CAST(xa AS DOUBLE))
         FROM (SELECT unnest({a}) AS xa)))
   * sqrt((SELECT sum(CAST(xb AS DOUBLE) * CAST(xb AS DOUBLE))
           FROM (SELECT unnest({b}) AS xb))))
"""


@_register("ann_cosine_topk", f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
sims AS (
  SELECT e.vec_id,
         {S.SQL_QUANTIZE.format(x=_SQL_COSINE.format(a='e.embedding', b='q.qv'))} AS sim_q
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> {QUERY_VEC_ID}
)
SELECT CAST(row_number() OVER (ORDER BY sim_q DESC, vec_id) AS INT) AS rank,
       vec_id, sim_q
FROM sims ORDER BY sim_q DESC, vec_id LIMIT 10
""")
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID) \
           .select(F.col("embedding").alias("qv"))
    sims = (emb.where(F.col("vec_id") != QUERY_VEC_ID)
            .crossJoin(F.broadcast(q))
            .select("vec_id",
                    S.quantize(cosine(F.col("embedding"), F.col("qv")))
                     .alias("sim_q")))
    top = sims.orderBy(F.desc("sim_q"), "vec_id").limit(10)
    return _with_rank(top, F.desc("sim_q"), "vec_id") \
        .select("rank", "vec_id", "sim_q")


_SQL_ASSIGN = f"""
cents AS (
  SELECT vec_id AS centroid_id, embedding AS cv
  FROM embeddings WHERE vec_id < {N_CENTROIDS}
),
scored AS (
  SELECT e.vec_id, c.centroid_id,
         {S.SQL_QUANTIZE.format(x=_SQL_COSINE.format(a='e.embedding', b='c.cv'))} AS sim_q
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, centroid_id, sim_q,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim_q DESC, centroid_id) AS rn
  FROM scored
)
"""


@_register("ann_ivf_assign", f"""
WITH {_SQL_ASSIGN.strip()}
SELECT vec_id, CAST(centroid_id AS BIGINT) AS centroid_id
FROM assign WHERE rn = 1
""")
def q_ann_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_assignments(spark, sf_dir).select(
        "vec_id", F.col("centroid_id").cast("long").alias("centroid_id"))


def _ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, centroid_id, embedding) — argmax-cosine bucket assignment.

    Quantized similarity for the argmax so the tie-break (centroid_id asc)
    is cross-engine deterministic.
    """
    from pyspark.sql.window import Window
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = emb.where(F.col("vec_id") < N_CENTROIDS) \
               .select(F.col("vec_id").alias("centroid_id"),
                       F.col("embedding").alias("cv"))
    scored = (emb.crossJoin(F.broadcast(cents))
              .select("vec_id", "embedding", "centroid_id",
                      S.quantize(cosine(F.col("embedding"), F.col("cv")))
                       .alias("sim_q")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim_q"), "centroid_id")
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "centroid_id", "embedding"))


@_register("ann_ivf_topk", f"""
WITH {_SQL_ASSIGN.strip()},
buckets AS (
  SELECT a.vec_id, a.centroid_id, e.embedding
  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
  WHERE a.rn = 1
),
qb AS (SELECT centroid_id, embedding AS qv FROM buckets WHERE vec_id = {QUERY_VEC_ID}),
sims AS (
  SELECT b.vec_id,
         {S.SQL_QUANTIZE.format(x=_SQL_COSINE.format(a='b.embedding', b='qb.qv'))} AS sim_q
  FROM buckets b JOIN qb ON b.centroid_id = qb.centroid_id
  WHERE b.vec_id <> {QUERY_VEC_ID}
)
SELECT CAST(row_number() OVER (ORDER BY sim_q DESC, vec_id) AS INT) AS rank,
       vec_id, sim_q
FROM sims ORDER BY sim_q DESC, vec_id LIMIT 5
""")
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    assigned = _ivf_assignments(spark, sf_dir)
    qb = assigned.where(F.col("vec_id") == QUERY_VEC_ID) \
                 .select("centroid_id", F.col("embedding").alias("qv"))
    sims = (assigned.join(F.broadcast(qb), "centroid_id")
            .where(F.col("vec_id") != QUERY_VEC_ID)
            .select("vec_id",
                    S.quantize(cosine(F.col("embedding"), F.col("qv")))
                     .alias("sim_q")))
    top = sims.orderBy(F.desc("sim_q"), "vec_id").limit(5)
    return _with_rank(top, F.desc("sim_q"), "vec_id") \
        .select("rank", "vec_id", "sim_q")


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection (IVF-bucket blocking)
# ---------------------------------------------------------------------------

NEARDUP_TAU = 0.35


@_register("embedding_neardup", f"""
WITH {_SQL_ASSIGN.strip()},
buckets AS (
  SELECT a.vec_id, a.centroid_id, e.embedding
  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
  WHERE a.rn = 1
),
cand AS (
  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         {S.SQL_QUANTIZE.format(x=_SQL_COSINE.format(a='x.embedding', b='y.embedding'))} AS sim_q
  FROM buckets x JOIN buckets y
    ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
)
SELECT vec_a, vec_b, sim_q FROM cand
WHERE sim_q >= {int(NEARDUP_TAU * 10000)}
""")
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vectors: IVF bucket assignment as the blocking step
    (same-bucket pairs only — the candidate-generation pattern that scales:
    at 100 TB the cross join never happens, only per-bucket self-joins),
    then exact quantized cosine >= tau."""
    assigned = _ivf_assignments(spark, sf_dir)
    x, y = assigned.alias("x"), assigned.alias("y")
    pairs = (x.join(y, (F.col("x.centroid_id") == F.col("y.centroid_id"))
                    & (F.col("x.vec_id") < F.col("y.vec_id")))
             .select(F.col("x.vec_id").alias("vec_a"),
                     F.col("y.vec_id").alias("vec_b"),
                     S.quantize(cosine(F.col("x.embedding"),
                                       F.col("y.embedding"))).alias("sim_q")))
    return pairs.where(F.col("sim_q") >= int(NEARDUP_TAU * 10000))


# ---------------------------------------------------------------------------
# Multi-probe IVF: search the query's nprobe nearest buckets
# ---------------------------------------------------------------------------
# Single-probe recall is bounded by how often the true neighbors share the
# query's bucket; probing the next-nearest centroids is the standard
# recall/cost dial (FAISS nprobe). At 100 TB: still only nprobe bucket
# partitions are scanned.

N_PROBE = 2


@_register("ann_ivf_topk_probe2", f"""
WITH {_SQL_ASSIGN.strip()},
buckets AS (
  SELECT a.vec_id, a.centroid_id, e.embedding
  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
  WHERE a.rn = 1
),
qp AS (
  SELECT centroid_id,
         row_number() OVER (ORDER BY sim_q DESC, centroid_id) AS prn
  FROM scored WHERE vec_id = {QUERY_VEC_ID}
),
probes AS (SELECT centroid_id FROM qp WHERE prn <= {N_PROBE}),
qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
sims AS (
  SELECT b.vec_id,
         {S.SQL_QUANTIZE.format(x=_SQL_COSINE.format(a='b.embedding', b='qv.qv'))} AS sim_q
  FROM buckets b JOIN probes p ON b.centroid_id = p.centroid_id
  CROSS JOIN qv
  WHERE b.vec_id <> {QUERY_VEC_ID}
)
SELECT CAST(row_number() OVER (ORDER BY sim_q DESC, vec_id) AS INT) AS rank,
       vec_id, sim_q
FROM sims ORDER BY sim_q DESC, vec_id LIMIT 5
""")
def q_ann_ivf_topk_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = emb.where(F.col("vec_id") < N_CENTROIDS) \
               .select(F.col("vec_id").alias("centroid_id"),
                       F.col("embedding").alias("cv"))
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID) \
           .select(F.col("embedding").alias("qv"))
    probes = (q.crossJoin(F.broadcast(cents))
              .select("centroid_id",
                      S.quantize(cosine(F.col("qv"), F.col("cv")))
                       .alias("sim_q"))
              .orderBy(F.desc("sim_q"), "centroid_id").limit(N_PROBE)
              .select("centroid_id"))
    assigned = _ivf_assignments(spark, sf_dir)
    sims = (assigned.join(F.broadcast(probes), "centroid_id")
            .where(F.col("vec_id") != QUERY_VEC_ID)
            .crossJoin(F.broadcast(q))
            .select("vec_id",
                    S.quantize(cosine(F.col("embedding"), F.col("qv")))
                     .alias("sim_q")))
    top = sims.orderBy(F.desc("sim_q"), "vec_id").limit(5)
    return _with_rank(top, F.desc("sim_q"), "vec_id") \
        .select("rank", "vec_id", "sim_q")


# ---------------------------------------------------------------------------
# One deterministic Lloyd (k-means) refinement of the IVF centroids
# ---------------------------------------------------------------------------
# Seed centroids ("first C vectors") are arbitrary; one Lloyd round — new
# centroid = per-dimension MEAN of its assigned vectors, then reassign —
# is the standard quality step. The per-dim means are floor-quantized at
# 1e-4 in BOTH engines before reuse, so summation-order float differences
# cannot desynchronize the oracle. At 100 TB: each round is one narrow
# posexplode + groupBy(centroid, dim) avg (C*D rows out) + broadcast rescan.

@_register("ann_kmeans_refine", f"""
WITH {_SQL_ASSIGN.strip()},
a1 AS (SELECT vec_id, centroid_id FROM assign WHERE rn = 1),
dims AS (
  SELECT a1.centroid_id,
         unnest(range(0, len(e.embedding))) AS dim,
         CAST(unnest(e.embedding) AS DOUBLE) AS x
  FROM a1 JOIN embeddings e ON e.vec_id = a1.vec_id
),
newc AS (
  SELECT centroid_id, dim, floor(avg(x) * 10000.0) / 10000.0 AS cx
  FROM dims GROUP BY centroid_id, dim
),
cvecs AS (
  SELECT centroid_id, list(cx ORDER BY dim) AS cv
  FROM newc GROUP BY centroid_id
),
rescored AS (
  SELECT e.vec_id, c.centroid_id,
         {S.SQL_QUANTIZE.format(x=_SQL_COSINE.format(a='e.embedding', b='c.cv'))} AS sim_q
  FROM embeddings e CROSS JOIN cvecs c
),
re2 AS (
  SELECT vec_id, centroid_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim_q DESC, centroid_id) AS rn
  FROM rescored
)
SELECT vec_id, CAST(centroid_id AS BIGINT) AS centroid_id
FROM re2 WHERE rn = 1
""")
def q_ann_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a1 = _ivf_assignments(spark, sf_dir)
    dims = a1.select("centroid_id",
                     F.posexplode("embedding").alias("dim", "x"))
    newc = (dims.groupBy("centroid_id", "dim")
            .agg((F.floor(F.avg(F.col("x").cast("double")) * 10000.0)
                  / 10000.0).alias("cx")))
    cvecs = (newc.groupBy("centroid_id")
             .agg(F.transform(
                 F.sort_array(F.collect_list(F.struct("dim", "cx"))),
                 lambda s: s["cx"]).alias("cv")))
    rescored = (emb.crossJoin(F.broadcast(cvecs))
                .select("vec_id", "centroid_id",
                        S.quantize(cosine(F.col("embedding"), F.col("cv")))
                         .alias("sim_q")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim_q"), "centroid_id")
    return (rescored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", F.col("centroid_id").cast("long")
                    .alias("centroid_id")))
