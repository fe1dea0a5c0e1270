"""Distributed iterative ML on DataFrames: Lloyd's k-means over the
`embeddings` table, expressed as pure relational algebra (no MLlib, no
Python UDFs — the same design stance as the hand-built MinHash/LSH in
operators/dedup.py).

Each Lloyd iteration is two relational steps:
1. ASSIGN — broadcast the k centroids against the (large) vector table;
   argmin by squared L2 distance via a per-vector window. The big side
   never shuffles: assignment is a map-side broadcast join.
2. UPDATE — per-(cluster, dimension) mean via `posexplode` + hash agg,
   then re-assemble centroid arrays with an ordered collect. One
   shuffle keyed by (cluster, dim) — k*d cells, tiny at any corpus
   scale.

So a full iteration shuffles O(k*d) bytes, not O(n*d): exactly the
topology a 1000-executor k-means needs. Determinism for the oracle:
init centroids are vec_id 0..k-1, distance folds are sequential double
ops (bit-identical to DuckDB's `list_distance` on DOUBLE[]), dimension
means ride the DECIMAL(38,12) exact-sum policy (functions/aggs.py), and
argmin ties break on cluster id. The DuckDB oracle unrolls the same two
iterations as chained CTEs (the `graph_pagerank_trade` technique).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

_K = 4


def _sqdist(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance, sequential double fold (matches DuckDB's
    list_distance accumulation order, so rankings agree bit-for-bit)."""
    diff2 = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v)


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast join + per-vector argmin."""
    cand = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "d2", _sqdist("embedding", "cemb")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cluster")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cluster")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroids: per-(cluster, dim) exact-decimal mean, re-assembled
    into ordered arrays."""
    cells = assigned.select(
        "cluster", F.posexplode("embedding").alias("pos", "v")
    ).groupBy("cluster", "pos").agg(
        (
            F.sum(F.col("v").cast("double").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    return cells.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
        ).alias("cemb")
    )


# DuckDB mirror of one iteration, parameterized by the centroid CTE name.
_ASSIGN_SQL = """
    {out} AS (
        SELECT vec_id, e, cluster FROM (
            SELECT v.vec_id, v.e, c.cluster,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_distance(v.e, c.cemb), c.cluster) AS rn
            FROM vecs v CROSS JOIN {cents} c)
        WHERE rn = 1
    )
"""
_UPDATE_SQL = """
    {out} AS (
        SELECT cluster, list(m ORDER BY pos) AS cemb FROM (
            SELECT cluster, pos,
                   CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
            FROM (SELECT cluster, unnest(e) AS v, generate_subscripts(e, 1) AS pos
                  FROM {assigned})
            GROUP BY cluster, pos)
        GROUP BY cluster
    )
"""


@query(
    "kmeans_lloyd_assignments",
    oracle=(
        """
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    cents0 AS (
        SELECT vec_id AS cluster, e AS cemb FROM vecs WHERE vec_id < 4
    ),
    """
        + _ASSIGN_SQL.format(out="assign0", cents="cents0")
        + ","
        + _UPDATE_SQL.format(out="cents1", assigned="assign0")
        + ","
        + _ASSIGN_SQL.format(out="assign1", cents="cents1")
        + """
    SELECT cluster, COUNT(*) AS n_members, MIN(vec_id) AS min_vec_id
    FROM assign1
    GROUP BY cluster
    """
    ),
)
def kmeans_lloyd_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means (k=4) over the 64-d embeddings,
    reported as per-cluster membership (count + min member id — integer
    outputs, so the oracle hash is float-free). Deterministic end to
    end; see module docstring for the scale topology."""
    vecs = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents0 = vecs.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cluster"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cemb"),
    )
    assign0 = _assign(vecs, cents0)
    cents1 = _update(assign0)
    assign1 = _assign(vecs, cents1)
    return assign1.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"), F.min("vec_id").alias("min_vec_id")
    )


@query(
    "embedding_covariance_topk",
    oracle="""
    WITH dims AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS v
        FROM embeddings),
    pairs AS (
        SELECT a.i AS dim_i, b.i AS dim_j, covar_pop(a.v, b.v) AS cov
        FROM dims a JOIN dims b
          ON a.vec_id = b.vec_id AND a.i < b.i
        GROUP BY a.i, b.i)
    SELECT CAST(dim_i - 1 AS INT) AS dim_i, CAST(dim_j - 1 AS INT) AS dim_j,
           ROUND(cov, 9) AS cov
    FROM pairs
    ORDER BY ABS(cov) DESC, dim_i ASC, dim_j ASC
    LIMIT 15
    """,
)
def embedding_covariance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 most-covarying embedding-dimension pairs via a partitioned
    Gram matrix — the treeAggregate pattern that PCA/whitening at 100 TB
    is built on.

    Each Arrow batch is reduced IN PYTHON to a single d x d partial
    (X^T X, column sums, count) with one numpy matmul — so the shuffle
    carries O(partitions * d^2) tiny rows instead of O(n * d^2): the
    per-row pair explode a pure-SQL formulation needs (and the oracle
    uses) would be 4096 cells per vector. Partials combine
    associatively in a JVM hash aggregate; covariance is then
    Sxy/n - mean_i * mean_j on d^2/2 rows. This is the one family where
    mapInPandas BEATS built-in operators, because the reduction inside
    the batch is a BLAS call."""
    import pandas as pd  # noqa: F401  (pandas ships with the pyspark env)

    e = table(spark, sf_dir, "embeddings").select("embedding")

    def gram_partials(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            g = x.T @ x
            s = x.sum(axis=0)
            n = float(len(pdf))
            d = g.shape[0]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": iu.astype("int32"),
                    "j": ju.astype("int32"),
                    "sxy": g[iu, ju],
                    "sx": s[iu],
                    "sy": s[ju],
                    "n": np.full(len(iu), n),
                }
            )

    partials = e.mapInPandas(
        gram_partials, schema="i int, j int, sxy double, sx double, sy double, n double"
    )
    tot = partials.groupBy("i", "j").agg(
        F.sum("sxy").alias("sxy"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("n").alias("n"),
    )
    cov = tot.filter(F.col("i") < F.col("j")).select(
        F.col("i").alias("dim_i"),
        F.col("j").alias("dim_j"),
        F.round(
            F.col("sxy") / F.col("n")
            - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n")),
            9,
        ).alias("cov"),
    )
    return cov.orderBy(
        F.abs(F.col("cov")).desc(), F.col("dim_i").asc(), F.col("dim_j").asc()
    ).limit(15)
