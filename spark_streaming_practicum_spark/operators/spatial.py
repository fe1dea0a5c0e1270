"""Spatial pack: grid-partitioned geo operators.

The testdata carries no coordinates, so points are DERIVED
deterministically from integer keys (integer mod + exact double ops —
bit-identical in Spark and DuckDB), which keeps the whole pack
hash-oracle-able. The operators themselves are the real thing:

- `geo_grid_cell_counts`: point -> 1°x1° grid-cell heatmap. The cell id
  is a plain group-by key, so the aggregation partitions/merges like
  any hash agg at 100 TB.
- `geo_grid_knn_join`: nearest-supplier-per-customer via the standard
  distributed spatial-join topology — replicate one side into the 3x3
  neighborhood of its grid cell, equi-join on cell, rank candidates
  per probe point. This turns an O(N*M) cross join into a key-equi
  join whose fan-out is bounded by cell density (the same
  partition-bounding idea as the LSH band join in operators/dedup.py).
  Distance is squared equirectangular (pure arithmetic, no libm trig)
  so candidate ranking is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from ..functions.aggs import dsum, dsum_sql

# key -> synthetic (lat, lon): integer mod spreads points over the
# globe; /100.0 is the same IEEE double op in both engines.
_LAT = "((({k} * 37) % 18000) / CAST(100.0 AS DOUBLE) - 90.0)"  # parens: survive embedding in FLOOR(x/10.0); CAST: Spark parses bare 100.0 as DECIMAL, DuckDB as DOUBLE
_LON = "((({k} * 91) % 36000) / CAST(100.0 AS DOUBLE) - 180.0)"


def _latlon(df: DataFrame, key: str) -> DataFrame:
    return df.withColumn("lat", F.expr(_LAT.format(k=key))).withColumn(
        "lon", F.expr(_LON.format(k=key))
    )


@query(
    "geo_grid_cell_counts",
    oracle=f"""
    WITH pts AS (
        SELECT CAST(FLOOR({_LAT.format(k="user_id")} / 10.0) AS BIGINT) AS cell_lat,
               CAST(FLOOR({_LON.format(k="user_id")} / 10.0) AS BIGINT) AS cell_lon,
               value
        FROM events
    )
    SELECT cell_lat, cell_lon,
           COUNT(*) AS n_events,
           {dsum_sql("value")} AS total_value
    FROM pts
    GROUP BY cell_lat, cell_lon
    """,
)
def geo_grid_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial heatmap: bucket points into 10°x10° grid cells and
    aggregate. The cell id is an ordinary group-by key — two-phase hash
    agg, no spatial index needed; at 100 TB the cell doubles as a
    write-time partition key so dashboards prune to the viewport."""
    e = _latlon(table(spark, sf_dir, "events"), "user_id")
    return (
        e.select(
            F.floor(F.col("lat") / 10.0).alias("cell_lat"),
            F.floor(F.col("lon") / 10.0).alias("cell_lon"),
            "value",
        )
        .groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


@query(
    "geo_grid_knn_join",
    oracle=f"""
    WITH cust AS (
        SELECT c_custkey,
               {_LAT.format(k="c_custkey")} AS lat,
               {_LON.format(k="c_custkey")} AS lon
        FROM customer
    ),
    supp AS (
        SELECT s_suppkey,
               {_LAT.format(k="s_suppkey")} AS lat,
               {_LON.format(k="s_suppkey")} AS lon
        FROM supplier
    ),
    cand AS (
        SELECT c.c_custkey, s.s_suppkey,
               (c.lat - s.lat) * (c.lat - s.lat)
             + (c.lon - s.lon) * (c.lon - s.lon) AS dist2
        FROM cust c
        JOIN supp s
          ON ABS(CAST(FLOOR(c.lat / 10.0) AS BIGINT) - CAST(FLOOR(s.lat / 10.0) AS BIGINT)) <= 1
         AND ABS(CAST(FLOOR(c.lon / 10.0) AS BIGINT) - CAST(FLOOR(s.lon / 10.0) AS BIGINT)) <= 1
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey, dist2
    FROM cand
    QUALIFY ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY dist2, s_suppkey) = 1
    """,
)
def geo_grid_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed spatial nearest-neighbor join: suppliers are
    replicated into the 3x3 neighborhood of their 10° grid cell (a
    bounded 9x blow-up of the SMALL side), the join is a plain equi-join
    on cell id, and a per-customer window keeps the closest candidate.
    Semantics: nearest supplier within the surrounding 3x3 cells
    (customers in supplier-free neighborhoods drop out — the contract a
    bounded-radius spatial join advertises). The oracle states the same
    neighborhood predicate non-equi-joined; Spark's plan is the scalable
    one — cell-id hash join, never a cross product."""
    cust = _latlon(
        table(spark, sf_dir, "customer").select("c_custkey"), "c_custkey"
    ).select(
        "c_custkey",
        "lat",
        "lon",
        F.floor(F.col("lat") / 10.0).alias("cell_lat"),
        F.floor(F.col("lon") / 10.0).alias("cell_lon"),
    )
    supp = _latlon(
        table(spark, sf_dir, "supplier").select("s_suppkey"), "s_suppkey"
    ).select(
        F.col("s_suppkey"),
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
        F.floor(F.col("lat") / 10.0).alias("s_cell_lat"),
        F.floor(F.col("lon") / 10.0).alias("s_cell_lon"),
    )
    # Replicate the small side into its 3x3 neighborhood -> equi-join key.
    supp9 = (
        supp.withColumn("dlat", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("dlon", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .select(
            "s_suppkey",
            "s_lat",
            "s_lon",
            (F.col("s_cell_lat") + F.col("dlat")).alias("cell_lat"),
            (F.col("s_cell_lon") + F.col("dlon")).alias("cell_lon"),
        )
    )
    cand = cust.join(F.broadcast(supp9), ["cell_lat", "cell_lon"]).select(
        "c_custkey",
        "s_suppkey",
        (
            (F.col("lat") - F.col("s_lat")) * (F.col("lat") - F.col("s_lat"))
            + (F.col("lon") - F.col("s_lon")) * (F.col("lon") - F.col("s_lon"))
        ).alias("dist2"),
    )
    w = Window.partitionBy("c_custkey").orderBy("dist2", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", F.col("s_suppkey").alias("nearest_suppkey"), "dist2")
    )


@query(
    "geo_trajectory_stats",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, ts, event_id,
               {_LAT.format(k="event_id")} AS lat,
               {_LON.format(k="event_id")} AS lon
        FROM events WHERE user_id % 17 = 0),
    hops AS (
        SELECT user_id,
               SQRT(POWER(lat - LAG(lat) OVER w, 2)
                    + POWER(lon - LAG(lon) OVER w, 2)) AS hop
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id,
           COUNT(*) AS n_points,
           CAST(COUNT(hop) AS BIGINT) AS n_moves,
           CAST(ROUND(SUM(CAST(hop AS DECIMAL(38,12))), 6) AS DOUBLE)
               AS path_length,
           ROUND(MAX(hop), 6) AS max_hop
    FROM hops GROUP BY user_id
    """,
)
def geo_trajectory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity trajectory statistics: order each user's points by
    time, measure consecutive-hop distances with one LAG window, and
    roll up path length / longest hop — the movement-analytics shape
    (GPS tracks, delivery routes) on the synthetic coordinate scheme.

    One shuffle on user_id shared by the window and the rollup; hop
    lengths accumulate in DECIMAL so the per-user sum is
    order-independent. Planar distance on the derived coordinates
    keeps it trig-free and bit-identical across engines."""
    pts = _latlon(
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 17 == 0)
        .select("user_id", "ts", "event_id"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hop = F.sqrt(
        F.pow(F.col("lat") - F.lag("lat").over(w), 2)
        + F.pow(F.col("lon") - F.lag("lon").over(w), 2)
    )
    hops = pts.select("user_id", hop.alias("hop"))
    return hops.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.count("hop").alias("n_moves"),
        F.round(F.sum(F.col("hop").cast("decimal(38,12)")), 6)
        .cast("double")
        .alias("path_length"),
        F.round(F.max("hop"), 6).alias("max_hop"),
    )


# --- point-in-polygon (ray casting) ------------------------------------------

# Fixed test polygon (lat, lon) — a convex-ish pentagon; the vertex list
# drives BOTH the Spark expression and the SQL oracle, so the crossing
# arithmetic is the identical IEEE expression tree in each engine.
_POLY = [(-60.0, -120.0), (0.0, -150.0), (60.0, -60.0), (20.0, 30.0), (-40.0, 0.0)]


def _crossings_sql(lat: str, lon: str) -> str:
    terms = []
    n = len(_POLY)
    for i in range(n):
        y1, x1 = _POLY[i]
        y2, x2 = _POLY[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({y1} > {lat}) <> ({y2} > {lat})) AND "
            f"({lon} < ({x2} - {x1}) * ({lat} - {y1}) / ({y2} - {y1}) + {x1}) "
            f"THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "geo_point_in_polygon",
    oracle=f"""
    WITH pts AS (
        SELECT event_type,
               {_LAT.format(k="user_id")} AS lat,
               {_LON.format(k="user_id")} AS lon
        FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CASE WHEN {_crossings_sql("lat", "lon")} % 2 = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
           ROUND(SUM(CASE WHEN {_crossings_sql("lat", "lon")} % 2 = 1
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS inside_share
    FROM pts
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment by RAY CASTING (the even-odd rule):
    a point is inside iff a horizontal ray eastward crosses an odd
    number of polygon edges. The edge-crossing test is pure per-row
    arithmetic over literal vertices — fully codegen'd, no UDF, no
    geometry library — which is how a geofence filter should run over
    100 TB of points: map-side predicate, then an ordinary keyed
    aggregate. For many/complex polygons the same predicate sits behind
    a grid-cell pre-join (geo_grid_knn_join's topology) so each point
    tests only the polygons overlapping its cell."""
    pts = _latlon(table(spark, sf_dir, "events"), "user_id").select(
        "event_type", "lat", "lon"
    )
    crossings = F.expr(_crossings_sql("lat", "lon"))
    inside = (crossings % 2 == 1).cast("int")
    return (
        pts.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum(inside).cast("bigint").alias("n_inside"),
            F.round(F.sum(inside) / F.count(F.lit(1)), 6).alias("inside_share"),
        )
        .orderBy("event_type")
    )
