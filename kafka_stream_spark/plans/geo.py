"""Geospatial operators (round-3 extensions X208-X209).

Spatial radius joins are the geo equivalent of the engine's LSH
near-dup joins: bucket space into grid cells, equi-join on cell ids
(one shuffle), verify the exact predicate only inside candidate
buckets. No all-pairs anywhere, so the shape survives 100 TB of
points the same way q_near_dedup survives 100 TB of text.

Coordinates are synthesized deterministically from md5(c_custkey) —
the one hash both engines implement identically (an LCG/Lehmer mix
was tried first and rejected: its Marsaglia lattice guarantees a
minimum point separation, leaving the radius join vacuously empty).
Latitude is restricted to ±45° so a fixed ±2-cell longitude
neighborhood is provably sufficient for the 100 km radius (1° lon ≥
78.7 km when |lat| ≤ 45°; 1° lat ≈ 111.2 km). Antimeridian
wrap-around (−180° adjacency to +180°) is out of scope for this
synthetic frame; a production grid adds the two wrapped cell ids to
the neighborhood list — one more equi-join key, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

_EARTH_KM = 6371.0

# (dlat, dlon) neighborhood: 100 km spans at most 1 lat cell and 2 lon
# cells at |lat| <= 45
_OFFSETS = [(i, j) for i in (-1, 0, 1) for j in (-2, -1, 0, 1, 2)]


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    h = F.md5(F.col("c_custkey").cast("string").cast("binary"))
    return c.select(
        F.col("c_custkey").alias("k"),
        (
            F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % 9000 / 100.0
            - 45
        ).alias("lat"),
        (
            F.conv(F.substring(h, 7, 6), 16, 10).cast("long") % 36000 / 100.0
            - 180
        ).alias("lon"),
    )


_POINTS_SQL = """
      SELECT c_custkey AS k,
             (('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6))::BIGINT
               % 9000) / 100.0 - 45 AS lat,
             (('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 7, 6))::BIGINT
               % 36000) / 100.0 - 180 AS lon
      FROM customer
"""


def _haversine(lat1, lon1, lat2, lon2):
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.sin(dlon) * F.sin(dlon)
    return 2 * _EARTH_KM * F.asin(F.sqrt(a))


@query(
    "q_geo_radius_join",
    oracle=f"""
    WITH pts AS ({_POINTS_SQL}),
    o(di, dj) AS (VALUES
      (-1,-2),(-1,-1),(-1,0),(-1,1),(-1,2),
      ( 0,-2),( 0,-1),( 0,0),( 0,1),( 0,2),
      ( 1,-2),( 1,-1),( 1,0),( 1,1),( 1,2)),
    pairs AS (
      SELECT a.k AS k1, b.k AS k2,
             round(2 * {_EARTH_KM} * asin(sqrt(
               pow(sin(radians(b.lat - a.lat) / 2), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lon - a.lon) / 2), 2))), 3) AS dist_km
      FROM pts a CROSS JOIN o JOIN pts b
        ON floor(b.lat) = floor(a.lat) + o.di
       AND floor(b.lon) = floor(a.lon) + o.dj
      WHERE a.k < b.k
    )
    SELECT k1, k2, dist_km FROM pairs WHERE dist_km <= 100.0
    """,
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within 100 km (haversine), cell-blocked:
    points land in 1°×1° grid cells; the left side explodes into its
    15-cell (±1 lat, ±2 lon) neighborhood and equi-joins on the cell
    id, then the exact haversine runs only on bucket-collocated
    candidates. One shuffle on the cell key; candidate volume is bound
    by local point density, never n². (The oracle spells the same
    neighborhood as a coarse theta filter — fine at oracle scale,
    while the engine side keeps the scalable equi-join form.)"""
    return _radius_pairs(spark, sf_dir)


def _radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    offsets = F.array(
        *[
            F.struct(F.lit(i).alias("di"), F.lit(j).alias("dj"))
            for i, j in _OFFSETS
        ]
    )
    a = (
        pts.withColumn("o", F.explode(offsets))
        .select(
            F.col("k").alias("k1"),
            F.col("lat").alias("lat1"),
            F.col("lon").alias("lon1"),
            (F.floor("lat") + F.col("o.di")).alias("cell_lat"),
            (F.floor("lon") + F.col("o.dj")).alias("cell_lon"),
        )
    )
    b = pts.select(
        F.col("k").alias("k2"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
        F.floor("lat").alias("cell_lat"),
        F.floor("lon").alias("cell_lon"),
    )
    return (
        a.join(b, ["cell_lat", "cell_lon"])
        .filter(F.col("k1") < F.col("k2"))
        .withColumn(
            "dist_km",
            F.round(
                _haversine(
                    F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
                ),
                3,
            ),
        )
        .filter(F.col("dist_km") <= 100.0)
        .select("k1", "k2", "dist_km")
    )


@query(
    "q_geo_aggregate",
    oracle=f"""
    WITH pts AS ({_POINTS_SQL})
    SELECT CAST(floor(lat / 10) * 10 AS BIGINT) AS lat_band,
           CAST(count(*) AS BIGINT) AS n_points,
           round(avg(lon), 4) AS centroid_lon,
           round(avg(lat), 4) AS centroid_lat,
           round(2 * {_EARTH_KM} * asin(sqrt(
             pow(sin(radians(max(lat) - min(lat)) / 2), 2)
             + cos(radians(min(lat))) * cos(radians(max(lat)))
               * pow(sin(radians(max(lon) - min(lon)) / 2), 2))), 3)
             AS band_diag_km
    FROM pts GROUP BY 1
    """,
)
def q_geo_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-latitude-band spatial rollup: point count, centroid, and the
    haversine diagonal of the band's bounding box — the
    tile-statistics pass a map renderer or spatial-index builder runs
    first. One combinable groupBy on the band key; the haversine is
    evaluated on already-aggregated extremes."""
    pts = _points(spark, sf_dir)
    g = pts.groupBy(
        (F.floor(F.col("lat") / 10) * 10).cast("long").alias("lat_band")
    ).agg(
        F.count("*").cast("long").alias("n_points"),
        F.round(F.avg("lon"), 4).alias("centroid_lon"),
        F.round(F.avg("lat"), 4).alias("centroid_lat"),
        F.min("lat").alias("lat_lo"),
        F.max("lat").alias("lat_hi"),
        F.min("lon").alias("lon_lo"),
        F.max("lon").alias("lon_hi"),
    )
    return g.select(
        "lat_band",
        "n_points",
        "centroid_lon",
        "centroid_lat",
        F.round(
            _haversine(
                F.col("lat_lo"), F.col("lon_lo"), F.col("lat_hi"), F.col("lon_hi")
            ),
            3,
        ).alias("band_diag_km"),
    )


from ..operators.graph import connected_components  # noqa: E402


_PAIRS_SQL = f"""
    o(di, dj) AS (VALUES
      (-1,-2),(-1,-1),(-1,0),(-1,1),(-1,2),
      ( 0,-2),( 0,-1),( 0,0),( 0,1),( 0,2),
      ( 1,-2),( 1,-1),( 1,0),( 1,1),( 1,2)),
    pairs AS (
      SELECT a.k AS k1, b.k AS k2
      FROM pts a CROSS JOIN o JOIN pts b
        ON floor(b.lat) = floor(a.lat) + o.di
       AND floor(b.lon) = floor(a.lon) + o.dj
      WHERE a.k < b.k
        AND round(2 * {_EARTH_KM} * asin(sqrt(
              pow(sin(radians(b.lat - a.lat) / 2), 2)
              + cos(radians(a.lat)) * cos(radians(b.lat))
                * pow(sin(radians(b.lon - a.lon) / 2), 2))), 3) <= 100.0
    )
"""


@query(
    "q_dbscan",
    oracle=f"""
    WITH RECURSIVE pts AS ({_POINTS_SQL}),
    {_PAIRS_SQL},
    sym AS (
      SELECT k1 AS a, k2 AS b FROM pairs
      UNION ALL SELECT k2, k1 FROM pairs
    ),
    deg AS (SELECT a AS k, count(*) AS n FROM sym GROUP BY a),
    core AS (SELECT k FROM deg WHERE n + 1 >= 3),
    core_edges AS (
      SELECT s.a, s.b FROM sym s
      JOIN core c1 ON s.a = c1.k JOIN core c2 ON s.b = c2.k
    ),
    lab(k, lab) AS (
      SELECT k, k FROM core
      UNION
      SELECT e.b, l.lab FROM lab l JOIN core_edges e ON e.a = l.k
    ),
    comp AS (SELECT k, min(lab) AS cluster FROM lab GROUP BY k),
    border AS (
      SELECT s.a AS k, min(c.cluster) AS cluster
      FROM sym s JOIN comp c ON s.b = c.k
      WHERE s.a NOT IN (SELECT k FROM core)
      GROUP BY s.a
    )
    SELECT k, CAST(cluster AS BIGINT) AS cluster, 'core' AS role FROM comp
    UNION ALL
    SELECT k, CAST(cluster AS BIGINT), 'border' FROM border
    UNION ALL
    SELECT p.k, CAST(-1 AS BIGINT), 'noise' FROM pts p
    WHERE p.k NOT IN (SELECT k FROM comp)
      AND p.k NOT IN (SELECT k FROM border)
    """,
)
def q_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed DBSCAN (eps = 100 km, minPts = 3) composed from the
    engine's own primitives: the cell-blocked radius join supplies
    eps-neighborhoods (no all-pairs), degree counts mark core points,
    pointer-jumping connected components (operators/graph.py — the
    same O(log d) machinery behind q_dedup_clusters) labels the
    core-core graph, and border points take the MIN neighboring core
    cluster so assignment is deterministic (textbook DBSCAN leaves
    border ties order-dependent; an oracle-gated engine cannot).
    Noise keeps cluster −1. The oracle recomputes the same fixpoint
    with a recursive-CTE transitive closure.

    Scale: every stage is a key-partitioned join/agg over the
    candidate-pair table, whose size is bound by local density —
    exactly the LSH-dedup shape, applied to space instead of text."""
    pairs = _radius_pairs(spark, sf_dir).select("k1", "k2")
    # eager checkpoint: the radius join runs ONCE; a lazy persist would
    # recompute it per consumer because unpersist-before-action drops
    # the cache ahead of the first job
    sym = pairs.union(
        pairs.select(F.col("k2").alias("k1"), F.col("k1").alias("k2"))
    ).localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("k1").alias("k")).agg(F.count("*").alias("n"))
    core = deg.filter(F.col("n") + 1 >= 3).select("k").localCheckpoint(
        eager=True
    )
    core_edges = (
        sym.join(core.withColumnRenamed("k", "k1"), "k1")
        .join(core.withColumnRenamed("k", "k2"), "k2")
        .select(F.col("k1").alias("a"), F.col("k2").alias("b"))
        .localCheckpoint(eager=True)
    )
    # ~1 shuffle partition per 50k edges for the iterative stage,
    # clamped to the session default (see connected_components)
    sess = int(
        spark.conf.get("spark.sql.shuffle.partitions") or "32"
    )
    parts = max(4, min(sess, core_edges.count() // 50_000 + 1))
    comp, _rounds = connected_components(
        core.select(F.col("k").alias("v")),
        core_edges,
        shuffle_partitions=parts,
    )
    comp = comp.select(F.col("v").alias("k"), F.col("component").alias("cluster"))
    border = (
        sym.join(comp.withColumnRenamed("k", "k2"), "k2")
        .join(core.withColumnRenamed("k", "k1"), "k1", "left_anti")
        .groupBy(F.col("k1").alias("k"))
        .agg(F.min("cluster").alias("cluster"))
    )
    pts = _points(spark, sf_dir).select("k")
    # labeled feeds both the noise anti-join and the final union —
    # checkpoint so the CC + border subplans run once, not twice
    labeled = (
        comp.select(
            "k", F.col("cluster").cast("long").alias("cluster"),
            F.lit("core").alias("role"),
        )
        .union(
            border.select(
                "k", F.col("cluster").cast("long").alias("cluster"),
                F.lit("border").alias("role"),
            )
        )
        .localCheckpoint(eager=True)
    )
    noise = (
        pts.join(labeled.select("k"), "k", "left_anti")
        .select("k", F.lit(-1).cast("long").alias("cluster"),
                F.lit("noise").alias("role"))
    )
    return labeled.union(noise)
