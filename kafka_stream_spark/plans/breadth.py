"""Scalar/aggregate function breadth: grouping sets, statistical
aggregates, string functions, datetime functions.

The reference's scalar surface is ~10 functions (SURVEY.md §2.3); a
drop-in engine needs the standard warehouse surface too. Each query here
pins a family of functions against the DuckDB oracle, documenting the
cross-engine semantics quirks in place (day-of-week origin, skewness
estimator variants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load, register_views
from .registry import query


@query(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                            (l_returnflag, l_linestatus))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under rollup/cube) via
    the SQL surface — same Catalyst Expand operator as rollup/cube."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        """
    )


@query(
    "q_stats_agg",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 6) AS sd,
           round(var_samp(value), 6) AS var,
           round(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS cov,
           round(corr(value, CAST(user_id AS DOUBLE)), 6) AS correl
    FROM events GROUP BY event_type
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample stddev/variance/covariance/
    correlation). skewness/kurtosis are deliberately absent: Spark
    computes the population estimator (g1/g2), DuckDB the sample-adjusted
    one (G1/G2) — not an engine bug, just different published estimators.
    """
    e = load(spark, sf_dir, "events")
    uid = F.col("user_id").cast("double")
    return e.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("var"),
        F.round(F.covar_samp(F.col("value"), uid), 6).alias("cov"),
        F.round(F.corr(F.col("value"), uid), 6).alias("correl"),
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT doc_id,
           upper(source) AS up, lower(source) AS lo,
           substr(text, 1, 10) AS first10,
           lpad(source, 8, '*') AS padded,
           replace(source, 'src', 'S#') AS replaced,
           left(text, 5) AS l5, repeat(source, 2) AS doubled,
           instr(text, 'spark') AS spark_pos,
           length(text) AS n_chars, reverse(source) AS rev
    FROM documents
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function family, all codegen built-ins."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("source").alias("up"),
        F.lower("source").alias("lo"),
        F.substring("text", 1, 10).alias("first10"),
        F.lpad("source", 8, "*").alias("padded"),
        F.replace(F.col("source"), F.lit("src"), F.lit("S#")).alias("replaced"),
        F.substring("text", 1, 5).alias("l5"),
        F.repeat("source", 2).alias("doubled"),
        F.instr(F.col("text"), "spark").alias("spark_pos"),
        F.length("text").alias("n_chars"),
        F.reverse("source").alias("rev"),
    )


@query(
    "q_regex_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(source, 'src([0-9]+)', 1) AS src_num,
           regexp_matches(text, 'spark.*fast|fast.*spark') AS spark_fast,
           len(regexp_extract_all(text, '[a-z]+')) AS n_words,
           regexp_replace(source, '[0-9]+', '#', 'g') AS src_masked
    FROM documents
    """,
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: capture-group extract, rlike, extract-all count,
    global replace (patterns restricted to the RE2∩Java-regex common
    subset so both engines agree)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("source", "src([0-9]+)", 1).alias("src_num"),
        F.col("text").rlike("spark.*fast|fast.*spark").alias("spark_fast"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), 0)).alias(
            "n_words"
        ),
        F.regexp_replace("source", "[0-9]+", "#").alias("src_masked"),
    )


@query(
    "q_conditional_funcs",
    oracle="""
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), 'dead') AS etype_or_dead,
           CASE WHEN value > 250 THEN 'high' WHEN value > 100 THEN 'mid'
                ELSE 'low' END AS band,
           greatest(value, CAST(user_id AS DOUBLE)) AS gv,
           least(value, CAST(user_id AS DOUBLE)) AS lv,
           if(event_type = 'purchase', value, 0.0) AS purchase_value
    FROM events
    """,
)
def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: nullif/coalesce, CASE bands, greatest/least,
    if()."""
    e = load(spark, sf_dir, "events")
    uid = F.col("user_id").cast("double")
    return e.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("dead")).alias(
            "etype_or_dead"
        ),
        F.when(F.col("value") > 250, "high")
        .when(F.col("value") > 100, "mid")
        .otherwise("low")
        .alias("band"),
        F.greatest(F.col("value"), uid).alias("gv"),
        F.least(F.col("value"), uid).alias("lv"),
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .otherwise(0.0)
        .alias("purchase_value"),
    )


@query(
    "q_posexplode",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents WHERE doc_id < 10
    )
    SELECT doc_id, CAST(unnest(range(len(ws))) AS INTEGER) AS pos,
           unnest(ws) AS token
    FROM t
    """,
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — ordinal-preserving explode (lineage for chunking and
    sequence features)."""
    from ..functions import text as T

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return d.select(
        "doc_id", F.posexplode(T.tokens(F.col("text"))).alias("pos", "token")
    )


@query(
    "q_datetime_funcs",
    oracle="""
    SELECT event_id,
           year(ts) AS y, month(ts) AS mo, day(ts) AS d, hour(ts) AS h,
           minute(ts) AS mi,
           dayofweek(ts) + 1 AS dow,            -- DuckDB 0=Sun, Spark 1=Sun
           CAST(strftime(ts, '%j') AS INTEGER) AS doy,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           ts + INTERVAL 3 DAY AS plus3d,
           -- Spark add_months works on DATE (drops time-of-day)
           CAST(CAST(ts AS DATE) + INTERVAL 1 MONTH AS TIMESTAMP) AS plus1mo,
           date_diff('day', date_trunc('day', ts),
                     TIMESTAMP '2024-02-01 00:00:00') AS days_to_feb
    FROM events
    """,
)
def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar-function family. Cross-engine quirks pinned in the
    oracle: DuckDB's dayofweek is 0-origin Sunday (Spark's is 1-origin),
    both clamp month-end in add-months (Jan 31 + 1mo = Feb 29)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.dayofweek("ts").alias("dow"),
        F.dayofyear("ts").alias("doy"),
        F.date_trunc("day", "ts").alias("day_start"),
        (F.col("ts") + F.expr("INTERVAL 3 DAYS")).alias("plus3d"),
        F.add_months("ts", 1).cast("timestamp").alias("plus1mo"),
        F.datediff(
            F.lit("2024-02-01 00:00:00").cast("timestamp"),
            F.date_trunc("day", "ts"),
        ).alias("days_to_feb"),
    )


@query(
    "q_moments_agg",
    oracle="""
    WITH m AS (
      SELECT event_type, avg(value) AS mu FROM events GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n,
           round(avg(pow(e.value - m.mu, 3))
                 / pow(avg(pow(e.value - m.mu, 2)), 1.5), 6) AS skew_pop,
           round(avg(pow(e.value - m.mu, 4))
                 / pow(avg(pow(e.value - m.mu, 2)), 2) - 3, 6) AS kurt_pop
    FROM events e JOIN m ON e.event_type = m.event_type
    GROUP BY e.event_type
    """,
)
def q_moments_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher statistical moments (population skewness g1 / excess
    kurtosis g2), closing q_stats_agg's deliberate exclusion: built-in
    skewness/kurtosis use different published estimators per engine
    (Spark g1/g2, DuckDB G1/G2), so the engine computes the moments
    explicitly — a two-pass central-moment plan (group means broadcast
    back over the fact) that is numerically stabler than one-pass power
    sums and identical on both engines. Reference has no stats surface
    at all (SURVEY.md §2.9)."""
    e = load(spark, sf_dir, "events")
    means = e.groupBy("event_type").agg(F.avg("value").alias("mu"))
    d = F.col("value") - F.col("mu")
    m2 = F.avg(F.pow(d, 2))
    return (
        e.join(F.broadcast(means), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.pow(d, 3)) / F.pow(m2, 1.5), 6).alias("skew_pop"),
            F.round(F.avg(F.pow(d, 4)) / F.pow(m2, 2) - 3, 6).alias("kurt_pop"),
        )
    )
