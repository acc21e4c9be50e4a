"""Function-family breadth, round 2: math, encoding, cryptographic
hashes, bit manipulation, map functions, extended array functions, and
the cross-join operator.

Same contract as plans.breadth: each query pins one family against the
DuckDB oracle and documents cross-engine quirks in place. These finish
the standard warehouse scalar surface the reference (SURVEY.md §2.3 —
~10 scalar functions total) never had.

All pure projection passes: no shuffle, fully inside whole-stage
codegen, trivially scale-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS r1,
           CAST(floor(l_extendedprice) AS BIGINT) AS flr,
           CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
           abs(l_quantity - 25) AS ab,
           CAST(sign(l_quantity - 25) AS DOUBLE) AS sg,
           CAST(l_orderkey % 7 AS BIGINT) AS md,
           round(sqrt(l_quantity), 6) AS sq,
           round(pow(l_discount + 1, 3), 6) AS pw,
           round(exp(l_tax), 6) AS ex,
           round(ln(l_extendedprice), 6) AS lg,
           round(log10(l_extendedprice), 6) AS l10,
           greatest(l_quantity, 10.0) AS gr,
           least(l_quantity, 10.0) AS ls
    FROM lineitem WHERE l_orderkey <= 200
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (round/floor/ceil/abs/sign/mod/sqrt/pow/
    exp/ln/log10/greatest/least). Transcendentals rounded to 6 places:
    both engines evaluate in IEEE double, and rounding pins the printed
    repr on the rare half-ULP divergence."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.floor("l_extendedprice").alias("flr"),
        F.ceil("l_extendedprice").alias("cl"),
        F.abs(F.col("l_quantity") - 25).alias("ab"),
        F.signum(F.col("l_quantity") - 25).alias("sg"),
        (F.col("l_orderkey") % 7).alias("md"),
        F.round(F.sqrt("l_quantity"), 6).alias("sq"),
        F.round(F.pow(F.col("l_discount") + 1, 3), 6).alias("pw"),
        F.round(F.exp("l_tax"), 6).alias("ex"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("lg"),
        F.round(F.log10("l_extendedprice"), 6).alias("l10"),
        F.greatest(F.col("l_quantity"), F.lit(10.0)).alias("gr"),
        F.least(F.col("l_quantity"), F.lit(10.0)).alias("ls"),
    )


@query(
    "q_encoding_funcs",
    oracle="""
    SELECT doc_id,
           to_base64(encode(source)) AS b64,
           lower(hex(source)) AS hx,
           decode(from_base64(to_base64(encode(source)))) AS roundtrip,
           ascii(source) AS first_cp,
           chr(65 + CAST(doc_id % 26 AS INT)) AS letter
    FROM documents WHERE doc_id <= 100
    """,
)
def q_encoding_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding family: base64/unbase64 round-trip, hex, ascii, chr.
    hex() is lower()-wrapped — Spark emits upper-case digits, DuckDB
    lower-case; the bytes are identical."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    src_bin = F.encode("source", "utf-8")
    return d.select(
        "doc_id",
        F.base64(src_bin).alias("b64"),
        F.lower(F.hex("source")).alias("hx"),
        F.decode(F.unbase64(F.base64(src_bin)), "utf-8").alias("roundtrip"),
        F.ascii("source").alias("first_cp"),
        F.chr(F.lit(65) + (F.col("doc_id") % 26).cast("int")).alias("letter"),
    )


@query(
    "q_hash_funcs",
    oracle="""
    SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256,
           length(md5(text)) AS md5_len
    FROM documents WHERE doc_id <= 100
    """,
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash family: md5 + sha2-256, hex-string output
    identical across engines. Spark's xxhash64/murmur3 `hash()` are
    engine-internal seeds with no DuckDB twin — the portable-hash path
    for cross-engine keys is functions.hashing (md5-derived), used by
    every sketch operator."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.length(F.md5("text")).alias("md5_len"),
    )


@query(
    "q_bit_funcs",
    oracle="""
    SELECT event_id,
           user_id << 3 AS shl,
           user_id >> 2 AS shr,
           xor(user_id, event_id) AS x,
           user_id & 255 AS masked,
           user_id | 4096 AS set_bit,
           bit_count(user_id) AS popcount
    FROM events WHERE event_id <= 500
    """,
)
def q_bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-manipulation family: shifts, xor, and/or masks, popcount —
    the scalar complement to q_bitwise_agg's aggregates. All int64
    two's-complement, bit-identical across engines."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    return e.select(
        "event_id",
        F.shiftleft(F.col("user_id"), 3).alias("shl"),
        F.shiftright(F.col("user_id"), 2).alias("shr"),
        F.col("user_id").bitwiseXOR(F.col("event_id")).alias("x"),
        F.col("user_id").bitwiseAND(F.lit(255)).alias("masked"),
        F.col("user_id").bitwiseOR(F.lit(4096)).alias("set_bit"),
        F.bit_count("user_id").alias("popcount"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT doc_id,
           array_to_string(
             list_sort(map_keys(map(['lang','source'], [lang, source]))),
             ',') AS ks,
           map_extract(map(['lang','source'], [lang, source]), 'lang')[1]
             AS lang_val,
           cardinality(map(['lang','source'], [lang, source])) AS sz
    FROM documents WHERE doc_id <= 100
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type family: construct, keys (sorted — Spark preserves
    insertion order, DuckDB its own; sort pins both), point lookup,
    size. Maps carry the reference's dict-shaped payloads
    (kafka_s.py:157 BSON record) as first-class columns. Every output
    column is scalar (array_join'd) so the driver's value hasher never
    sees a list — see tools/check.py's scalar-output lint."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    m = F.map_from_arrays(
        F.array(F.lit("lang"), F.lit("source")),
        F.array(F.col("lang"), F.col("source")),
    )
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("ks"),
        m.getItem("lang").alias("lang_val"),
        F.size(m).alias("sz"),
    )


@query(
    "q_array_funcs2",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE doc_id <= 100 AND len(string_split(text, ' ')) >= 12
    )
    SELECT doc_id,
           array_to_string(
             list_sort(list_distinct(list_concat(w[1:8], w[5:12]))), ',')
             AS un,
           array_to_string(list_sort(list_distinct(list_filter(w[1:8],
             x -> list_contains(w[5:12], x)))), ',') AS inter,
           array_to_string(list_sort(list_distinct(list_filter(w[1:8],
             x -> NOT list_contains(w[5:12], x)))), ',') AS ex,
           array_to_string(flatten([w[1:2], w[3:4]]), ',') AS fl,
           array_to_string(list_transform(w[1:3],
             (x, i) -> x || '_' || w[i + 4]), ',') AS zipped,
           array_to_string(range(1, 4), ',') AS seq
    FROM t
    """,
)
def q_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended array family: set union/intersect/except (expressed as
    the same sort∘distinct∘filter composition on both engines — Spark's
    native array_intersect keeps first-array order, DuckDB has no twin,
    so the portable spelling is explicit), flatten, zip_with, sequence.
    Outputs are array_join'd to scalars for the driver's value hasher
    (lists are unhashable on the pandas side)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    t = d.withColumn("w", F.split("text", " ")).filter(F.size("w") >= 12)
    a, b = F.slice("w", 1, 8), F.slice("w", 5, 8)

    def j(col):
        return F.array_join(col, ",")

    return t.select(
        "doc_id",
        j(F.array_sort(F.array_distinct(F.concat(a, b)))).alias("un"),
        j(
            F.array_sort(
                F.array_distinct(F.filter(a, lambda x: F.array_contains(b, x)))
            )
        ).alias("inter"),
        j(
            F.array_sort(
                F.array_distinct(F.filter(a, lambda x: ~F.array_contains(b, x)))
            )
        ).alias("ex"),
        j(F.flatten(F.array(F.slice("w", 1, 2), F.slice("w", 3, 2)))).alias("fl"),
        j(
            F.zip_with(
                F.slice("w", 1, 3),
                F.slice("w", 5, 3),
                lambda x, y: F.concat_ws("_", x, y),
            )
        ).alias("zipped"),
        j(F.sequence(F.lit(1), F.lit(3))).alias("seq"),
    )


@query(
    "q_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (crossJoin API — Spark refuses
    implicit ones). Only sane between broadcast-sized sides; the rule
    theta-join (q_rule_match) is its production use: tiny rules table ×
    stream, planned as BroadcastNestedLoopJoin."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")


@query(
    "q_percentile_disc",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_disc(l_quantity, 0.25) AS DOUBLE) AS p25,
           CAST(quantile_disc(l_quantity, 0.50) AS DOUBLE) AS p50,
           CAST(quantile_disc(l_quantity, 0.95) AS DOUBLE) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (always an observed value — the companion
    of q_percentiles' interpolated continuous form; the right choice for
    ordinal/categorical-coded metrics where interpolation is
    meaningless). Same lower-rank convention in both engines."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)")
        .cast("double").alias("p25"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY l_quantity)")
        .cast("double").alias("p50"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_quantity)")
        .cast("double").alias("p95"),
    )


@query(
    "q_bool_agg",
    oracle="""
    SELECT event_type,
           bool_and(value > 0) AS all_pos,
           bool_or(value > 100) AS any_large,
           CAST(count_if(value > 50) AS BIGINT) AS n_over_50,
           CAST(count_if(user_id % 2 = 0) AS BIGINT) AS n_even_user
    FROM events GROUP BY event_type
    """,
)
def q_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family (every/any/count_if — SQL:2023
    BOOLEAN aggregates). All map-side combinable single-bit state."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.every(F.col("value") > 0).alias("all_pos"),
        F.some(F.col("value") > 100).alias("any_large"),
        F.count_if(F.col("value") > 50).alias("n_over_50"),
        F.count_if(F.col("user_id") % 2 == 0).alias("n_even_user"),
    )


@query(
    "q_try_funcs",
    oracle="""
    SELECT doc_id,
           try_cast(source AS INTEGER) AS bad_int,
           try_cast(CAST(doc_id AS VARCHAR) AS INTEGER) AS good_int,
           round(CASE WHEN doc_id % 10 = 0 THEN NULL
                ELSE CAST(n_chars AS DOUBLE) / (doc_id % 10) END, 6)
             AS safe_div
    FROM documents WHERE doc_id <= 200
    """,
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe evaluation family: try_cast and try_divide return
    NULL instead of failing the job — at 100 TB one malformed row must
    never kill a 6-hour pipeline. The oracle spells try_divide as the
    equivalent CASE (DuckDB's x/0 convention differs)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    return d.select(
        "doc_id",
        F.try_to_number("source", F.lit("999999")).cast("int").alias("bad_int"),
        F.col("doc_id").cast("string").cast("int").alias("good_int"),
        F.round(
            F.try_divide(F.col("n_chars").cast("double"), F.col("doc_id") % 10),
            6,
        ).alias("safe_div"),
    )


_NOT_IN_SQL = """
    SELECT 'not_in_clean' AS variant, count(*) AS n
    FROM orders
    WHERE o_custkey NOT IN
      (SELECT c_custkey FROM customer WHERE c_custkey % 100 = 0)
    UNION ALL
    SELECT 'not_in_with_null', count(*)
    FROM orders
    WHERE o_custkey NOT IN
      (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_custkey END
       FROM customer)
    UNION ALL
    SELECT 'not_exists_with_null', count(*)
    FROM orders o
    WHERE NOT EXISTS
      (SELECT 1 FROM customer c
       WHERE (CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_custkey END)
             = o.o_custkey)
"""


@query("q_not_in_nulls", oracle=_NOT_IN_SQL)
def q_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued NOT IN semantics — the classic SQL trap, pinned
    across engines: one NULL in the subquery list makes NOT IN return
    UNKNOWN for every probe (count = 0), while NOT EXISTS over the same
    nullable key keeps its natural anti-join meaning. A drop-in engine
    must reproduce the trap, not silently 'fix' it. Both rewrites plan
    as broadcast null-aware anti joins — no extra shuffle for the
    null check."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_NOT_IN_SQL)


@query(
    "q_time_rollup",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           grouping(year(o_orderdate)) AS g_yr,
           grouping(month(o_orderdate)) AS g_mo,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
    """,
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-hierarchy rollup (month ⊂ year ⊂ grand total) with
    grouping() flags disambiguating NULL-as-subtotal from NULL data —
    the time-dimension materialized-rollup shape (one Expand + one
    aggregate, subtotals come from the same single scan)."""
    o = load(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    ).withColumn("mo", F.month("o_orderdate"))
    return (
        o.rollup("yr", "mo")
        .agg(
            F.grouping("yr").cast("int").alias("g_yr"),
            F.grouping("mo").cast("int").alias("g_mo"),
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select("yr", "mo", "g_yr", "g_mo", "n", "revenue")
    )


@query(
    "q_pysource_scan",
    oracle="""
    WITH gen AS (
      SELECT i AS seq,
             CASE WHEN (i * 7) % 10 < 3
                  THEN ['i', 'u', 'd'][((i * 7) % 10 % 3) + 1]
                  ELSE 'i' END AS op,
             '83' || lpad(CAST(i % 500 AS VARCHAR), 4, '0') AS st_code,
             'doc ' || CAST(i % 97 AS VARCHAR) || ' body '
                || CAST((i * 31) % 1000 AS VARCHAR) AS title
      FROM range(2000) t(i)
    )
    SELECT op, count(*) AS n,
           CAST(min(seq) AS BIGINT) AS min_seq,
           CAST(max(seq) AS BIGINT) AS max_seq,
           count(DISTINCT st_code) AS n_codes,
           count(DISTINCT title) AS n_titles
    FROM gen GROUP BY op
    """,
)
def q_pysource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom CONNECTOR under the oracle gate: the cdcgen Python
    DataSource (sources/pysource — Spark 4 `pyspark.sql.datasource` API,
    parallel partitions + filter pushdown into the source) scanned and
    aggregated, against a DuckDB oracle that regenerates the same
    deterministic relation from `range()`. Proves the connector yields
    exactly the declared relation at any partitioning — the contract a
    replacement for the reference's hand-rolled Kafka consumer loop
    (kafka_s.py:149-161) must keep."""
    from ..sources.pysource import register

    register(spark)
    gen = (
        spark.read.format("cdcgen")
        .option("rows", "2000")
        .option("partitions", "8")
        .load()
    )
    return gen.groupBy("op").agg(
        F.count("*").alias("n"),
        F.min("seq").alias("min_seq"),
        F.max("seq").alias("max_seq"),
        F.countDistinct("st_code").alias("n_codes"),
        F.countDistinct("title").alias("n_titles"),
    )


@query(
    "q_printf",
    oracle="""
    SELECT event_id,
           printf('%07d', event_id) AS padded,
           printf('%s=%0.3f', event_type, value) AS kv,
           printf('%x', user_id) AS hex_user
    FROM events WHERE event_id <= 300
    """,
)
def q_printf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-style formatted strings (format_string ↔ printf): zero-padded
    ids, key=value rendering, hex. Both engines use printf semantics,
    so the bytes match exactly — the report/export formatting path."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") <= 300)
    return e.select(
        "event_id",
        F.format_string("%07d", "event_id").alias("padded"),
        F.format_string("%s=%.3f", F.col("event_type"), F.col("value")).alias("kv"),
        F.format_string("%x", "user_id").alias("hex_user"),
    )


@query(
    "q_url_funcs",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://site' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
               || '?lang=' || lang || '&src=' || source AS url
      FROM documents WHERE doc_id <= 200
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u
    """,
)
def q_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (parse_url HOST/PATH/QUERY/QUERY-key/PROTOCOL) over
    deterministic derived URLs — the web-corpus provenance columns every
    crawl pipeline extracts (domain-level dedup/mixing keys). The
    oracle re-derives each component with regexes; equality pins Spark's
    java.net.URI-based parser to the grammar on these URL shapes."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    u = d.select(
        "doc_id",
        F.concat(
            F.lit("https://site"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/docs/"), F.col("doc_id").cast("string"),
            F.lit("?lang="), F.col("lang"),
            F.lit("&src="), F.col("source"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "q_dense_rank",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           rank() OVER w AS rk,
           dense_rank() OVER w AS drk
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_size DESC)
    """,
)
def q_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank under ties (gapped vs gapless numbering) —
    both are pure functions of the ORDER BY value, so ties make the
    result deterministic without a tie-break column, unlike
    row_number."""
    from pyspark.sql import Window

    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_size"))
    return p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
    )


@query(
    "q_explode_outer",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> length(w) >= 8)
               AS ws
      FROM documents WHERE doc_id <= 300
    )
    SELECT t.doc_id, u.u AS long_token
    FROM t LEFT JOIN LATERAL (SELECT unnest(t.ws) AS u) u ON true
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer — null-preserving expansion: a document with NO
    qualifying tokens still yields one row (long_token NULL) instead of
    vanishing. The LEFT-JOIN-LATERAL oracle is exactly the relational
    reading of outer explode; plain explode would silently drop those
    parents, the classic fan-out bug in quality-funnel joins."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 300)
    ws = F.filter(
        F.split("text", " "), lambda w: F.length(w) >= 8
    )
    return d.select(
        "doc_id", F.explode_outer(ws).alias("long_token")
    )


@query(
    "q_collect_set",
    oracle="""
    SELECT lang,
           array_to_string(list_sort(list_distinct(list(source))), ',')
             AS sources,
           len(list_distinct(list(source))) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def q_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set aggregation (collect_set, sorted — set order is
    engine-arbitrary, sort pins both): the per-group vocabulary
    gatherer. Bounded state only when the distinct domain is (like
    here) naturally small; for unbounded domains use X81's counted
    top-k instead. The set column is array_join'd to a scalar for the
    driver's value hasher."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.array_join(F.array_sort(F.collect_set("source")), ",")
        .alias("sources"),
        F.size(F.collect_set("source")).alias("n_sources"),
    )


@query(
    "q_union_by_name",
    oracle="""
    WITH v1 AS (
      SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 50
    ),
    v2 AS (
      SELECT doc_id, lang, source FROM documents
      WHERE doc_id >= 450 AND doc_id < 500
    )
    SELECT doc_id, lang, n_chars FROM v1
    UNION ALL BY NAME
    SELECT doc_id, lang, source FROM v2
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two snapshots with different column sets
    align BY NAME (missing columns → NULL) instead of by position —
    how an append-log table absorbs a schema change without rewriting
    history. Positional UNION would silently misalign; allowMissing
    makes the evolution explicit."""
    d = load(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") < 50).select("doc_id", "lang", "n_chars")
    v2 = (
        d.filter((F.col("doc_id") >= 450) & (F.col("doc_id") < 500))
        .select("doc_id", "lang", "source")
    )
    return v1.unionByName(v2, allowMissingColumns=True)


_AGG_FILTER_SQL = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_fulfilled,
           round(avg(o_totalprice) FILTER (WHERE o_totalprice > 100000), 4)
             AS avg_large,
           CAST(count(DISTINCT o_custkey) FILTER (WHERE o_orderdate >=
             DATE '1997-01-01') AS BIGINT) AS custs_since_97
    FROM orders GROUP BY o_orderpriority
"""


@query("q_agg_filter", oracle=_AGG_FILTER_SQL)
def q_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X222 — SQL:2003 aggregate FILTER clause, run from the IDENTICAL
    SQL string on both engines (Spark 4 and DuckDB both implement it).
    The declarative form of the CASE-WHEN conditional-aggregation
    pattern used across this repo — one combinable pass however it's
    spelled, but the FILTER spelling survives copy-paste from other
    warehouses."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_AGG_FILTER_SQL)


@query(
    "q_null_ordering",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_totalprice END AS metric
      FROM orders WHERE o_orderkey < 500
    )
    SELECT o_orderkey, round(metric, 4) AS metric,
           CAST(row_number() OVER (ORDER BY metric ASC NULLS FIRST,
                                   o_orderkey) AS BIGINT) AS rn_nf,
           CAST(row_number() OVER (ORDER BY metric DESC NULLS LAST,
                                   o_orderkey) AS BIGINT) AS rn_nl
    FROM src
    """,
)
def q_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X223 — explicit NULLS FIRST / NULLS LAST ordering parity. The
    engines DISAGREE by default (Spark sorts nulls first on ASC,
    DuckDB last), so every ORDER BY on a nullable key in a portable
    pipeline must pin placement explicitly — this row proves both
    directions with deterministic key tie-breaks."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    src = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("metric"),
    )
    w_nf = Window.orderBy(F.asc_nulls_first("metric"), "o_orderkey")
    w_nl = Window.orderBy(F.desc_nulls_last("metric"), "o_orderkey")
    return src.select(
        "o_orderkey",
        F.round("metric", 4).alias("metric"),
        F.row_number().over(w_nf).cast("long").alias("rn_nf"),
        F.row_number().over(w_nl).cast("long").alias("rn_nl"),
    )
