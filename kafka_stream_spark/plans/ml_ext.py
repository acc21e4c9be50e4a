"""Classical-ML and advanced-text operators (round-3 extensions
X202-X207).

The reference classifies records with hand-maintained rule strings
(/root/reference/kafka_stream/kafka_s.py:300-340). These operators are
the data-driven versions of that job — count-based classification,
learned split points, fuzzy entity matching, co-purchase affinity —
each expressed as aggregate/join compositions whose model tables are
vocabulary-sized (broadcastable), so training IS a query, not a
driver-side loop.

UDF policy: the only Python here is ``jaro_winkler`` (Spark has no
builtin; implemented as an Arrow-batched pandas UDF, oracled against
DuckDB's native jaro_winkler_similarity), NFC normalization
(unicodedata, oracled against DuckDB's nfc_normalize), and zlib
compression (no SQL analog exists — rows-only by design).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

from ..sources.tables import load
from .registry import query


def _jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    # DuckDB scores any empty operand 0.0 — including "" vs ""
    if not l1 or not l2:
        return 0.0
    if s1 == s2:
        return 1.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - md), min(l2, i + md + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3


def jaro_winkler(s1: str, s2: str) -> float:
    """Jaro-Winkler similarity, standard parameters (prefix scale 0.1,
    boost threshold 0.7, prefix cap 4) — verified bit-compatible with
    DuckDB's jaro_winkler_similarity on the test corpus."""
    j = _jaro(s1, s2)
    if j <= 0.7:
        return j
    l = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        l += 1
    return j + l * 0.1 * (1 - j)


@pandas_udf(DoubleType())
def _jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([jaro_winkler(x, y) for x, y in zip(a, b)])


@query(
    "q_jaro_winkler",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    blocked AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw
      FROM names a JOIN names b
        ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
       AND a.p_name < b.p_name
    )
    SELECT name_a, name_b, jw FROM blocked WHERE jw >= 0.88
    """,
)
def q_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Jaro-Winkler fuzzy name matching — the entity-resolution
    companion to q_fuzzy_join's edit-distance path, for the many
    real-world matchers standardized on JW. Spark has no builtin, so
    the score is an Arrow-batched pandas UDF; the oracle runs DuckDB's
    NATIVE jaro_winkler_similarity, making this a genuine cross-engine
    algorithm-parity check, not a self-fulfilling one.

    Scale: candidates are blocked on the first name token (equi-join
    key), so the quadratic scorer only runs inside blocks — the same
    one-shuffle blocking frame as q_fuzzy_join; the UDF sees candidate
    pairs, never the cross product."""
    names = load(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("jw", F.round(_jw_udf("name_a", "name_b"), 4))
        .filter(F.col("jw") >= 0.88)
        .select("name_a", "name_b", "jw")
    )


_NB_ORACLE = """
    WITH train AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 <> 0
    ), train_tok AS (
      SELECT lang, t.tok FROM train,
        unnest(string_split(text, ' ')) AS t(tok) WHERE t.tok <> ''
    ), vocab AS (SELECT DISTINCT tok FROM train_tok),
    vsize AS (SELECT count(*) AS v FROM vocab),
    class_tok AS (
      SELECT lang, tok, count(*) AS ctk FROM train_tok GROUP BY 1, 2
    ),
    class_tot AS (SELECT lang, count(*) AS tot FROM train_tok GROUP BY 1),
    prior AS (
      SELECT lang, ln(count(*) * 1.0 /
               (SELECT count(*) FROM train)) AS lp
      FROM train GROUP BY lang
    ),
    test_tok AS (
      SELECT d.doc_id, t.tok, count(*) AS cnt
      FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
      WHERE d.doc_id % 5 = 0 AND t.tok <> ''
      GROUP BY 1, 2
    ),
    known AS (
      SELECT tt.doc_id, tt.tok, tt.cnt FROM test_tok tt
      JOIN vocab v ON tt.tok = v.tok
    ),
    scored AS (
      SELECT k.doc_id, ct.lang,
             sum(k.cnt * ln((coalesce(x.ctk, 0) + 1.0) / (ct.tot + vs.v)))
               AS loglik
      FROM known k
      CROSS JOIN class_tot ct CROSS JOIN vsize vs
      LEFT JOIN class_tok x ON x.lang = ct.lang AND x.tok = k.tok
      GROUP BY 1, 2
    ),
    final AS (
      SELECT s.doc_id, s.lang,
             round(s.loglik + p.lp, 4) AS score,
             row_number() OVER (PARTITION BY s.doc_id
               ORDER BY round(s.loglik + p.lp, 4) DESC, s.lang) AS rn
      FROM scored s JOIN prior p ON s.lang = p.lang
    )
    SELECT doc_id, lang AS predicted, score FROM final WHERE rn = 1
"""


@query("q_naive_bayes", oracle=_NB_ORACLE)
def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes, trained and scored entirely as a query:
    add-one-smoothed token likelihoods per language over an 80% split
    (doc_id % 5 ≠ 0), argmax posterior on the 20% holdout. Scores are
    rounded to 4 digits BEFORE the argmax window on both engines so the
    ranking key is ULP-stable; ties break on class name.

    Scale: the model — (class, token) likelihoods + class totals +
    priors — is vocabulary-sized, a broadcast dim; training is one
    combinable token-count shuffle over the corpus, scoring is one
    explode + broadcast join + per-doc aggregate. No driver-side state
    anywhere."""
    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    tok = F.explode(F.split(F.col("text"), " ")).alias("tok")

    train_tok = train.select("lang", tok).filter(F.col("tok") != "")
    vocab = train_tok.select("tok").distinct()
    vsize = vocab.agg(F.count("*").alias("v"))
    class_tok = train_tok.groupBy("lang", "tok").agg(F.count("*").alias("ctk"))
    class_tot = train_tok.groupBy("lang").agg(F.count("*").alias("tot"))
    n_train = train.agg(F.count("*").alias("n_train"))
    prior = (
        train.groupBy("lang")
        .agg(F.count("*").alias("n_lang"))
        .crossJoin(F.broadcast(n_train))
        .select(
            "lang",
            F.log(F.col("n_lang") * 1.0 / F.col("n_train")).alias("lp"),
        )
    )

    test_tok = (
        test.select("doc_id", tok)
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    known = test_tok.join(F.broadcast(vocab), "tok")
    scored = (
        known.crossJoin(F.broadcast(class_tot))
        .crossJoin(F.broadcast(vsize))
        .join(F.broadcast(class_tok), ["lang", "tok"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.col("cnt")
                * F.log(
                    (F.coalesce(F.col("ctk"), F.lit(0)) + 1.0)
                    / (F.col("tot") + F.col("v"))
                )
            ).alias("loglik")
        )
    )
    final = scored.join(F.broadcast(prior), "lang").withColumn(
        "score", F.round(F.col("loglik") + F.col("lp"), 4)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    return (
        final.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("predicted"), "score")
    )


@query(
    "q_item_cooccur",
    oracle="""
    WITH basket AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM basket),
    item AS (SELECT l_partkey, count(*) AS ni FROM basket GROUP BY 1),
    pair AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS nxy
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT p.p1, p.p2, p.nxy,
           round(CAST(p.nxy AS DOUBLE) * o.n / (i1.ni * i2.ni), 4) AS lift
    FROM pair p
    JOIN item i1 ON p.p1 = i1.l_partkey
    JOIN item i2 ON p.p2 = i2.l_partkey
    CROSS JOIN n_orders o
    ORDER BY round(CAST(p.nxy AS DOUBLE) * o.n / (i1.ni * i2.ni), 4) DESC,
             p.p1, p.p2
    LIMIT 20
    """,
)
def q_item_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-purchase affinity ("customers also bought"):
    lift = N·c(a,b)/(c(a)·c(b)) over parts co-occurring in an order,
    min-support 3, top-20 by (rounded lift, key) — deterministic
    ordering. Unlike q_assoc_rules' 5-item event vocabulary, the item
    dimension here is open-ended (millions of parts at scale), which is
    the regime where the self-join's width bound matters: the pair join
    keys on l_orderkey, so its output is Σ per-order (basket choose 2)
    — bounded by basket size, never by catalog size; item counts
    broadcast back onto the surviving (min-support) pairs."""
    basket = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = basket.agg(F.count_distinct("l_orderkey").alias("n"))
    item = basket.groupBy("l_partkey").agg(F.count("*").alias("ni"))
    a, b = basket.alias("a"), basket.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count("*").alias("nxy"))
        .filter(F.col("nxy") >= 3)
    )
    i1 = item.select(F.col("l_partkey").alias("p1"), F.col("ni").alias("n1"))
    i2 = item.select(F.col("l_partkey").alias("p2"), F.col("ni").alias("n2"))
    return (
        pair.join(F.broadcast(i1), "p1")
        .join(F.broadcast(i2), "p2")
        .crossJoin(F.broadcast(n_orders))
        .withColumn(
            "lift",
            F.round(
                F.col("nxy").cast("double")
                * F.col("n")
                / (F.col("n1") * F.col("n2")),
                4,
            ),
        )
        .orderBy(F.desc("lift"), "p1", "p2")
        .limit(20)
        .select("p1", "p2", "nxy", "lift")
    )


@query(
    "q_decision_stump",
    oracle="""
    WITH hist AS (
      SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS bucket,
             count(*) AS n,
             sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS npos
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS nt, sum(npos) AS pt FROM hist),
    cum AS (
      SELECT bucket,
             sum(n) OVER (ORDER BY bucket) AS nl,
             sum(npos) OVER (ORDER BY bucket) AS pl,
             nt, pt
      FROM hist CROSS JOIN tot
    ),
    split AS (
      SELECT bucket, nl, nt - nl AS nr,
             round((nl * (2.0 * (CAST(pl AS DOUBLE) / nl)
                     * (1 - CAST(pl AS DOUBLE) / nl))
               + (nt - nl) * (2.0 * (CAST(pt - pl AS DOUBLE) / (nt - nl))
                     * (1 - CAST(pt - pl AS DOUBLE) / (nt - nl))))
               / nt, 6) AS wgini
      FROM cum WHERE nl < nt
    )
    SELECT (bucket + 1) * 10000 AS threshold,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           wgini
    FROM split ORDER BY wgini, bucket LIMIT 1
    """,
)
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single-threshold split (a depth-1 decision tree) predicting
    order fulfillment from o_totalprice: minimize weighted Gini
    impurity over bucket-boundary candidate thresholds. The classical
    exact-split algorithm maps to: one combinable histogram shuffle,
    then a cumulative window over the bucket table (hundreds of rows)
    that evaluates EVERY candidate in one pass — no per-threshold
    rescan of the fact table, which is what makes tree training
    feasible at 100 TB."""
    hist = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.col("o_totalprice") / 10000).cast("long").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("npos"),
        )
    )
    tot = hist.agg(F.sum("n").alias("nt"), F.sum("npos").alias("pt"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hist.crossJoin(F.broadcast(tot))
        .withColumn("nl", F.sum("n").over(w))
        .withColumn("pl", F.sum("npos").over(w))
    )
    p_l = F.col("pl").cast("double") / F.col("nl")
    nr = F.col("nt") - F.col("nl")
    p_r = (F.col("pt") - F.col("pl")).cast("double") / nr
    wgini = F.round(
        (
            F.col("nl") * (2.0 * p_l * (1 - p_l))
            + nr * (2.0 * p_r * (1 - p_r))
        )
        / F.col("nt"),
        6,
    )
    return (
        cum.filter(F.col("nl") < F.col("nt"))
        .withColumn("wgini", wgini)
        .orderBy("wgini", "bucket")
        .limit(1)
        .select(
            ((F.col("bucket") + 1) * 10000).alias("threshold"),
            F.col("nl").cast("long").alias("n_left"),
            nr.cast("long").alias("n_right"),
            "wgini",
        )
    )


@pandas_udf(StringType())
def _nfc_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: unicodedata.normalize("NFC", x))


@query(
    "q_unicode_nfc",
    oracle="""
    WITH decomposed AS (
      SELECT lang,
             replace(substr(text, 1, 60), 'e', 'e' || chr(769)) AS raw
      FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(raw)) AS BIGINT) AS raw_cp,
           CAST(sum(length(nfc_normalize(raw))) AS BIGINT) AS nfc_cp
    FROM decomposed GROUP BY lang
    """,
)
def q_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization — the first step of every text-dedup
    pipeline (byte-identical dedup is meaningless across NFC/NFD
    encodings of the same string). A decomposed corpus is constructed
    deterministically (each 'e' followed by U+0301 COMBINING ACUTE),
    normalized, and codepoint counts compared; NFC recomposition must
    shrink exactly the injected pairs. Spark runs unicodedata via an
    Arrow-batched pandas UDF (no builtin exists); the oracle is
    DuckDB's native nfc_normalize — cross-engine parity on the actual
    Unicode tables. Pure projection: embarrassingly parallel."""
    d = load(spark, sf_dir, "documents")
    decomposed = d.select(
        "lang",
        F.replace(
            F.substring("text", 1, 60), F.lit("e"), F.lit("é")
        ).alias("raw"),
    )
    return (
        decomposed.withColumn("norm", _nfc_udf("raw"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length("raw")).cast("long").alias("raw_cp"),
            F.sum(F.length("norm")).cast("long").alias("nfc_cp"),
        )
    )


@query("q_compression_ratio")
def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality screen (CCNet/Gopher-style): very
    low compressed/raw ratios mean boilerplate or repeated spans;
    ratios near 1 mean high-entropy noise. No SQL engine exposes a
    compressor, so this is rows-only by design — the deterministic
    zlib level-6 byte counts are pytest-pinned instead
    (tests/test_ml_ext.py).

    mapInPandas keeps the text column in Arrow batches; output is the
    per-language ratio histogram, so nothing document-sized leaves the
    executors."""
    import zlib

    d = load(spark, sf_dir, "documents")

    def ratios(batches):
        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    "lang": pdf["lang"],
                    # zlib overhead can push tiny documents past 1.0 —
                    # clamp so bucket 10 reads "incompressible"
                    "ratio_bucket": (comp / raw.map(len) * 10)
                    .clip(upper=10)
                    .astype("int64"),
                }
            )

    out = d.select("lang", "text").mapInPandas(
        ratios, "lang string, ratio_bucket long"
    )
    return (
        out.groupBy("lang", "ratio_bucket")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "ratio_bucket")
    )


@query(
    "q_entity_resolution",
    oracle="""
    WITH RECURSIVE names AS (
      SELECT p_name, min(p_partkey) AS nid FROM part GROUP BY p_name
    ),
    pairs AS (
      SELECT a.nid AS na, b.nid AS nb
      FROM names a JOIN names b
        ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
       AND a.p_name < b.p_name
      WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.93
    ),
    sym AS (SELECT na, nb FROM pairs UNION ALL SELECT nb, na FROM pairs),
    lab(nid, lab) AS (
      SELECT nid, nid FROM names
      UNION
      SELECT s.nb, l.lab FROM lab l JOIN sym s ON s.na = l.nid
    ),
    comp AS (SELECT nid, min(lab) AS entity_id FROM lab GROUP BY nid)
    SELECT n.p_name AS name, c.entity_id,
           count(*) OVER (PARTITION BY c.entity_id) AS entity_size
    FROM names n JOIN comp c ON n.nid = c.nid
    """,
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: block on the first name token,
    score candidates with Jaro-Winkler ≥ 0.93, close matches
    transitively (connected components over the match graph), and
    assign each surface form the component-minimum id as its canonical
    entity. The full composite a master-data pipeline runs — blocking
    keeps it off the cross product, the match graph carries integer
    ids only (name → min(p_partkey) once, up front), and the CC is
    the engine's O(log d) pointer-jumping operator. Oracle: DuckDB's
    native JW + a recursive-CTE closure — both the scorer and the
    fixpoint are independently recomputed."""
    from ..operators.graph import connected_components

    names = (
        load(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("nid"))
        .localCheckpoint(eager=True)
    )
    blk = F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("nid").alias("na"),
        blk.alias("blk"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("nid").alias("nb"),
        blk.alias("blk"),
    )
    pairs = (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("jw", F.round(_jw_udf("name_a", "name_b"), 4))
        .filter(F.col("jw") >= 0.93)
        .select(F.col("na").alias("a"), F.col("nb").alias("b"))
    )
    comp, _ = connected_components(
        names.select(F.col("nid").alias("v")), pairs, shuffle_partitions=4
    )
    w = Window.partitionBy("entity_id")
    return (
        names.join(comp, names.nid == comp.v)
        .select(
            F.col("p_name").alias("name"),
            F.col("component").alias("entity_id"),
        )
        .withColumn("entity_size", F.count("*").over(w))
    )


@query(
    "q_stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 10
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly min(10, |stratum|)
    documents per language, ordered by md5(doc_id) — a hash order both
    engines reproduce, so the sample is stable across retries,
    partitionings and engines (TABLESAMPLE is none of those). The
    per-stratum rank is a PARTITIONED window — each stratum sorts
    independently; at 100 TB replace the full sort with the same
    hash-threshold trick q_dataset_mix uses, then rank only the
    survivors (documented two-phase refinement)."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("lang", "doc_id", F.col("rn").cast("long").alias("rn"))
    )


@query(
    "q_hof_funcs",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE vec_id % 10 = 0
    )
    SELECT vec_id,
           round(list_sum(list_transform(e, x -> x * x)), 4) AS norm_sq,
           CAST(len(list_filter(e, x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(len(list_filter(e, x -> abs(x) > 2)) > 0 AS INTEGER)
             AS has_big,
           round(list_dot_product(e, list_reverse(e)), 4) AS dot_rev,
           round(list_sort(e)[1], 4) AS min_elem,
           round(list_sort(e)[len(e)], 4) AS max_elem
    FROM v
    """,
)
def q_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function family parity: transform / filter /
    exists / aggregate-fold / zip_with / sort over embedding vectors —
    Spark's lambda Column surface vs DuckDB's list_* lambdas. These
    are the primitives every vector operator here builds on (cosine,
    quantization, dim-stats); this row pins them individually. Floats
    are cast to double BEFORE any fold on both engines (FLOAT[]
    arithmetic would diverge), then rounded. Pure projection pass."""
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 10 == 0)
        .select("vec_id", e.alias("e"))
    )
    zero = F.lit(0.0).cast("double")
    fold_sq = F.aggregate(
        F.transform(F.col("e"), lambda x: x * x),
        zero,
        lambda acc, x: acc + x,
    )
    dot_rev = F.aggregate(
        F.zip_with(F.col("e"), F.reverse(F.col("e")), lambda x, y: x * y),
        zero,
        lambda acc, x: acc + x,
    )
    return v.select(
        "vec_id",
        F.round(fold_sq, 4).alias("norm_sq"),
        F.size(F.filter(F.col("e"), lambda x: x > 0))
        .cast("long")
        .alias("n_pos"),
        F.exists(F.col("e"), lambda x: F.abs(x) > 2)
        .cast("int")
        .alias("has_big"),
        F.round(dot_rev, 4).alias("dot_rev"),
        F.round(F.array_min("e"), 4).alias("min_elem"),
        F.round(F.array_max("e"), 4).alias("max_elem"),
    )


@query(
    "q_quantile_norm",
    oracle="""
    WITH g AS (
      SELECT value, row_number() OVER (ORDER BY value, event_id) AS gr,
             count(*) OVER () AS gn
      FROM events
    ),
    s AS (
      SELECT event_id, event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS r,
             count(*) OVER (PARTITION BY event_type) AS m
      FROM events
    ),
    mapped AS (
      SELECT s.event_id, s.event_type, s.value,
             CAST(ceil(CAST(s.r AS DOUBLE) * g0.gn / s.m) AS BIGINT)
               AS target_rank
      FROM s CROSS JOIN (SELECT max(gn) AS gn FROM g) g0
    )
    SELECT m.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(m.value), 4) AS raw_mean,
           round(avg(g.value), 4) AS norm_mean
    FROM mapped m JOIN g ON g.gr = m.target_rank
    GROUP BY m.event_type
    """,
)
def q_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: each event type's `value` distribution
    is mapped onto the GLOBAL distribution by rank (within-group rank
    r of m maps to the global order statistic at ⌈r·N/m⌉) — the
    bioinformatics/feature-prep standard that forces identical
    marginals across groups before comparison. Deterministic
    tie-breaks on event_id make both engines' rank tables identical.
    Reported as per-group raw vs normalized means (normalized means
    converge; raw means differ). Global ranking at 100 TB swaps in
    the quantile-sketch binning documented at q_mann_whitney."""
    e = load(spark, sf_dir, "events")
    g = e.select(
        "value",
        F.row_number()
        .over(Window.orderBy("value", "event_id"))
        .alias("gr"),
    )
    s = e.select(
        "event_id",
        "event_type",
        "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("value", "event_id"))
        .alias("r"),
        F.count("*")
        .over(Window.partitionBy("event_type"))
        .alias("m"),
    )
    gn_row = e.agg(F.count("*").alias("gn"))
    mapped = s.crossJoin(F.broadcast(gn_row)).withColumn(
        "target_rank",
        F.ceil(F.col("r").cast("double") * F.col("gn") / F.col("m")).cast(
            "long"
        ),
    )
    gg = g.select(F.col("gr").alias("target_rank"), F.col("value").alias("gv"))
    return (
        mapped.join(gg, "target_rank")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("value"), 4).alias("raw_mean"),
            F.round(F.avg("gv"), 4).alias("norm_mean"),
        )
    )


@query(
    "q_random_projection",
    oracle="""
    WITH dims AS (
      SELECT d.d, k.k,
             CASE WHEN ('0x' || substr(md5(d.d || '_' || k.k), 1, 2))::BIGINT
                       % 2 = 0 THEN 1.0 ELSE -1.0 END AS sgn
      FROM generate_series(1, 64) AS d(d)
      CROSS JOIN generate_series(0, 7) AS k(k)
    ),
    expanded AS (
      SELECT e.vec_id, gs.d, CAST(e.embedding[gs.d] AS DOUBLE) AS x
      FROM embeddings e,
           generate_series(1, 64) AS gs(d)
      WHERE e.vec_id % 20 = 0
    ),
    proj AS (
      SELECT ex.vec_id, dims.k, sum(ex.x * dims.sgn) AS p
      FROM expanded ex JOIN dims ON ex.d = dims.d
      GROUP BY 1, 2
    )
    SELECT pr.vec_id,
           round(sqrt(sum(pr.p * pr.p) / 8), 4) AS proj_norm,
           round(n.orig_norm, 4) AS orig_norm
    FROM proj pr
    JOIN (
      SELECT vec_id, sqrt(sum(x * x)) AS orig_norm
      FROM (SELECT vec_id, CAST(embedding[gs.d] AS DOUBLE) AS x
            FROM embeddings, generate_series(1, 64) AS gs(d)
            WHERE vec_id % 20 = 0)
      GROUP BY vec_id
    ) n ON n.vec_id = pr.vec_id
    GROUP BY pr.vec_id, n.orig_norm
    """,
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64→8 dims with a
    DETERMINISTIC ±1 Rademacher matrix derived from md5(d_k) — the
    dimensionality-reduction pass that makes ANN affordable, with
    reproducibility across engines/retries (a seeded RNG is not).
    Projected norms (scaled by 1/√k) estimate original norms — JL in
    action, both columns reported for inspection.

    Plan: posexplode the vectors once, equi-join the BROADCAST 64×8
    sign matrix, two combinable aggregates keyed by vec_id — vectors
    shuffle as (vec_id, k, partial) triples, never as arrays."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 20 == 0)
    expanded = emb.select(
        "vec_id", F.posexplode("embedding").alias("d0", "x")
    ).select(
        "vec_id",
        (F.col("d0") + 1).alias("d"),
        F.col("x").cast("double").alias("x"),
    )
    dims = (
        spark.range(1, 65)
        .select(F.col("id").alias("d"))
        .crossJoin(spark.range(0, 8).select(F.col("id").alias("k")))
        .select(
            "d",
            "k",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws("_", F.col("d"), F.col("k")).cast(
                                "binary"
                            )
                        ),
                        1,
                        2,
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
                == 0,
                1.0,
            )
            .otherwise(-1.0)
            .alias("sgn"),
        )
    )
    proj = (
        expanded.join(F.broadcast(dims), "d")
        .groupBy("vec_id", "k")
        .agg(F.sum(F.col("x") * F.col("sgn")).alias("p"))
    )
    norms = expanded.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("orig_norm")
    )
    return (
        proj.groupBy("vec_id")
        .agg(F.round(F.sqrt(F.sum(F.col("p") * F.col("p")) / 8), 4).alias("proj_norm"))
        .join(norms, "vec_id")
        .select("vec_id", "proj_norm", F.round("orig_norm", 4).alias("orig_norm"))
    )
