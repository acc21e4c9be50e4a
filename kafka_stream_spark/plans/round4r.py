"""Round-4 batch R: language-model data depth (X393-X400).

Deepens the LM-pipeline family with the public algorithms a serious
pretraining data stack runs beyond X167's add-one bigram: Kneser-Ney
smoothing (the n-gram LM standard, Chen & Goodman 1999), Dirichlet
query-likelihood retrieval (Zhai & Lafferty 2001), perplexity-band
corpus filtering (the CCNet recipe), paragraph-grain dedup (CCNet's
actual dedup unit), duplicate-cluster audits, curriculum binning,
tokenizer byte-fallback pressure, and cross-source vocabulary overlap.
Every model 'trains' as combinable count rollups and scores via
key-aligned re-joins — no driver-side state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text
from ..sources.tables import load
from .registry import query
from .textlm import _BIGRAMS_SQL, _doc_bigrams

# ---------------------------------------------------------------------------
# X393 — interpolated Kneser-Ney bigram LM
# ---------------------------------------------------------------------------


@query(
    "q_kneser_ney",
    oracle=f"""
    WITH {_BIGRAMS_SQL},
    c2 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(c12) AS c1, count(*) AS n1plus_fw
           FROM c2 GROUP BY w1),
    cont AS (SELECT w2, count(*) AS n1plus_bw FROM c2 GROUP BY w2),
    btypes AS (SELECT count(*) AS b FROM c2),
    scored AS (
      SELECT bg.doc_id,
             -log2(greatest(c2.c12 - 0.75, 0) / c1.c1
                   + (0.75 / c1.c1) * c1.n1plus_fw
                     * (cont.n1plus_bw * 1.0 / bt.b)) AS nll
      FROM bg
      JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
      JOIN c1 ON bg.w1 = c1.w1
      JOIN cont ON bg.w2 = cont.w2
      CROSS JOIN btypes bt
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(nll), 6) AS avg_nll_kn
    FROM scored GROUP BY doc_id
    """,
)
def q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X393 — interpolated Kneser-Ney bigram scoring (Chen & Goodman's
    fixed-discount form, D=0.75): P(w2|w1) = max(c12−D,0)/c1 +
    (D/c1)·N₁₊(w1,·)·P_cont(w2), with the continuation probability
    P_cont(w2) = N₁₊(·,w2)/|bigram types| — the smoothing that made
    n-gram LMs competitive and the quality scorer CCNet's add-one
    (X167) approximates. 'Training' is three combinable rollups over
    the SAME pair-count table (c1 and the fan-out count fold from c2,
    not from raw bigrams); scoring re-joins on the count keys, B is a
    broadcast scalar. Two shuffles + one re-join at any corpus size."""
    bg = _doc_bigrams(spark, sf_dir)
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1plus_fw")
    )
    cont = c2.groupBy("w2").agg(F.count("*").alias("n1plus_bw"))
    btypes = c2.agg(F.count("*").alias("b"))
    p_kn = (
        F.greatest(F.col("c12") - 0.75, F.lit(0.0)) / F.col("c1")
        + (0.75 / F.col("c1"))
        * F.col("n1plus_fw")
        * (F.col("n1plus_bw") * 1.0 / F.col("b"))
    )
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .join(cont, ["w2"])
        .crossJoin(F.broadcast(btypes))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log2(p_kn)), 6).alias("avg_nll_kn"),
        )
    )


# ---------------------------------------------------------------------------
# X394 — Dirichlet-smoothed query likelihood retrieval
# ---------------------------------------------------------------------------


@query(
    "q_dirichlet_qlm",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({text.tokens_sql('text')}) AS w
      FROM documents
    ), coll AS (
      SELECT w, count(*) AS cf FROM tok GROUP BY w
    ), tot AS (SELECT sum(cf) AS ct FROM coll),
    qterms AS (
      SELECT w, cf FROM (
        SELECT w, cf, row_number() OVER (ORDER BY cf DESC, w) AS rn
        FROM coll WHERE length(w) >= 4) WHERE rn <= 3
    ), dlen AS (
      SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
    ), dtf AS (
      SELECT t.doc_id, q.w, count(*) AS tf
      FROM tok t JOIN qterms q ON t.w = q.w
      GROUP BY t.doc_id, q.w
    ), scored AS (
      SELECT d.doc_id, d.dl,
             sum(ln((coalesce(dtf.tf, 0)
                     + 2000.0 * q.cf / t.ct) / (d.dl + 2000.0))) AS ql
      FROM dlen d
      CROSS JOIN qterms q CROSS JOIN tot t
      LEFT JOIN dtf ON dtf.doc_id = d.doc_id AND dtf.w = q.w
      GROUP BY d.doc_id, d.dl
    )
    SELECT doc_id, CAST(dl AS BIGINT) AS doc_len,
           round(ql, 6) AS query_loglik
    FROM (SELECT *, row_number() OVER
            (ORDER BY round(ql, 6) DESC, doc_id) AS rn FROM scored)
    WHERE rn <= 20
    """,
)
def q_dirichlet_qlm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X394 — query-likelihood retrieval with Dirichlet-prior smoothing
    (Zhai & Lafferty, μ=2000): score(d) = Σ_q ln((tf + μ·P(q|C)) /
    (|d| + μ)) for the 3 highest-cf terms of length ≥4 (a deterministic
    in-corpus query), top-20 docs. The LM-based ranking family next to
    X111's BM25 — smoothing by document length is what BM25's b
    parameter hand-tunes. Query model and collection stats are
    broadcast scalars; per-doc tf comes from a semi-join against the 3
    query terms, so the scan never widens."""
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("w")
    )
    coll = tok.groupBy("w").agg(F.count("*").alias("cf"))
    tot = coll.agg(F.sum("cf").alias("ct"))
    qterms = (
        coll.filter(F.length("w") >= 4)
        .withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.col("cf").desc(), "w")),
        )
        .filter(F.col("rn") <= 3)
        .select("w", "cf")
    )
    dlen = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    dtf = (
        tok.join(F.broadcast(qterms.select("w")), "w")
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        dlen.crossJoin(F.broadcast(qterms))
        .crossJoin(F.broadcast(tot))
        .join(dtf, ["doc_id", "w"], "left")
        .groupBy("doc_id", "dl")
        .agg(
            F.sum(
                F.log(
                    (
                        F.coalesce("tf", F.lit(0))
                        + 2000.0 * F.col("cf") / F.col("ct")
                    )
                    / (F.col("dl") + 2000.0)
                )
            ).alias("ql")
        )
    )
    wr = Window.orderBy(F.round("ql", 6).desc(), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 20)
        .select(
            "doc_id",
            F.col("dl").cast("long").alias("doc_len"),
            F.round("ql", 6).alias("query_loglik"),
        )
    )


# ---------------------------------------------------------------------------
# X395 — perplexity-band corpus filter
# ---------------------------------------------------------------------------


@query(
    "q_perplexity_filter",
    oracle=f"""
    WITH {_BIGRAMS_SQL},
    c2 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    v AS (SELECT count(DISTINCT w2) AS vocab FROM bg),
    nlls AS (
      SELECT b.doc_id,
             round(avg(-log2((c2.c12 + 1.0) / (c1.c1 + v.vocab))), 6)
               AS nll
      FROM bg b
      JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
      JOIN c1 ON b.w1 = c1.w1
      CROSS JOIN v
      GROUP BY b.doc_id
    ), cuts AS (
      SELECT CAST(quantile_cont(nll, 0.1) AS DOUBLE) AS lo,
             CAST(quantile_cont(nll, 0.9) AS DOUBLE) AS hi
      FROM nlls
    )
    SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n.nll BETWEEN c.lo AND c.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(avg(CASE WHEN n.nll BETWEEN c.lo AND c.hi
                          THEN 1.0 ELSE 0 END), 6) AS frac_kept,
           round(avg(n.nll), 6) AS mean_nll,
           round(any_value(c.lo), 6) AS cut_lo,
           round(any_value(c.hi), 6) AS cut_hi
    FROM nlls n JOIN documents d USING (doc_id) CROSS JOIN cuts c
    GROUP BY d.source
    """,
)
def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X395 — perplexity-band corpus filtering (the CCNet recipe:
    score with an LM, keep the middle band — the head is boilerplate,
    the tail is noise): X167's add-one bigram NLL per doc, global
    p10/p90 cuts on the ROUNDED score, keep-rate and composition shift
    per source. This is the composed decision layer over the scorer:
    at 100 TB the nll table (one row per doc) is the only input to the
    quantile and the per-source rollup."""
    bg = _doc_bigrams(spark, sf_dir)
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = bg.agg(F.countDistinct("w2").alias("vocab"))
    nll = -F.log2(
        (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("vocab"))
    )
    nlls = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(F.round(F.avg(nll), 6).alias("nll"))
    )
    cuts = nlls.agg(
        F.expr("percentile(nll, 0.1)").alias("lo"),
        F.expr("percentile(nll, 0.9)").alias("hi"),
    )
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    kept = F.col("nll").between(F.col("lo"), F.col("hi"))
    return (
        nlls.join(d, "doc_id")
        .crossJoin(F.broadcast(cuts))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(kept.cast("int")).cast("long").alias("n_kept"),
            F.round(F.avg(kept.cast("double")), 6).alias("frac_kept"),
            F.round(F.avg("nll"), 6).alias("mean_nll"),
            F.round(F.any_value("lo"), 6).alias("cut_lo"),
            F.round(F.any_value("hi"), 6).alias("cut_hi"),
        )
    )


# ---------------------------------------------------------------------------
# X396 — duplicate-cluster size audit
# ---------------------------------------------------------------------------


@query(
    "q_dup_cluster_sizes",
    oracle="""
    WITH h AS (
      SELECT md5(text) AS hh, count(*) AS sz FROM documents GROUP BY 1
    ), dist AS (
      SELECT sz, count(*) AS n_clusters, sum(sz) AS n_docs
      FROM h GROUP BY sz
    ), tot AS (SELECT sum(sz) AS nd FROM h)
    SELECT CAST(d.sz AS BIGINT) AS cluster_size,
           CAST(d.n_clusters AS BIGINT) AS n_clusters,
           CAST(d.n_docs AS BIGINT) AS n_docs,
           round(d.n_docs * 1.0 / t.nd, 6) AS corpus_frac,
           CAST(d.n_docs - d.n_clusters AS BIGINT) AS removable_docs
    FROM dist d CROSS JOIN tot t
    """,
)
def q_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X396 — duplicate-cluster size distribution for exact dedup: how
    many md5 clusters exist at each multiplicity, the corpus fraction
    they hold, and the docs a keep-one pass would remove — the audit
    that sizes E1's dedup BEFORE running it (a heavy tail here is why
    near-dedup X21 clusters matter too). One hash rollup + one k-row
    fold; the histogram key is the cluster size, bounded by the worst
    duplicate."""
    h = (
        load(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("hh"))
        .agg(F.count("*").alias("sz"))
    )
    dist = h.groupBy("sz").agg(
        F.count("*").alias("n_clusters"), F.sum("sz").alias("n_docs")
    )
    tot = h.agg(F.sum("sz").alias("nd"))
    return dist.crossJoin(F.broadcast(tot)).select(
        F.col("sz").cast("long").alias("cluster_size"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.col("n_docs") * 1.0 / F.col("nd"), 6).alias(
            "corpus_frac"
        ),
        (F.col("n_docs") - F.col("n_clusters"))
        .cast("long")
        .alias("removable_docs"),
    )


# ---------------------------------------------------------------------------
# X397 — curriculum difficulty bins
# ---------------------------------------------------------------------------


@query(
    "q_curriculum_bins",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({text.tokens_sql('text')}) AS w
      FROM documents
    ), df AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY w),
    per_doc AS (
      SELECT t.doc_id, count(*) AS n_tok,
             round(avg(length(t.w))
                   + 5 * avg(CASE WHEN df.df < 5 THEN 1.0 ELSE 0 END),
                   6) AS difficulty
      FROM tok t JOIN df ON t.w = df.w
      GROUP BY t.doc_id
    ), binned AS (
      SELECT doc_id, n_tok, difficulty,
             ntile(5) OVER (ORDER BY difficulty, doc_id) AS bin
      FROM per_doc
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           round(min(difficulty), 6) AS min_difficulty,
           round(max(difficulty), 6) AS max_difficulty,
           round(avg(difficulty), 6) AS mean_difficulty
    FROM binned GROUP BY bin
    """,
)
def q_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X397 — curriculum binning: a lexical difficulty proxy (mean word
    length + 5× rare-word fraction, df<5) per document, cut into 5
    ntile stages — the ordering signal for curriculum pretraining
    (easy→hard), with per-stage token budgets the scheduler consumes
    alongside X229's mixture weights. Difficulty rounded BEFORE the
    ntile so both engines draw identical bin boundaries; the ntile
    runs over one row per doc."""
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("w")
    )
    df = tok.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    per_doc = (
        tok.join(df, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.round(
                F.avg(F.length("w"))
                + 5
                * F.avg(
                    F.when(F.col("df") < 5, 1.0).otherwise(0.0)
                ),
                6,
            ).alias("difficulty"),
        )
    )
    binned = per_doc.withColumn(
        "bin",
        F.ntile(5).over(Window.orderBy("difficulty", "doc_id")),
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.round(F.min("difficulty"), 6).alias("min_difficulty"),
        F.round(F.max("difficulty"), 6).alias("max_difficulty"),
        F.round(F.avg("difficulty"), 6).alias("mean_difficulty"),
    ).select(
        F.col("bin").cast("long").alias("bin"),
        "n_docs",
        "n_tokens",
        "min_difficulty",
        "max_difficulty",
        "mean_difficulty",
    )


# ---------------------------------------------------------------------------
# X398 — paragraph-grain dedup (CCNet unit)
# ---------------------------------------------------------------------------


@query(
    "q_paragraph_dedup",
    oracle="""
    WITH para AS (
      SELECT doc_id, source, trim(p) AS p
      FROM (SELECT doc_id, source, unnest(string_split(text, '. ')) AS p
            FROM documents)
      WHERE length(trim(p)) >= 10
    ), ph AS (
      SELECT doc_id, source, md5(lower(p)) AS h FROM para
    ), df AS (
      SELECT h, count(DISTINCT doc_id) AS ndocs FROM ph GROUP BY h
    )
    SELECT ph.source, CAST(count(*) AS BIGINT) AS n_paragraphs,
           CAST(sum(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_paragraphs,
           round(avg(CASE WHEN df.ndocs >= 2 THEN 1.0 ELSE 0 END), 6)
             AS dup_frac,
           CAST(count(DISTINCT CASE WHEN df.ndocs >= 2
                                    THEN ph.doc_id END) AS BIGINT)
             AS n_docs_with_dup
    FROM ph JOIN df USING (h)
    GROUP BY ph.source
    """,
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X398 — paragraph-grain duplication audit (CCNet's actual dedup
    unit: it hashes normalized paragraphs, not documents): segments of
    ≥10 chars split on sentence boundaries, lowercased-hash, a
    paragraph is duplicated when ≥2 distinct docs share it; per-source
    duplicated fraction and affected docs. Sits between E1's
    whole-doc hash and X381's 5-gram spans on the granularity ladder.
    Only 16-byte hashes shuffle, ONCE: the per-hash distinct-doc count
    comes from a window collect_set over the same h-partitioning the
    rows already need (round-6 rewrite of the groupBy+self-join
    spelling, which shuffled ph by h twice and scanned documents
    twice); the per-source rollup is the only other exchange."""
    para = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.explode(F.split("text", "\\. ")).alias("p"),
        )
        .select("doc_id", "source", F.trim("p").alias("p"))
        .filter(F.length("p") >= 10)
    )
    ph = para.select(
        "doc_id", "source", F.md5(F.lower("p")).alias("h")
    )
    w_h = Window.partitionBy("h")
    flagged = ph.withColumn(
        "ndocs", F.size(F.collect_set("doc_id").over(w_h))
    )
    dup = F.col("ndocs") >= 2
    return (
        flagged
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_paragraphs"),
            F.sum(dup.cast("int")).cast("long").alias("n_dup_paragraphs"),
            F.round(F.avg(dup.cast("double")), 6).alias("dup_frac"),
            F.countDistinct(F.when(dup, F.col("doc_id")))
            .cast("long")
            .alias("n_docs_with_dup"),
        )
    )


# ---------------------------------------------------------------------------
# X399 — tokenizer byte-fallback pressure
# ---------------------------------------------------------------------------


@query(
    "q_byte_fallback",
    oracle="""
    WITH per_doc AS (
      SELECT lang, length(text) AS n_chars_t, strlen(text) AS n_bytes
      FROM documents WHERE length(text) > 0
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(n_bytes * 1.0 / n_chars_t), 6) AS mean_bytes_per_char,
           round(sum(n_bytes - n_chars_t) * 1.0 / sum(n_chars_t), 6)
             AS extra_byte_ratio,
           round(max(n_bytes * 1.0 / n_chars_t), 6) AS max_bytes_per_char
    FROM per_doc GROUP BY lang
    """,
)
def q_byte_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X399 — tokenizer byte-fallback pressure per language: UTF-8
    bytes per character (1.0 = pure ASCII; each 3-byte CJK char adds
    2 to the excess ratio) — the statistic that predicts how hard a
    byte-fallback BPE will fragment each language's text, priced
    against X382's fertility. Pure projection + one rollup; the
    byte/char lengths are engine built-ins on both sides."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "lang",
            F.length("text").alias("n_chars_t"),
            F.octet_length("text").alias("n_bytes"),
        )
    )
    bpc = F.col("n_bytes") * 1.0 / F.col("n_chars_t")
    return d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg(bpc), 6).alias("mean_bytes_per_char"),
        F.round(
            F.sum(F.col("n_bytes") - F.col("n_chars_t"))
            * 1.0
            / F.sum("n_chars_t"),
            6,
        ).alias("extra_byte_ratio"),
        F.round(F.max(bpc), 6).alias("max_bytes_per_char"),
    )


# ---------------------------------------------------------------------------
# X400 — cross-source vocabulary overlap
# ---------------------------------------------------------------------------


@query(
    "q_source_similarity",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({text.tokens_sql('text')}) AS w
      FROM documents
    ), sv AS (
      SELECT source, w FROM tok GROUP BY source, w HAVING count(*) >= 2
    ), sizes AS (
      SELECT source, count(*) AS nv FROM sv GROUP BY source
    ), inter AS (
      SELECT a.source AS sa, b.source AS sb, count(*) AS common
      FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source
    ), j AS (
      SELECT i.sa, i.sb, i.common, za.nv AS nva, zb.nv AS nvb,
             round(i.common * 1.0 / (za.nv + zb.nv - i.common), 6)
               AS jaccard
      FROM inter i JOIN sizes za ON i.sa = za.source
                   JOIN sizes zb ON i.sb = zb.source
    )
    SELECT sa AS source_a, sb AS source_b,
           CAST(common AS BIGINT) AS common_terms,
           CAST(nva AS BIGINT) AS vocab_a, CAST(nvb AS BIGINT) AS vocab_b,
           jaccard
    FROM (SELECT *, row_number() OVER
            (ORDER BY jaccard DESC, sa, sb) AS rn FROM j)
    WHERE rn <= 20
    """,
)
def q_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X400 — cross-source vocabulary overlap: per-source vocabularies
    (terms with in-source frequency ≥2 — the noise floor), pairwise
    Jaccard via a term-keyed equi-join (pairs are generated THROUGH
    shared terms, the X379 wedge shape applied to vocab), top-20 most
    similar source pairs — the redundancy diagnostic X92's mixing
    weights should see before two near-identical sources both get
    budget. The rank cut is an exact rational; vocab tables are
    k·|vocab|, far smaller than the corpus."""
    tok = load(spark, sf_dir, "documents").select(
        "source", F.explode(text.tokens(F.col("text"))).alias("w")
    )
    sv = (
        tok.groupBy("source", "w")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("source", "w")
    )
    sizes = sv.groupBy("source").agg(F.count("*").alias("nv"))
    a = sv.select(F.col("source").alias("sa"), "w")
    b = sv.select(F.col("source").alias("sb"), "w")
    inter = (
        a.join(b, "w")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count("*").alias("common"))
    )
    j = (
        inter.join(
            F.broadcast(
                sizes.select(F.col("source").alias("sa"), F.col("nv").alias("nva"))
            ),
            "sa",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("source").alias("sb"), F.col("nv").alias("nvb"))
            ),
            "sb",
        )
        .select(
            "sa",
            "sb",
            "common",
            "nva",
            "nvb",
            F.round(
                F.col("common")
                * 1.0
                / (F.col("nva") + F.col("nvb") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )
    wr = Window.orderBy(F.col("jaccard").desc(), "sa", "sb")
    return (
        j.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 20)
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.col("common").cast("long").alias("common_terms"),
            F.col("nva").cast("long").alias("vocab_a"),
            F.col("nvb").cast("long").alias("vocab_b"),
            "jaccard",
        )
    )
