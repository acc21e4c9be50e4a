"""Round-11 batch M (X779, X781–X784): windowed lexical diversity,
directional information flow, regression influence, self-excitation,
and KMV distinct sketches with set operations.

Reference scope note: §2.13 mandate extensions, reference-free.

- X779 q_mattr: moving-average type-token ratio (Covington & McFall
  2010), window 50 — the length-invariant lexical-diversity metric
  (plain TTR shrinks with doc length, X392's weakness).  The sliding
  distinct count collapses to a CLOSED FORM over previous-occurrence
  gaps, so no window is ever enumerated.
- X781 q_transfer_entropy: lag-1 transfer entropy between daily
  up/down moves of every ordered stream pair — DIRECTIONAL
  information flow where X580's Granger sees only linear lags.
- X782 q_cooks_distance: leverage + Cook's D over the daily-revenue
  OLS trend per return flag — the influence diagnostic completing
  the X575/X579 regression-audit family.
- X783 q_hawkes_intensity: discretized self-excitation fit — daily
  counts regressed on their exponentially decayed 7-day history
  (kernel 2^-k, exact dyadic integers); the slope is the branching-
  ratio proxy separating self-exciting streams from Poisson ones.
- X784 q_theta_sketch: theta-sketch SET ALGEBRA over per-stream user
  sets — X411's KMV estimator extended with the UNION (K smallest of
  the merge) and INTERSECTION (match-fraction × union estimate,
  Beyer et al. 2007) operations that neither X411 nor the HLL
  inclusion-exclusion path (q_hll_intersect) supports without error
  blowup; 60-bit portable hashes, exact integer-division estimates.

Determinism: every count is exact; ln terms quantize 1e-9 before
integer sums; OLS residuals follow the rounded-sums discipline of
round6; KMV estimates are exact integer divisions of 2^60-scale
numerators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import text as textfn
from ..functions.hashing import token_hash, token_hash_sql
from ..sources.tables import load
from .registry import query
from .round6 import _DAILY_SQL, _daily_series, _ols_fit, _ols_sums, _residuals

# ---------------------------------------------------------------------------
# X779 — MATTR: moving-average type-token ratio, closed-form windows
# ---------------------------------------------------------------------------

_MATTR_W = 50

_MATTR_ORACLE = f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, lang, {textfn.tokens_sql('lower(text)')} AS t
      FROM documents),
    post AS MATERIALIZED (
      SELECT doc_id, lang, unnest(t) AS term,
             unnest(range(1, len(t) + 1)) AS pos, len(t) AS n
      FROM tok WHERE len(t) >= {_MATTR_W}),
    prv AS (
      SELECT doc_id, lang, n, pos,
             coalesce(lag(pos) OVER (PARTITION BY doc_id, term
                                     ORDER BY pos), 0) AS prev
      FROM post),
    contrib AS (
      SELECT doc_id, lang, n,
             greatest(0,
               least(pos, n - {_MATTR_W} + 1)
               - greatest(1, pos - {_MATTR_W} + 1, prev + 1) + 1) AS c
      FROM prv),
    per_doc AS (
      SELECT doc_id, lang,
             (CAST(sum(c) AS HUGEINT) * 100000000)
               // (CAST({_MATTR_W} AS HUGEINT)
                   * (max(n) - {_MATTR_W} + 1)) AS mq
      FROM contrib GROUP BY doc_id, lang)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(mq) AS DOUBLE) / count(*) / 100000000.0, 8)
             AS mattr
    FROM per_doc GROUP BY lang ORDER BY lang
    """


@query("q_mattr", oracle=_MATTR_ORACLE)
def q_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X779 — moving-average type-token ratio (MATTR, window
    {_MATTR_W}): mean distinct-token ratio over every length-{_MATTR_W}
    sliding window, per doc, averaged per language — the lexical-
    diversity metric that, unlike plain TTR (X392), does not decay
    with document length.

    The trick: Σ over windows of the window's distinct count equals
    Σ over TOKENS of the number of windows in which that token is the
    first occurrence of its type — a closed form over each token's
    previous-occurrence gap (one lag window per (doc, term)), so no
    window is ever enumerated and the plan is one explode + one lag +
    one doc rollup regardless of window count.

    Exactness: per-doc MATTR is an exact scaled-1e8 integer division;
    the language mean divides exact integer sums once, rounded 8 dp.

    Scale: postings-linear; the lag partitions by (doc, term) —
    bounded, skew-free; everything else is count shuffles."""
    # fan out the single-split scan (the tokenize+explode is the cost,
    # guide §2.6) and tokenize ONCE per row — the old projection
    # evaluated tokens(lower(text)) twice (generator + size)
    from ..session import default_parallelism

    d = load(spark, sf_dir, "documents").repartition(default_parallelism())
    post = (
        d.select(
            "doc_id",
            "lang",
            textfn.tokens(F.lower(F.col("text"))).alias("ts"),
        )
        .select(
            "doc_id",
            "lang",
            F.posexplode(F.col("ts")).alias("p0", "term"),
            F.size(F.col("ts")).alias("n"),
        )
        .filter(F.col("n") >= _MATTR_W)
        .select("doc_id", "lang", "term", (F.col("p0") + 1).alias("pos"), "n")
    )
    prv = post.withColumn(
        "prev",
        F.coalesce(
            F.lag("pos").over(W.partitionBy("doc_id", "term").orderBy("pos")),
            F.lit(0),
        ),
    )
    contrib = prv.select(
        "doc_id",
        "lang",
        "n",
        F.greatest(
            F.lit(0),
            F.least(F.col("pos"), F.col("n") - _MATTR_W + 1)
            - F.greatest(
                F.lit(1), F.col("pos") - _MATTR_W + 1, F.col("prev") + 1
            )
            + 1,
        ).alias("c"),
    )
    per_doc = contrib.groupBy("doc_id", "lang").agg(
        F.expr(
            f"CAST(sum(c) AS DECIMAL(38,0)) * 100000000 DIV"
            f" (CAST({_MATTR_W} AS DECIMAL(38,0)) * (max(n) - {_MATTR_W} + 1))"
        ).alias("mq")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum("mq").cast("double") / F.count("*") / 1e8, 8
            ).alias("mattr"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# X781 — lag-1 transfer entropy between stream up/down moves
# ---------------------------------------------------------------------------

_TE_ORACLE = """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
    types AS (SELECT DISTINCT event_type AS et FROM events),
    grid AS (
      SELECT t.et, d.d, coalesce(c.c, 0) AS c
      FROM types t CROSS JOIN days d
      LEFT JOIN (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
                 FROM events GROUP BY 1, 2) c
        ON c.event_type = t.et AND c.d = d.d),
    mv AS (
      SELECT et, d,
             CASE WHEN c > lag(c) OVER (PARTITION BY et ORDER BY d)
                  THEN 1 ELSE 0 END AS u,
             lag(c) OVER (PARTITION BY et ORDER BY d) AS cp
      FROM grid),
    m AS (SELECT et, d, u FROM mv WHERE cp IS NOT NULL),
    tr AS (
      SELECT x.et AS xt, y.et AS yt, y2.u AS ynext, y.u AS ynow, x.u AS xnow
      FROM m x
      JOIN m y  ON y.d = x.d AND y.et <> x.et
      JOIN m y2 ON y2.et = y.et AND y2.d = y.d + 1),
    joint AS (
      SELECT xt, yt, ynext, ynow, xnow, count(*) AS n
      FROM tr GROUP BY 1, 2, 3, 4, 5),
    tots AS (SELECT xt, yt, sum(n) AS nn FROM joint GROUP BY 1, 2),
    n_y AS (SELECT xt, yt, ynow, sum(n) AS n FROM joint GROUP BY 1, 2, 3),
    n_yx AS (SELECT xt, yt, ynow, xnow, sum(n) AS n
             FROM joint GROUP BY 1, 2, 3, 4),
    n_yy AS (SELECT xt, yt, ynext, ynow, sum(n) AS n
             FROM joint GROUP BY 1, 2, 3, 4),
    terms AS (
      SELECT j.xt, j.yt,
             CAST(round(1e9 * j.n * ln(
               (CAST(j.n AS DOUBLE) * a.n) / (CAST(b.n AS DOUBLE) * c.n)
             )) AS BIGINT) AS t9
      FROM joint j
      JOIN n_y a  ON a.xt = j.xt AND a.yt = j.yt AND a.ynow = j.ynow
      JOIN n_yx b ON b.xt = j.xt AND b.yt = j.yt AND b.ynow = j.ynow
                 AND b.xnow = j.xnow
      JOIN n_yy c ON c.xt = j.xt AND c.yt = j.yt AND c.ynext = j.ynext
                 AND c.ynow = j.ynow)
    SELECT t.xt AS x_type, t.yt AS y_type,
           CAST(tt.nn AS BIGINT) AS n_trans,
           round(CAST(sum(t.t9) AS DOUBLE) / tt.nn / 1e9, 8) AS te_nats
    FROM terms t JOIN tots tt ON tt.xt = t.xt AND tt.yt = t.yt
    GROUP BY t.xt, t.yt, tt.nn ORDER BY 1, 2
    """


@query("q_transfer_entropy", oracle=_TE_ORACLE)
def q_transfer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X781 — lag-1 transfer entropy TE(X→Y) between daily up/down
    moves of every ordered stream pair: Σ p(y⁺,y,x)·ln[p(y⁺|y,x) /
    p(y⁺|y)] — DIRECTIONAL, model-free information flow (X580's
    Granger only sees linear lag structure; TE catches any
    conditional dependence of Y's next move on X's current one).

    Plug-in estimator over exact transition counts on the binarized
    (count > yesterday) day grid — missing (type, day) cells are
    zero-filled so both streams share one calendar.

    Exactness: all marginals are exact integer sums of the 8-cell
    joint table; each n·ln(ratio) term quantizes 1e-9 before the
    integer sum (the X771 discipline); one final division.

    Scale: day-grain everywhere after the first rollup — the
    transition table is types² × days rows, the joint table types² ×
    8; every join key is (x_type, y_type)."""
    ev = load(spark, sf_dir, "events")
    days = ev.select(F.to_date("ts").alias("d")).distinct()
    types = ev.select(F.col("event_type").alias("et")).distinct()
    cnt = ev.groupBy(
        F.col("event_type").alias("et"), F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    grid = (
        types.crossJoin(days)
        .join(cnt, ["et", "d"], "left")
        .select("et", "d", F.coalesce("c", F.lit(0)).alias("c"))
    )
    wd = W.partitionBy("et").orderBy("d")
    m = (
        grid.withColumn("cp", F.lag("c").over(wd))
        .filter(F.col("cp").isNotNull())
        .select(
            "et",
            "d",
            (F.col("c") > F.col("cp")).cast("int").alias("u"),
        )
    )
    m = m.localCheckpoint()
    x = m.select(F.col("et").alias("xt"), "d", F.col("u").alias("xnow"))
    y = m.select(
        F.col("et").alias("yt"), F.col("d").alias("dy"), F.col("u").alias("ynow")
    )
    y2 = m.select(
        F.col("et").alias("yt2"),
        F.col("d").alias("dy2"),
        F.col("u").alias("ynext"),
    )
    tr = (
        x.join(y, (F.col("dy") == F.col("d")) & (F.col("yt") != F.col("xt")))
        .join(
            y2,
            (F.col("yt2") == F.col("yt"))
            & (F.col("dy2") == F.date_add(F.col("dy"), 1)),
        )
        .select("xt", "yt", "ynext", "ynow", "xnow")
    )
    joint = tr.groupBy("xt", "yt", "ynext", "ynow", "xnow").agg(
        F.count("*").alias("n")
    )
    joint = joint.localCheckpoint()
    tots = joint.groupBy("xt", "yt").agg(F.sum("n").alias("nn"))
    n_y = joint.groupBy("xt", "yt", "ynow").agg(F.sum("n").alias("n_a"))
    n_yx = joint.groupBy("xt", "yt", "ynow", "xnow").agg(
        F.sum("n").alias("n_b")
    )
    n_yy = joint.groupBy("xt", "yt", "ynext", "ynow").agg(
        F.sum("n").alias("n_c")
    )
    terms = (
        joint.join(n_y, ["xt", "yt", "ynow"])
        .join(n_yx, ["xt", "yt", "ynow", "xnow"])
        .join(n_yy, ["xt", "yt", "ynext", "ynow"])
        .select(
            "xt",
            "yt",
            F.round(
                F.lit(1e9)
                * F.col("n")
                * F.log(
                    (F.col("n").cast("double") * F.col("n_a"))
                    / (F.col("n_b").cast("double") * F.col("n_c"))
                )
            )
            .cast("long")
            .alias("t9"),
        )
    )
    return (
        terms.groupBy("xt", "yt")
        .agg(F.sum("t9").alias("s9"))
        .join(tots, ["xt", "yt"])
        .select(
            F.col("xt").alias("x_type"),
            F.col("yt").alias("y_type"),
            F.col("nn").cast("long").alias("n_trans"),
            F.round(
                F.col("s9").cast("double") / F.col("nn") / 1e9, 8
            ).alias("te_nats"),
        )
        .orderBy("x_type", "y_type")
    )


# ---------------------------------------------------------------------------
# X782 — leverage + Cook's distance on the daily-revenue OLS trend
# ---------------------------------------------------------------------------

_COOKS_TOPK = 5

_COOKS_ORACLE = f"""
    WITH {_DAILY_SQL},
    sxx AS (
      SELECT f.flag, f.n, f.sx, f.sxx - f.sx * f.sx / f.n AS Sxx,
             (SELECT sum(e * e) FROM resid r WHERE r.flag = f.flag)
               / (f.n - 2) AS s2
      FROM fit f),
    diag AS (
      SELECT r.flag, r.t, r.e,
             round(1.0 / x.n + (r.t - x.sx / x.n) * (r.t - x.sx / x.n)
                   / x.Sxx, 6) AS lev,
             x.s2
      FROM resid r JOIN sxx x ON x.flag = r.flag),
    cooks AS (
      SELECT flag, t, lev,
             round(e * e * lev / (2 * s2 * (1 - lev) * (1 - lev)), 6)
               AS cooks_d
      FROM diag),
    rk AS (
      SELECT flag, t, lev, cooks_d,
             row_number() OVER (PARTITION BY flag
                                ORDER BY cooks_d DESC, t) AS rk
      FROM cooks)
    SELECT flag, CAST(t AS BIGINT) AS t, lev, cooks_d
    FROM rk WHERE rk <= {_COOKS_TOPK}
    ORDER BY flag, cooks_d DESC, t
    """


@query("q_cooks_distance", oracle=_COOKS_ORACLE)
def q_cooks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X782 — regression influence diagnostics on the daily-revenue
    OLS trend per return flag: leverage hᵢ = 1/n + (tᵢ−t̄)²/Sxx and
    Cook's distance Dᵢ = eᵢ²hᵢ / (p·s²·(1−hᵢ)²), p = 2 — which single
    days, if dropped, would move the fitted trend most (the
    influence member the X575/X579/X544 regression-audit family was
    missing).  Top-{_COOKS_TOPK} days per flag.

    Exactness: residuals come from round6's rounded-sums OLS
    discipline; leverage rounds to 6 dp BEFORE entering Cook's
    formula and the rank orders on the 6-dp-rounded statistic with a
    day tie-break, so both engines rank identical doubles.

    Scale: the daily rollup is the only fact-grain pass; diagnostics
    are day-grain arithmetic against a 5-row broadcast fit."""
    daily = _daily_series(spark, sf_dir)
    sums = _ols_sums(daily)
    fit = _ols_fit(sums)
    resid = _residuals(daily, fit)
    sse = resid.groupBy("flag").agg(F.sum(F.col("e") * F.col("e")).alias("sse"))
    x = (
        fit.join(sse, "flag")
        .select(
            "flag",
            "n",
            "sx",
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")).alias(
                "Sxx"
            ),
            (F.col("sse") / (F.col("n") - 2)).alias("s2"),
        )
    )
    diag = resid.join(F.broadcast(x), "flag").select(
        "flag",
        "t",
        "e",
        F.round(
            1.0 / F.col("n")
            + (F.col("t") - F.col("sx") / F.col("n"))
            * (F.col("t") - F.col("sx") / F.col("n"))
            / F.col("Sxx"),
            6,
        ).alias("lev"),
        "s2",
    )
    cooks = diag.select(
        "flag",
        "t",
        "lev",
        F.round(
            F.col("e")
            * F.col("e")
            * F.col("lev")
            / (2 * F.col("s2") * (1 - F.col("lev")) * (1 - F.col("lev"))),
            6,
        ).alias("cooks_d"),
    )
    return (
        cooks.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("flag").orderBy(F.desc("cooks_d"), F.asc("t"))
            ),
        )
        .filter(F.col("rk") <= _COOKS_TOPK)
        .select("flag", F.col("t").cast("long").alias("t"), "lev", "cooks_d")
        .orderBy("flag", F.desc("cooks_d"), "t")
    )


# ---------------------------------------------------------------------------
# X783 — discretized self-excitation (Hawkes-style) intensity fit
# ---------------------------------------------------------------------------

_HAWKES_LAGS = 7  # history depth; kernel weight 2^-(k) for lag k

_HAWKES_ORACLE = f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
      FROM events GROUP BY 1, 2),
    hist AS (
      SELECT event_type, d, c,
             {' + '.join(
                 f"coalesce(lag(c, {k}) OVER (PARTITION BY event_type"
                 f" ORDER BY d), 0) * {1 << (_HAWKES_LAGS - k)}"
                 for k in range(1, _HAWKES_LAGS + 1))} AS s,
             lag(c, {_HAWKES_LAGS}) OVER (PARTITION BY event_type
                                          ORDER BY d) AS guard
      FROM daily),
    full_hist AS (SELECT * FROM hist WHERE guard IS NOT NULL),
    moms AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(s) AS HUGEINT) AS ss,
             CAST(sum(c) AS HUGEINT) AS sc,
             CAST(sum(CAST(s AS HUGEINT) * s) AS HUGEINT) AS sss,
             CAST(sum(CAST(s AS HUGEINT) * c) AS HUGEINT) AS ssc,
             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS scc
      FROM full_hist GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round({1 << _HAWKES_LAGS} * CAST(n * ssc - ss * sc AS DOUBLE)
                 / CAST(n * sss - ss * ss AS DOUBLE), 8) AS excitation,
           round((CAST(sc AS DOUBLE)
                  - (CAST(n * ssc - ss * sc AS DOUBLE)
                     / CAST(n * sss - ss * ss AS DOUBLE)) * ss) / n, 6)
             AS base_rate,
           round(CAST(n * ssc - ss * sc AS DOUBLE)
                 * CAST(n * ssc - ss * sc AS DOUBLE)
                 / (CAST(n * sss - ss * ss AS DOUBLE)
                    * CAST(n * scc - sc * sc AS DOUBLE)), 6) AS r2
    FROM moms ORDER BY event_type
    """


@query("q_hawkes_intensity", oracle=_HAWKES_ORACLE)
def q_hawkes_intensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X783 — discretized self-excitation fit per stream: regress the
    daily count on its exponentially decayed {_HAWKES_LAGS}-day history
    S_t = Σ_k 2⁻ᵏ·N_{{t−k}} (the Hawkes kernel made dyadic-exact:
    S̃_t = Σ N_{{t−k}}·2^({_HAWKES_LAGS}−k) is an INTEGER).  The
    rescaled slope is the branching-ratio proxy — how many extra
    events today per unit of decayed history — separating
    self-exciting streams from Poisson ones; base_rate is the
    intercept, r² the explained variance.

    Exactness: all five regression moments are exact int128 sums of
    integer S̃, N; doubles enter only in the three final display
    ratios (identical expression both engines).

    Scale: one daily rollup + one {_HAWKES_LAGS}-lag window pass per
    stream + a types-sized scalar fit."""
    daily = load(spark, sf_dir, "events").groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    wd = W.partitionBy("event_type").orderBy("d")
    s = None
    for k in range(1, _HAWKES_LAGS + 1):
        term = F.coalesce(F.lag("c", k).over(wd), F.lit(0)) * (
            1 << (_HAWKES_LAGS - k)
        )
        s = term if s is None else s + term
    hist = (
        daily.withColumn("s", s)
        .withColumn("guard", F.lag("c", _HAWKES_LAGS).over(wd))
        .filter(F.col("guard").isNotNull())
    )
    dec = "decimal(38,0)"
    moms = hist.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("s").cast(dec).alias("ss"),
        F.sum("c").cast(dec).alias("sc"),
        F.sum(F.col("s").cast(dec) * F.col("s")).cast(dec).alias("sss"),
        F.sum(F.col("s").cast(dec) * F.col("c")).cast(dec).alias("ssc"),
        F.sum(F.col("c").cast(dec) * F.col("c")).cast(dec).alias("scc"),
    )
    num = (F.col("n") * F.col("ssc") - F.col("ss") * F.col("sc")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sss") - F.col("ss") * F.col("ss")).cast(
        "double"
    )
    deny = (F.col("n") * F.col("scc") - F.col("sc") * F.col("sc")).cast(
        "double"
    )
    return moms.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(F.lit(1 << _HAWKES_LAGS) * num / den, 8).alias("excitation"),
        F.round(
            (F.col("sc").cast("double") - (num / den) * F.col("ss").cast("double"))
            / F.col("n"),
            6,
        ).alias("base_rate"),
        F.round(num * num / (den * deny), 6).alias("r2"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# X784 — KMV (theta-style) distinct sketch with union / intersection
# ---------------------------------------------------------------------------

_THETA_K = 64
_THETA_DOMAIN = 1 << 60  # token_hash yields 60-bit non-negative hashes

_THETA_ORACLE = f"""
    WITH du AS (
      SELECT DISTINCT event_type AS et, user_id FROM events),
    h AS (
      SELECT et, user_id,
             {token_hash_sql("CAST(user_id AS VARCHAR)")} AS hv
      FROM du),
    rk AS (
      SELECT et, hv,
             row_number() OVER (PARTITION BY et ORDER BY hv) AS r
      FROM h),
    kept AS (SELECT * FROM rk WHERE r <= {_THETA_K}),
    per AS (
      SELECT et AS scope,
             CASE WHEN max(r) < {_THETA_K} THEN max(r)
                  ELSE CAST(({_THETA_K} - 1) * CAST({_THETA_DOMAIN} AS HUGEINT)
                       // max(hv) AS BIGINT)
             END AS est_distinct,
             CAST(max(r) AS BIGINT) AS n_kept
      FROM kept GROUP BY et),
    pair AS (
      SELECT hv, max(CASE WHEN et = 'click' THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN et = 'purchase' THEN 1 ELSE 0 END) AS in_b
      FROM kept WHERE et IN ('click', 'purchase')
      GROUP BY hv),
    urk AS (
      SELECT hv, in_a, in_b,
             row_number() OVER (ORDER BY hv) AS r
      FROM pair),
    u AS (SELECT * FROM urk WHERE r <= {_THETA_K}),
    ustat AS (
      SELECT max(r) AS kk, max(hv) AS hk,
             sum(in_a * in_b) AS nb
      FROM u),
    uni AS (
      SELECT 'union(click,purchase)' AS scope,
             CASE WHEN kk < {_THETA_K} THEN kk
                  ELSE CAST((kk - 1) * CAST({_THETA_DOMAIN} AS HUGEINT)
                       // hk AS BIGINT) END AS est_distinct,
             CAST(kk AS BIGINT) AS n_kept
      FROM ustat),
    inter AS (
      SELECT 'inter(click,purchase)' AS scope,
             CAST(CAST(nb AS HUGEINT)
                  * (CASE WHEN kk < {_THETA_K} THEN kk
                     ELSE CAST((kk - 1) * CAST({_THETA_DOMAIN} AS HUGEINT)
                          // hk AS BIGINT) END) // kk AS BIGINT)
               AS est_distinct,
             CAST(nb AS BIGINT) AS n_kept
      FROM ustat)
    SELECT * FROM per
    UNION ALL SELECT * FROM uni
    UNION ALL SELECT * FROM inter
    ORDER BY scope
    """


@query("q_theta_sketch", oracle=_THETA_ORACLE)
def q_theta_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X784 — theta-sketch set algebra, K =
    {_THETA_K}: per stream keep the K smallest portable 60-bit hashes of
    its user set; distinct ≈ (K−1)·2⁶⁰/h₍K₎.  Sketches COMPOSE under
    set algebra — the union sketch is the K smallest of the merged
    sketches, and the intersection estimate is (matching fraction in
    the union sketch) × union estimate (Beyer et al. 2007) — the
    operation HLL (E12/X-portable-HLL) cannot express without
    inclusion-exclusion error blowup.  Output: per-stream, union and
    intersection estimates for (click, purchase), with exact sketch
    occupancy.

    Exactness: hashes are the engine's portable md5-derived 60-bit
    integers; every estimate is an exact integer division (int128
    numerators); under-K scopes fall back to the exact count.

    Scale: a sketch is K rows per group after one distinct rollup —
    mergeable, constant-size, shippable to a coordinator exactly like
    the production theta sketches in lakehouse engines."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.col("event_type").alias("et"), "user_id").distinct()
    h = du.select(
        "et", token_hash(F.col("user_id").cast("string")).alias("hv")
    )
    return theta_report(h)


def theta_report(cells: DataFrame) -> DataFrame:
    """(et, hv) hash cells → the q_kmv_sketch report (per-stream +
    union + intersection estimates).  Cells may hold MORE than K
    hashes per stream (e.g. a union of stored sketches): the report
    re-ranks and trims, which is exactly the KMV merge rule — shared
    by the batch query and the streaming store's read path, so
    incremental ≡ batch is an identity."""
    rk = cells.withColumn(
        "r", F.row_number().over(W.partitionBy("et").orderBy("hv"))
    ).filter(F.col("r") <= _THETA_K)
    rk = rk.localCheckpoint()
    per = rk.groupBy(F.col("et").alias("scope")).agg(
        F.when(F.max("r") < _THETA_K, F.max("r").cast("long"))
        .otherwise(
            F.expr(
                f"CAST(CAST({_THETA_K - 1} AS DECIMAL(38,0))"
                f" * CAST({_THETA_DOMAIN} AS DECIMAL(38,0))"
                " DIV max(hv) AS BIGINT)"
            )
        )
        .alias("est_distinct"),
        F.max("r").cast("long").alias("n_kept"),
    )
    pair = (
        rk.filter(F.col("et").isin("click", "purchase"))
        .groupBy("hv")
        .agg(
            F.max((F.col("et") == "click").cast("int")).alias("in_a"),
            F.max((F.col("et") == "purchase").cast("int")).alias("in_b"),
        )
    )
    u = pair.withColumn("r", F.row_number().over(W.orderBy("hv"))).filter(
        F.col("r") <= _THETA_K
    )
    ustat = u.agg(
        F.max("r").alias("kk"),
        F.max("hv").alias("hk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("both"),
    )
    uni_est = F.when(F.col("kk") < _THETA_K, F.col("kk").cast("long")).otherwise(
        F.expr(
            f"CAST(CAST(kk - 1 AS DECIMAL(38,0))"
            f" * CAST({_THETA_DOMAIN} AS DECIMAL(38,0))"
            " DIV hk AS BIGINT)"
        )
    )
    uni = ustat.select(
        F.lit("union(click,purchase)").alias("scope"),
        uni_est.alias("est_distinct"),
        F.col("kk").cast("long").alias("n_kept"),
    )
    inter = ustat.withColumn("ue", uni_est).select(
        F.lit("inter(click,purchase)").alias("scope"),
        F.expr(
            "CAST(CAST(both AS DECIMAL(38,0))"
            " * CAST(ue AS DECIMAL(38,0)) DIV kk AS BIGINT)"
        ).alias("est_distinct"),
        F.col("both").cast("long").alias("n_kept"),
    )
    return per.unionByName(uni).unionByName(inter).orderBy("scope")
