"""Round-7 additions (X598–X608): the tokenizer-trainer trio — iterated
BPE (X598/X599, completing the story X168's single induction step
started), WordPiece (X601) and Unigram-LM Viterbi segmentation +
hard-EM refinement (X605/X606) — plus strict-capacity sequence packing
(X600, completing X230's waste AUDIT with the packing OPERATOR),
PRESS/leave-one-out regression diagnostics (X602), graph-based ANN
with measured recall (X603/X604), and sampled-Brandes betweenness
centrality (X608).

Reference scope note: the reference pipeline (kafka_s.py) has no
tokenizer, packing, ANN or centrality surface at all — these are §2.13
LLM-data-pipeline mandate components, reference-free by design.

Scale notes:

* BPE trains on the WORD-TYPE table (word, freq), not the corpus —
  vocabulary-sized by Heaps' law, so the per-round window passes touch
  a relation orders of magnitude smaller than the corpus even at
  100 TB; the corpus is read exactly once (word counting) and once
  more at encode time (broadcast join against the trained pieces).
  Every BPE implementation since Sennrich et al. 2016 uses this
  word-type factorization.
* Merge rounds are FIXED-DEPTH UNROLLED (R_BPE rounds), the same
  discipline as the X74 PageRank / X558 power-iteration oracles: each
  round is ~3 window passes + one vocabulary-sized aggregate, and the
  argmax pair broadcasts.
* Sequence packing runs greedy next-fit-decreasing INSIDE hash
  buckets: the sequential fold is per-bucket (applyInPandas), buckets
  are independent, and the DuckDB oracle replays the exact greedy scan
  with a recursive CTE — packing quality is within a constant of FFD
  while staying embarrassingly parallel across buckets, which is the
  only packing discipline that works on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text, vectors
from ..session import default_parallelism
from ..sources.tables import load
from .registry import query
from .round6 import _DAILY_SQL

#: Number of unrolled BPE merge rounds (the trained vocabulary adds
#: R_BPE merged symbols on top of the character alphabet).
R_BPE = 6

#: Sequence-packing token budget per training sequence, and the number
#: of independent packing buckets (doc_id-hash partitions). The budget
#: is ~4-5 median documents (median 56 tokens) so sequences genuinely
#: pack; a budget at the median would degenerate to one doc per seq.
B_PACK = 256
N_PACK_BUCKETS = 16


# ---------------------------------------------------------------------------
# X598 — iterated BPE trainer (+ X599 encoder)
# ---------------------------------------------------------------------------


def _bpe_initial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, freq, pos, sym): every word type split into characters with
    its corpus frequency — the relation all merge rounds fold."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(text.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    return words.select(
        "w",
        "freq",
        F.posexplode(F.regexp_extract_all("w", F.lit("."), 0)).alias(
            "pos", "sym"
        ),
    )


def _merge_best(pr: DataFrame, best: DataFrame) -> DataFrame:
    """Greedy left-to-right non-overlapping merge of the argmax pair's
    occurrences. Overlap chains only arise for L == R (runs like
    'aaa'); within each maximal run of consecutive matched positions
    the even offsets win — exactly greedy scan order, and exactly what
    the oracle's window-function replay computes."""
    # selectExpr STRINGS instead of per-op Column construction: this
    # helper is built once per merge round by every BPE-family key, and
    # its ~30 Column ops cost ~0.2 s of py4j round-trips per round on
    # this driver (guide §7.3) — the expressions (and the executed
    # plan) are identical to the old withColumn chain
    j = (
        pr.crossJoin(F.broadcast(best))
        .selectExpr(
            "*", "(nsym IS NOT NULL AND sym = bl AND nsym = br) AS m"
        )
        .selectExpr(
            "*",
            "CASE WHEN m THEN pos - row_number()"
            " OVER (PARTITION BY w, m ORDER BY pos) END AS grp",
        )
        .selectExpr(
            "*",
            "(m AND (row_number() OVER (PARTITION BY w, grp ORDER BY pos)"
            " - 1) % 2 = 0) AS sel",
        )
        .selectExpr(
            "*",
            "coalesce(lag(sel) OVER (PARTITION BY w ORDER BY pos), false)"
            " AS psel",
        )
    )
    kept = j.filter("NOT psel").selectExpr(
        "w",
        "freq",
        "pos",
        "CASE WHEN sel THEN concat(sym, nsym) ELSE sym END AS sym",
    )
    return kept.selectExpr(
        "w",
        "freq",
        "CAST(row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS INT)"
        " AS pos",
        "sym",
    )


def _pair_rows(cur: DataFrame) -> DataFrame:
    return cur.selectExpr(
        "*", "lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nsym"
    )


def _bpe_round(cur: DataFrame, rank: int) -> tuple[DataFrame, DataFrame]:
    """One BPE merge round: freq-weighted argmax adjacent pair
    (lexicographic tiebreak) → greedy merge. Returns (next-round rows,
    this round's merge-table row)."""
    pr = _pair_rows(cur)
    counts = (
        pr.filter(F.col("nsym").isNotNull())
        .groupBy("sym", "nsym")
        .agg(F.sum("freq").alias("n"))
    )
    best = (
        counts.orderBy(F.desc("n"), F.asc("sym"), F.asc("nsym"))
        .limit(1)
        .select(
            F.col("sym").alias("bl"),
            F.col("nsym").alias("br"),
            F.col("n").alias("bn"),
        )
    )
    merge_row = best.select(
        F.lit(rank).alias("merge_rank"),
        F.col("bl").alias("lhs"),
        F.col("br").alias("rhs"),
        F.concat("bl", "br").alias("merged"),
        F.col("bn").cast("long").alias("n"),
    )
    return _merge_best(pr, best), merge_row


def _wp_round(cur: DataFrame, rank: int) -> tuple[DataFrame, DataFrame]:
    """One WordPiece merge round (Schuster & Nakajima 2012): the pair
    maximizing the LIKELIHOOD score freq(lr) / (freq(l) · freq(r)) —
    the unigram-LM gain of the merge — instead of BPE's raw frequency;
    merge mechanics are identical. The argmax compares the exact
    IEEE-double quotient of integer sums (identical in both engines),
    ties broken lexicographically; the emitted merge table carries the
    integer (n, c_lhs, c_rhs) triple rather than the quotient, so the
    gate hashes exact integers."""
    pr = _pair_rows(cur)
    uni = cur.groupBy("sym").agg(F.sum("freq").alias("c"))
    counts = (
        pr.filter(F.col("nsym").isNotNull())
        .groupBy("sym", "nsym")
        .agg(F.sum("freq").alias("n"))
    )
    scored = (
        counts.join(
            uni.select(F.col("sym").alias("__ls"), F.col("c").alias("cl")),
            F.col("sym") == F.col("__ls"),
        )
        .join(
            uni.select(F.col("sym").alias("__rs"), F.col("c").alias("cr")),
            F.col("nsym") == F.col("__rs"),
        )
        .select("sym", "nsym", "n", "cl", "cr")
    )
    score = F.col("n").cast("double") / (
        F.col("cl").cast("double") * F.col("cr").cast("double")
    )
    best = (
        scored.orderBy(score.desc(), F.asc("sym"), F.asc("nsym"))
        .limit(1)
        .select(
            F.col("sym").alias("bl"),
            F.col("nsym").alias("br"),
            F.col("n").alias("bn"),
            F.col("cl").alias("bcl"),
            F.col("cr").alias("bcr"),
        )
    )
    merge_row = best.select(
        F.lit(rank).alias("merge_rank"),
        F.col("bl").alias("lhs"),
        F.col("br").alias("rhs"),
        F.concat("bl", "br").alias("merged"),
        F.col("bn").cast("long").alias("n"),
        F.col("bcl").cast("long").alias("c_lhs"),
        F.col("bcr").cast("long").alias("c_rhs"),
    )
    return _merge_best(pr, best.select("bl", "br")), merge_row


def _bpe_train_frames(
    spark: SparkSession, sf_dir: str, round_fn=_bpe_round
) -> tuple[list[DataFrame], DataFrame]:
    """Run R_BPE unrolled merge rounds; returns (per-round merge rows,
    final symbol table). Each round's rows are locally checkpointed —
    the relation is word-type-sized, so the materialization is tiny,
    and it keeps the R-round window-plan from stacking in Catalyst."""
    cur = _bpe_initial(spark, sf_dir).localCheckpoint(eager=True)
    merges = []
    for r in range(1, R_BPE + 1):
        cur, mrow = round_fn(cur, r)
        cur = cur.localCheckpoint(eager=True)
        merges.append(mrow)
    return merges, cur


def _bpe_cte_chain(rounds: int, wordpiece: bool = False) -> str:
    """The DuckDB replay of the unrolled trainer: r0 = word types split
    to characters; each round computes the argmax pair (raw frequency
    for BPE; likelihood score n/(c_l·c_r) for WordPiece), marks
    matches, resolves overlap runs by offset parity, merges and
    renumbers — chained MATERIALIZED CTEs (each round is referenced
    twice)."""
    parts = [
        f"""words AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({text.tokens_sql('text')}) AS w FROM documents)
      GROUP BY w),
    r0 AS MATERIALIZED (
      SELECT w, freq, i AS pos, substring(w, i + 1, 1) AS sym
      FROM words, unnest(range(length(w))) AS t(i))"""
    ]
    for r in range(1, rounds + 1):
        if wordpiece:
            best_cte = f"""r{r}_uni AS MATERIALIZED (
      SELECT sym, CAST(sum(freq) AS BIGINT) AS c FROM r{r - 1} GROUP BY sym),
    r{r}_best AS MATERIALIZED (
      SELECT bl, br, bn, ua.c AS bcl, ub.c AS bcr
      FROM (
        SELECT sym AS bl, nsym AS br, CAST(sum(freq) AS BIGINT) AS bn
        FROM r{r}_pairs WHERE nsym IS NOT NULL GROUP BY 1, 2) cnt
      JOIN r{r}_uni ua ON ua.sym = cnt.bl
      JOIN r{r}_uni ub ON ub.sym = cnt.br
      ORDER BY CAST(bn AS DOUBLE) / (CAST(bcl AS DOUBLE) * CAST(bcr AS DOUBLE))
        DESC, bl, br
      LIMIT 1),"""
        else:
            best_cte = f"""r{r}_best AS MATERIALIZED (
      SELECT sym AS bl, nsym AS br, sum(freq) AS bn
      FROM r{r}_pairs WHERE nsym IS NOT NULL
      GROUP BY sym, nsym ORDER BY bn DESC, bl, br LIMIT 1),"""
        parts.append(
            f"""r{r}_pairs AS MATERIALIZED (
      SELECT w, freq, pos, sym,
             lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nsym
      FROM r{r - 1}),
    {best_cte}
    r{r}_sel AS MATERIALIZED (
      SELECT *, m AND (row_number() OVER (PARTITION BY w, grp ORDER BY pos) - 1) % 2 = 0 AS sel
      FROM (
        SELECT *, CASE WHEN m THEN pos - row_number() OVER (PARTITION BY w, m ORDER BY pos) END AS grp
        FROM (
          SELECT p.*, b.bl, b.br,
                 (p.nsym IS NOT NULL AND p.sym = b.bl AND p.nsym = b.br) AS m
          FROM r{r}_pairs p CROSS JOIN r{r}_best b))),
    r{r} AS MATERIALIZED (
      SELECT w, freq,
             CAST(row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS INT) AS pos,
             sym
      FROM (
        SELECT w, freq, pos,
               CASE WHEN sel THEN sym || nsym ELSE sym END AS sym,
               coalesce(lag(sel) OVER (PARTITION BY w ORDER BY pos), FALSE) AS psel
        FROM r{r}_sel) WHERE NOT psel)"""
        )
    return ",\n    ".join(parts)


_BPE_TRAIN_SELECT = " UNION ALL ".join(
    f"SELECT {r} AS merge_rank, bl AS lhs, br AS rhs, bl || br AS merged, "
    f"CAST(bn AS BIGINT) AS n FROM r{r}_best"
    for r in range(1, R_BPE + 1)
)


@query(
    "q_bpe_train",
    oracle=f"""
    WITH {_bpe_cte_chain(R_BPE)}
    {_BPE_TRAIN_SELECT}
    """,
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X598 — the ITERATED BPE trainer (Sennrich et al. 2016), R_BPE
    unrolled merge rounds over the word-type table: each round picks
    the corpus-frequency-weighted argmax adjacent symbol pair
    (lexicographic tiebreak), merges its occurrences greedily
    left-to-right (offset-parity run resolution for L==R chains), and
    the learned merge table — (merge_rank, lhs, rhs, merged, n) — is
    the trained tokenizer. Completes what X168's q_bpe_pairs started
    (one induction step); the DuckDB oracle replays every round with
    the same window-function semantics, so the full training
    trajectory sits under the value-hash gate, like the X74 unrolled
    PageRank.

    Scale: rounds operate on the word-TYPE relation (Heaps-law
    vocabulary-sized); the argmax broadcasts; the corpus is scanned
    once. At 100 TB the dominant cost is the initial word count — one
    map-side-combinable shuffle."""
    merges, _ = _bpe_train_frames(spark, sf_dir)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


@query(
    "q_bpe_encode",
    oracle=f"""
    WITH {_bpe_cte_chain(R_BPE)},
    pieces AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_pieces
      FROM r{R_BPE} GROUP BY w),
    tok AS (
      SELECT doc_id, unnest({text.tokens_sql('text')}) AS w
      FROM documents)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(p.n_pieces) AS BIGINT) AS n_pieces,
           round(sum(p.n_pieces) * 1.0 / count(*), 6) AS pieces_per_token
    FROM tok t JOIN pieces p ON t.w = p.w
    GROUP BY t.doc_id
    """,
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X599 — re-tokenize the corpus with the X598-trained merges:
    the final word→pieces table (one row per word type after R_BPE
    rounds) broadcast-joins to the exploded corpus, yielding per-doc
    token/piece counts and fertility (pieces per token — the tokenizer-
    quality number every multilingual-tokenizer paper reports). The
    train and encode plans share the round machinery, so encode is
    trained-on-this-corpus by construction (vocabulary closure makes
    the inner join complete).

    Scale: encode is ONE broadcast join against a vocabulary-sized
    pieces table — the corpus never shuffles."""
    _, final_rows = _bpe_train_frames(spark, sf_dir)
    pieces = final_rows.groupBy("w").agg(
        F.count("*").cast("long").alias("n_pieces")
    )
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("w"))
    return (
        tok.join(F.broadcast(pieces), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
            F.round(
                F.sum("n_pieces") * F.lit(1.0) / F.count("*"), 6
            ).alias("pieces_per_token"),
        )
    )


# ---------------------------------------------------------------------------
# X600 — deterministic sequence packing (next-fit-decreasing in buckets)
# ---------------------------------------------------------------------------


@query(
    "q_sequence_pack_strict",
    oracle=f"""
    WITH RECURSIVE items AS (
      SELECT doc_id,
             CAST(least(len({text.tokens_sql('text')}), {B_PACK}) AS INT) AS len,
             CAST(doc_id % {N_PACK_BUCKETS} AS INT) AS bucket
      FROM documents),
    ord AS (
      SELECT *, row_number() OVER (
        PARTITION BY bucket ORDER BY len DESC, doc_id) AS rn
      FROM items),
    pack AS (
      SELECT bucket, rn, doc_id, len, 1 AS seq, len AS fill
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.bucket, o.rn, o.doc_id, o.len,
             CASE WHEN p.fill + o.len <= {B_PACK} THEN p.seq ELSE p.seq + 1 END,
             CASE WHEN p.fill + o.len <= {B_PACK} THEN p.fill + o.len ELSE o.len END
      FROM pack p JOIN ord o ON o.bucket = p.bucket AND o.rn = p.rn + 1)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(seq AS INT) AS seq,
           CAST(row_number() OVER (PARTITION BY bucket, seq ORDER BY rn) AS INT) AS slot,
           doc_id,
           CAST(len AS INT) AS len,
           CAST(fill AS INT) AS fill
    FROM pack
    """,
)
def q_sequence_pack_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X600 — STRICT-CAPACITY sequence packing: greedy next-fit-
    decreasing of (budget-capped) documents into fixed-B_PACK-token
    training sequences, independently within N_PACK_BUCKETS doc_id
    buckets, emitting full (bucket, seq, slot, doc_id, len, fill)
    lineage. The existing X267 q_sequence_pack assigns windows by a
    running-sum ceiling, which is two window functions but lets a
    window straddle-overflow by up to one piece; THIS operator never
    exceeds the budget (fill ≤ B_PACK is an invariant of the fold) —
    the guarantee a fixed-context trainer actually requires — at the
    cost of a genuinely sequential per-bucket scan, which is exactly
    why it buckets. Docs longer than the budget are capped (the
    chunking operator X33 is the upstream fix).

    NFD (not first-fit-decreasing) is deliberate: NFD never revisits a
    closed sequence, so the fold is a single ordered scan per bucket —
    replayable row-by-row by the oracle's recursive CTE and streaming-
    friendly — while its waste stays within a constant factor of FFD.

    Spark side: the per-bucket scan is a tiny pandas fold via
    applyInPandas (genuinely sequential semantics — the documented
    Pandas-UDF escape hatch); buckets are independent, so parallelism
    is the bucket count. At 100 TB: bucket by hash(doc_id) into
    O(cluster cores) buckets; each bucket's item list is metadata
    (doc_id + length), NOT text, so a bucket fold touches megabytes
    while the text stays columnar until a final broadcast-join
    materializes sequences."""
    import pandas as pd

    d = load(spark, sf_dir, "documents")
    items = d.select(
        "doc_id",
        F.least(F.size(text.tokens(F.col("text"))), F.lit(B_PACK))
        .cast("int")
        .alias("len"),
        (F.col("doc_id") % N_PACK_BUCKETS).cast("int").alias("bucket"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["len", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        seqs, slots, fills = [], [], []
        seq, fill, slot = 1, 0, 0
        for ln in pdf["len"]:
            if fill + int(ln) > B_PACK:
                seq += 1
                fill = 0
                slot = 0
            fill += int(ln)
            slot += 1
            seqs.append(seq)
            slots.append(slot)
            fills.append(fill)
        return pd.DataFrame(
            {
                "bucket": pdf["bucket"],
                "seq": seqs,
                "slot": slots,
                "doc_id": pdf["doc_id"],
                "len": pdf["len"],
                "fill": fills,
            }
        )

    return items.groupBy("bucket").applyInPandas(
        pack,
        "bucket int, seq int, slot int, doc_id long, len int, fill int",
    )


# ---------------------------------------------------------------------------
# X601 — WordPiece trainer (likelihood-scored merges)
# ---------------------------------------------------------------------------

_WP_TRAIN_SELECT = " UNION ALL ".join(
    f"SELECT {r} AS merge_rank, bl AS lhs, br AS rhs, bl || br AS merged, "
    f"CAST(bn AS BIGINT) AS n, CAST(bcl AS BIGINT) AS c_lhs, "
    f"CAST(bcr AS BIGINT) AS c_rhs FROM r{r}_best"
    for r in range(1, R_BPE + 1)
)


@query(
    "q_wordpiece_train",
    oracle=f"""
    WITH {_bpe_cte_chain(R_BPE, wordpiece=True)}
    {_WP_TRAIN_SELECT}
    """,
)
def q_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X601 — the WordPiece trainer (Schuster & Nakajima 2012, the BERT
    tokenizer): identical merge mechanics to X598 BPE but each round's
    argmax maximizes the unigram-LM LIKELIHOOD GAIN
    freq(lr) / (freq(l) · freq(r)) instead of raw pair frequency —
    rare-but-cohesive pairs merge before frequent-but-independent ones.
    Output is the merge table with the exact integer score components
    (n, c_lhs, c_rhs) so the gate hashes integers while the internal
    argmax compares the exact IEEE quotient (identical across engines
    for identical integer inputs, ties broken lexicographically).

    The BPE/WordPiece pair demonstrates the trainer harness is
    algorithm-parameterized: same word-type factorization, same greedy
    merge, same unrolled-CTE oracle discipline — only the per-round
    scoring CTE differs."""
    merges, _ = _bpe_train_frames(spark, sf_dir, round_fn=_wp_round)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


# ---------------------------------------------------------------------------
# X602 — PRESS / leave-one-out regression diagnostics
# ---------------------------------------------------------------------------


@query(
    "q_press_loo",
    oracle=f"""
    WITH {_DAILY_SQL},
    lev AS (
      SELECT r.flag, r.t, r.e,
             1.0 / s.n + (r.t - s.sx / s.n) * (r.t - s.sx / s.n)
               / (s.sxx - s.sx * s.sx / s.n) AS h
      FROM resid r JOIN sums s ON s.flag = r.flag
    )
    SELECT flag, CAST(count(*) AS BIGINT) AS n_days,
           round(sum((e / (1 - h)) * (e / (1 - h))) / 1e9, 4) AS press_b,
           round(1 - sum((e / (1 - h)) * (e / (1 - h)))
                     / any_value(syy_c), 6) AS r2_pred,
           round(max(h), 6) AS max_leverage
    FROM lev JOIN (
      SELECT flag, syy - sy * sy / n AS syy_c FROM sums) c USING (flag)
    GROUP BY flag
    """,
)
def q_press_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X602 — PRESS (predicted residual error sum of squares) and
    leave-one-out diagnostics for the per-flag daily-revenue OLS trend
    (the same series the X575-X580 diagnostics battery uses): hat
    leverage h_i = 1/n + (t_i − t̄)²/Sxx_c in closed form, LOO residual
    e_i/(1−h_i) WITHOUT refitting n models (the classic hat-matrix
    identity), PRESS = Σ(e_loo)², and predictive R² = 1 − PRESS/SST —
    the honest generalization check an in-sample R² overstates.
    Residuals and sums follow the round-the-sums cross-engine
    discipline shared with X575; PRESS itself is emitted in units of
    1e9 (press_b) because at ~7e13 raw magnitude the engines'
    different summation orders leave ULP noise above a 4-decimal
    rounding — the ratio statistics (r2_pred) are scale-free and
    round at 6.

    Plan: everything derives from the one daily rollup + the 5-row
    broadcast fit — two exchanges at any scale."""
    from .round6 import _daily_series, _ols_fit, _ols_sums, _residuals

    daily = _daily_series(spark, sf_dir)
    sums = _ols_sums(daily)
    fit = _ols_fit(sums)
    resid = _residuals(daily, fit)
    lev = resid.join(
        sums.select(
            "flag",
            "n",
            "sx",
            "sxx",
            (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias(
                "syy_c"
            ),
        ),
        "flag",
    ).withColumn(
        "h",
        1.0 / F.col("n")
        + (F.col("t") - F.col("sx") / F.col("n"))
        * (F.col("t") - F.col("sx") / F.col("n"))
        / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")),
    )
    e_loo2 = (F.col("e") / (1 - F.col("h"))) * (F.col("e") / (1 - F.col("h")))
    return lev.groupBy("flag").agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(F.sum(e_loo2) / 1e9, 4).alias("press_b"),
        F.round(1 - F.sum(e_loo2) / F.any_value("syy_c"), 6).alias(
            "r2_pred"
        ),
        F.round(F.max("h"), 6).alias("max_leverage"),
    )


# ---------------------------------------------------------------------------
# X603 — graph-based ANN (greedy beam search over a k-NN graph)
# ---------------------------------------------------------------------------

from ..operators import ann as _ann  # noqa: E402

_GRAPH_ANN_ORACLE = f"""
    WITH corpus AS (
      SELECT vec_id AS n_id, embedding AS emb FROM embeddings
    ), qs AS (
      SELECT vec_id AS q_id, embedding AS q_emb
      FROM embeddings WHERE vec_id % 25 = 7
    ), cent AS (
      SELECT n_id AS c_id, emb AS c_emb FROM corpus WHERE n_id % 50 = 0
    ), {_ann.graph_ann_sql("corpus", "qs", "cent", k=3, g=8, beam=8, hops=4,
                           nprobe=2)}
    SELECT q_id, n_id, score, CAST(rn AS BIGINT) AS rn FROM gann_topk
    """


@query("q_graph_ann", oracle=_GRAPH_ANN_ORACLE)
def q_graph_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X603 — graph-based ANN: IVF-seeded greedy beam search over an
    IVF-built k-NN graph (operators/ann.graph_ann_search) — the graph
    member that completes the ANN ladder (LSH → IVF → PQ/IVF-PQ →
    graph; the DiskANN-style coarse-seed + graph-refine hybrid). Top-3
    neighbors for every 25th vector (offset 7) through g=8 out-edges,
    beam 8, 4 hops from the query's IVF top-beam seeds; the DuckDB
    twin replays the graph build and the seeding (ivf_search_sql
    embedded twice under different prefixes) and every unrolled hop,
    so search DYNAMICS — not just the final ranking — sit under the
    value-hash gate. On this corpus the walk doubles the seeds'
    recall: IVF nprobe=2 alone 0.25, graph-refined 0.533 (measured by
    X604).

    Scale story in the operator docstring: graph and IVF index are
    persisted builds; per-hop cost is frontier-sized (|Q|·beam joins
    against the edge table), independent of corpus size."""
    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("emb")
    )
    qs = emb.filter(F.col("vec_id") % 25 == 7).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    got = _ann.graph_ann_search(
        corpus, qs, k=3, g=8, beam=8, hops=4, nprobe=2, every=50, residue=0
    )
    return got.select(
        "q_id", "n_id", "score", F.col("rn").cast("long").alias("rn")
    )


_GRAPH_RECALL_ORACLE = f"""
    WITH corpus AS (
      SELECT vec_id AS n_id, embedding AS emb FROM embeddings
    ), qs AS (
      SELECT vec_id AS q_id, embedding AS q_emb
      FROM embeddings WHERE vec_id % 25 = 7
    ), cent AS (
      SELECT n_id AS c_id, emb AS c_emb FROM corpus WHERE n_id % 50 = 0
    ), {_ann.graph_ann_sql("corpus", "qs", "cent", k=3, g=8, beam=8, hops=4,
                           nprobe=2)},
    exact AS (
      SELECT q_id, n_id FROM (
        SELECT q.q_id, x.n_id,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY round({vectors.cosine_sql("q.q_emb", "x.emb")}, 6)
                   DESC, x.n_id) AS rn
        FROM qs q CROSS JOIN corpus x WHERE x.n_id <> q.q_id)
      WHERE rn <= 3)
    SELECT e.q_id,
           CAST(count(g.n_id) AS BIGINT) AS n_hit,
           round(count(g.n_id) / 3.0, 6) AS recall_at_3
    FROM exact e
    LEFT JOIN gann_topk g ON g.q_id = e.q_id AND g.n_id = e.n_id
    GROUP BY e.q_id
    """


@query("q_graph_ann_recall", oracle=_GRAPH_RECALL_ORACLE)
def q_graph_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X604 — recall@3 of the X603 graph search against the exact
    brute-force top-3, per query, MEASURED as a distributed query (the
    family discipline: q_ann_recall / q_ivfpq_recall do this for the
    hash and quantization rungs). The exact side is eval-sample-sized
    (|Q| · n), the documented pattern for recall measurement — the
    serving path never runs it."""
    from ..functions import vectors

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("emb")
    )
    qs = emb.filter(F.col("vec_id") % 25 == 7).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    got = _ann.graph_ann_search(
        corpus, qs, k=3, g=8, beam=8, hops=4, nprobe=2, every=50, residue=0
    ).select("q_id", "n_id")
    ex = qs.crossJoin(corpus).filter(F.col("n_id") != F.col("q_id"))
    ex = ex.withColumn(
        "score", F.round(vectors.cosine("q_emb", "emb"), 6)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), "n_id")
    exact = (
        ex.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "n_id")
    )
    return (
        exact.join(got.withColumn("hit", F.lit(1)), ["q_id", "n_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count("hit").cast("long").alias("n_hit"),
            F.round(F.count("hit") / 3.0, 6).alias("recall_at_3"),
        )
    )


# ---------------------------------------------------------------------------
# X605 — Unigram-LM (SentencePiece-style) Viterbi segmentation
# ---------------------------------------------------------------------------

#: unigram-LM segmenter knobs: max piece length, multi-char vocabulary
#: budget, max word length the unrolled DP covers (corpus max is 8).
PIECE_MAX = 4
V_TOP = 24
SEG_MAXLEN = 9

_UNI_VOCAB_SQL = f"""
    words AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS freq, length(w) AS len
      FROM (SELECT unnest({text.tokens_sql('text')}) AS w FROM documents)
      WHERE length(w) <= {SEG_MAXLEN}
      GROUP BY w),
    occ AS (
      SELECT substring(w.w, s.s, l.l) AS piece, w.freq
      FROM words w,
           unnest(range(1, w.len + 1)) AS s(s),
           unnest(range(1, {PIECE_MAX} + 1)) AS l(l)
      WHERE s.s + l.l - 1 <= w.len),
    piece_freq AS MATERIALIZED (
      SELECT piece, CAST(sum(freq) AS BIGINT) AS pf
      FROM occ GROUP BY piece),
    vocab AS MATERIALIZED (
      SELECT piece, pf FROM piece_freq WHERE length(piece) = 1
      UNION ALL
      SELECT piece, pf FROM (
        SELECT piece, pf FROM piece_freq WHERE length(piece) >= 2
        ORDER BY pf DESC, piece LIMIT {V_TOP})),
    ptab AS MATERIALIZED (
      SELECT piece, CAST(pf AS DOUBLE)
               / (SELECT CAST(sum(pf) AS DOUBLE) FROM vocab) AS p
      FROM vocab)
"""


def _uni_dp_sql(
    maxlen: int, piece_max: int, sfx: str = "", ptab: str = "ptab"
) -> str:
    """One Viterbi chain (dp{sfx}0..dp{sfx}maxlen + dpfin{sfx}),
    parameterized by the probability table so the EM query can run it
    twice. Each dp row carries the chosen piece and its predecessor
    position j — the backpointers the EM E-step walks."""
    parts = [
        f"""dp{sfx}0 AS MATERIALIZED (
      SELECT w, len, 0 AS i, CAST(1.0 AS DOUBLE) AS prob, 0 AS np,
             '' AS piece, 0 AS j
      FROM words)"""
    ]
    for i in range(1, maxlen + 1):
        js = [j for j in range(max(0, i - piece_max), i)]
        prior = " UNION ALL ".join(
            f"SELECT w, len, i, prob, np FROM dp{sfx}{j}" for j in js
        )
        parts.append(
            f"""dp{sfx}{i} AS MATERIALIZED (
      SELECT w, len, i, prob, np, piece, j FROM (
        SELECT c.w, c.len, {i} AS i, c.prob * v.p AS prob,
               c.np + 1 AS np, v.piece, c.i AS j,
               row_number() OVER (PARTITION BY c.w
                 ORDER BY c.prob * v.p DESC, c.np + 1 ASC, c.i DESC) AS rn
        FROM ({prior}) c
        JOIN {ptab} v ON v.piece = substring(c.w, c.i + 1, {i} - c.i)
        WHERE {i} <= c.len)
      WHERE rn = 1)"""
        )
    final = " UNION ALL ".join(
        f"SELECT w, len, prob, np, piece, j FROM dp{sfx}{i} WHERE len = {i}"
        for i in range(1, maxlen + 1)
    )
    parts.append(f"dpfin{sfx} AS ({final})")
    return ",\n    ".join(parts)


@query(
    "q_unigram_segment",
    oracle=f"""
    WITH {_UNI_VOCAB_SQL},
    {_uni_dp_sql(SEG_MAXLEN, PIECE_MAX)}
    SELECT f.w, wd.freq,
           CAST(f.np AS BIGINT) AS n_pieces,
           round(CAST(f.len AS DOUBLE) / f.np, 6) AS avg_piece_len,
           round(log10(f.prob), 6) AS log10_prob
    FROM dpfin f JOIN words wd ON wd.w = f.w
    """,
)
def q_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X605 — Unigram-LM segmentation (the SentencePiece/Kudo 2018
    model, completing the tokenizer trio: X598 BPE, X601 WordPiece,
    X605 Unigram): a substring vocabulary (all single chars for
    coverage + the V_TOP most corpus-frequent multi-char pieces up to
    PIECE_MAX chars) with unigram probabilities p = freq/total, then
    EXACT Viterbi segmentation of every word type — dp[i] = max over
    j of dp[j]·p(w[j+1..i]) — as a POSITION-UNROLLED dynamic program
    (SEG_MAXLEN stages, each joining the previous PIECE_MAX stages
    against the piece table). Argmax compares exact IEEE products
    (multiplication is correctly-rounded and engine-identical), ties
    prefer fewer pieces then the longer final piece; only the EMITTED
    log10(prob) is rounded.

    Scale: the DP runs on the word-TYPE table like the other trainers
    (vocabulary-sized, Heaps' law); each unrolled stage is a
    broadcast-joinable lookup against a V-sized piece table. The
    corpus is scanned once for the counts."""
    words, ptab = _uni_words_ptab(spark, sf_dir)
    fin, _steps = _viterbi_frames(words, ptab)
    return fin.join(
        words.select("w", "freq"), "w"
    ).select(
        "w",
        "freq",
        F.col("np").cast("long").alias("n_pieces"),
        F.round(F.col("len").cast("double") / F.col("np"), 6).alias(
            "avg_piece_len"
        ),
        F.round(F.log10("prob"), 6).alias("log10_prob"),
    )


def _uni_words_ptab(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(word-type table, initial piece-probability table) for the
    unigram-LM family — char coverage + top-V substrings, p = freq/total."""
    # materialize the word-type table: it feeds the DP seed, the
    # substring-occurrence explode AND the final freq joins — without
    # the cut each reference re-runs the corpus tokenization (guide
    # §2.4). NO scan fan-out here: measured variants put checkpoint-only
    # at 2.7 s vs 3.5 s with a repartition before the tokenize (the
    # added exchange of raw documents costs more than the single-split
    # tokenize it parallelizes — the groupBy shuffle already spreads
    # the aggregation).
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(text.tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") <= SEG_MAXLEN)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
        .withColumn("len", F.length("w"))
        .localCheckpoint(eager=True)
    )
    occ = (
        words.select(
            "w",
            "freq",
            "len",
            F.explode(F.sequence(F.lit(1), F.col("len"))).alias("s"),
        )
        .select(
            "w",
            "freq",
            "len",
            "s",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(PIECE_MAX), F.col("len") - F.col("s") + 1),
                )
            ).alias("l"),
        )
        .select(
            F.col("w").substr(F.col("s"), F.col("l")).alias("piece"), "freq"
        )
    )
    piece_freq = occ.groupBy("piece").agg(
        F.sum("freq").cast("long").alias("pf")
    )
    chars = piece_freq.filter(F.length("piece") == 1)
    multi = (
        piece_freq.filter(F.length("piece") >= 2)
        .orderBy(F.desc("pf"), F.asc("piece"))
        .limit(V_TOP)
    )
    vocab = chars.unionByName(multi)
    ptab = _probs_from_counts(vocab)
    return words, ptab


def _probs_from_counts(counts: DataFrame) -> DataFrame:
    """(piece, pf) → checkpointed (piece, p = pf/Σpf) probability table."""
    total = counts.agg(F.sum("pf").cast("double").alias("tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "piece", (F.col("pf").cast("double") / F.col("tot")).alias("p")
        )
        .localCheckpoint(eager=True)
    )


def _viterbi_frames(
    words: DataFrame, ptab: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Viterbi over the word-type table under ``ptab``. Returns
    (fin, steps): fin = the i == len(w) rows (w, len, prob, np, piece,
    j); steps = every stage's argmax row with its chosen piece and
    predecessor position j — the backpointer table the EM E-step walks.

    Implementation: one mapInPandas fold over the word-type table
    (guide §4 — each word's DP is independent, so the per-stage
    unrolled join/window plan's ~20 eager-checkpoint jobs collapse
    into ONE pass; the probability table is vocabulary-bounded and
    travels as a plain dict). The fold replays the former unrolled
    plan EXACTLY: prob chains are the same left-to-right IEEE double
    products (multiplication is correctly rounded, so Python == JVM
    bit-for-bit), the stage winner maximizes (prob·p) with ties to
    fewer pieces then the longer final piece (higher j), and stage i
    draws only on the previous PIECE_MAX stage winners. The DuckDB
    oracle replays the same recurrence and hash-gates every value."""
    pvals = {r["piece"]: r["p"] for r in ptab.collect()}
    maxlen, piece_max = SEG_MAXLEN, PIECE_MAX

    def fold(batches):
        import pandas as pd

        for pdf in batches:
            ws, lens, iis, probs, nps, pieces, js = [], [], [], [], [], [], []
            for w, ln in zip(pdf["w"], pdf["len"]):
                ln = int(ln)
                dp = {0: (1.0, 0)}
                for i in range(1, min(ln, maxlen) + 1):
                    best = None
                    for j in range(max(0, i - piece_max), i):
                        if j not in dp:
                            continue
                        p = pvals.get(w[j:i])
                        if p is None:
                            continue
                        prob = dp[j][0] * p
                        np_ = dp[j][1] + 1
                        key = (prob, -np_, j)
                        if best is None or key > best[0]:
                            best = (key, prob, np_, j, w[j:i])
                    if best is None:
                        continue
                    dp[i] = (best[1], best[2])
                    ws.append(w)
                    lens.append(ln)
                    iis.append(i)
                    probs.append(best[1])
                    nps.append(best[2])
                    pieces.append(best[4])
                    js.append(best[3])
            yield pd.DataFrame(
                {
                    "w": ws,
                    "len": pd.Series(lens, dtype="int32"),
                    "i": pd.Series(iis, dtype="int32"),
                    "prob": pd.Series(probs, dtype="float64"),
                    "np": pd.Series(nps, dtype="int32"),
                    "piece": pieces,
                    "j": pd.Series(js, dtype="int32"),
                }
            )

    allsteps = (
        words.select("w", "len")
        .mapInPandas(
            fold,
            "w string, len int, i int, prob double, np int, piece string,"
            " j int",
        )
        .localCheckpoint(eager=True)  # fin + the EM backtrace reference
        # it many times; one materialization, word-type-sized
    )
    fin = allsteps.filter(F.col("len") == F.col("i"))
    return fin, allsteps


# ---------------------------------------------------------------------------
# X606 — hard-EM refinement of the unigram LM (one full EM round)
# ---------------------------------------------------------------------------


def _uni_bt_sql(maxlen: int) -> str:
    """Backtrace CTEs: walk dpfin's backpointers through the steps
    table (≤ maxlen hops), emitting every chosen piece — the E-step's
    segmentation extraction."""
    parts = [
        "steps AS MATERIALIZED (SELECT w, i, piece, j FROM ("
        + " UNION ALL ".join(
            f"SELECT w, i, piece, j FROM dp{i}" for i in range(1, maxlen + 1)
        )
        + "))",
        "bt0 AS MATERIALIZED (SELECT w, piece, j FROM dpfin)",
    ]
    for k in range(1, maxlen):
        parts.append(
            f"""bt{k} AS MATERIALIZED (
      SELECT b.w, s.piece, s.j
      FROM bt{k - 1} b JOIN steps s ON s.w = b.w AND s.i = b.j
      WHERE b.j > 0)"""
        )
    seg = " UNION ALL ".join(
        f"SELECT w, piece FROM bt{k}" for k in range(maxlen)
    )
    parts.append(f"seg AS MATERIALIZED ({seg})")
    return ",\n    ".join(parts)


@query(
    "q_unigram_em",
    oracle=f"""
    WITH {_UNI_VOCAB_SQL},
    {_uni_dp_sql(SEG_MAXLEN, PIECE_MAX)},
    {_uni_bt_sql(SEG_MAXLEN)},
    seg_counts AS MATERIALIZED (
      SELECT piece, CAST(sum(wd.freq) AS BIGINT) AS pf
      FROM seg JOIN words wd USING (w) GROUP BY piece),
    ptab2 AS MATERIALIZED (
      SELECT piece, CAST(pf AS DOUBLE)
               / (SELECT CAST(sum(pf) AS DOUBLE) FROM seg_counts) AS p
      FROM seg_counts),
    {_uni_dp_sql(SEG_MAXLEN, PIECE_MAX, sfx="b", ptab="ptab2")}
    SELECT f1.w, wd.freq,
           CAST(f1.np AS BIGINT) AS n_pieces_init,
           CAST(f2.np AS BIGINT) AS n_pieces_em,
           round(log10(f1.prob), 6) AS lp_init,
           round(log10(f2.prob), 6) AS lp_em
    FROM dpfin f1
    JOIN dpfinb f2 ON f2.w = f1.w
    JOIN words wd ON wd.w = f1.w
    """,
)
def q_unigram_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X606 — one full HARD-EM round of the X605 unigram LM (the
    training step SentencePiece iterates): E-step = Viterbi segment
    every word type under the initial substring probabilities and
    extract the chosen pieces by walking the DP backpointers (an
    unrolled backtrace — at most SEG_MAXLEN hops); M-step = re-estimate
    piece probabilities from the segmentation's own freq-weighted piece
    counts (the MLE given the hard assignments, which also PRUNES every
    never-chosen piece — SentencePiece's vocabulary-shrinking step);
    then re-segment under the new table. Hard EM guarantees the corpus
    log-likelihood is monotone non-decreasing (p₂ is the MLE for seg₁,
    and Viterbi under p₂ only improves on seg₁) — pinned in
    tests/test_tokenizers.py; the emitted per-word (lp_init, lp_em)
    pairs put both rounds under the value-hash gate.

    Coverage stays guaranteed without chars: every word's round-1
    segmentation survives into the round-2 vocabulary by construction.
    Scale: two Viterbi chains + one vocabulary-sized recount — same
    word-type factorization as the rest of the trainer family."""
    words, ptab1 = _uni_words_ptab(spark, sf_dir)
    fin1, steps1 = _viterbi_frames(words, ptab1)
    stepsl = steps1.select("w", "i", "piece", "j")
    cur = fin1.select("w", "piece", "j")
    seg_frames = [cur.select("w", "piece")]
    for _ in range(SEG_MAXLEN - 1):
        cur = (
            cur.filter(F.col("j") > 0)
            .select("w", F.col("j").alias("i"))
            .join(stepsl, ["w", "i"])
            .select("w", "piece", "j")
        )
        seg_frames.append(cur.select("w", "piece"))
    seg = seg_frames[0]
    for s in seg_frames[1:]:
        seg = seg.unionByName(s)
    counts = (
        seg.join(words.select("w", "freq"), "w")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("pf"))
    )
    ptab2 = _probs_from_counts(counts)
    fin2, _ = _viterbi_frames(words, ptab2)
    return (
        fin1.select(
            "w",
            F.col("np").alias("np1"),
            F.col("prob").alias("prob1"),
        )
        .join(
            fin2.select(
                "w", F.col("np").alias("np2"), F.col("prob").alias("prob2")
            ),
            "w",
        )
        .join(words.select("w", "freq"), "w")
        .select(
            "w",
            "freq",
            F.col("np1").cast("long").alias("n_pieces_init"),
            F.col("np2").cast("long").alias("n_pieces_em"),
            F.round(F.log10("prob1"), 6).alias("lp_init"),
            F.round(F.log10("prob2"), 6).alias("lp_em"),
        )
    )


# ---------------------------------------------------------------------------
# X608 — betweenness centrality (sampled-source, depth-bounded Brandes)
# ---------------------------------------------------------------------------

from .graph_ext import _EDGES_SQL, _edges  # noqa: E402

#: Brandes sampling: every 50th supplier is a source; BFS horizon.
BC_EVERY = 50
BC_DEPTH = 3

_BC_ORACLE = f"""
    WITH {_EDGES_SQL},
    srcs AS MATERIALIZED (
      SELECT DISTINCT a AS src FROM e0 WHERE (a / 2) % {BC_EVERY} = 1),
    f0 AS MATERIALIZED (
      SELECT src, src AS v, CAST(1 AS BIGINT) AS sigma FROM srcs),
    f1 AS MATERIALIZED (
      SELECT f.src, e.b AS v, CAST(sum(f.sigma) AS BIGINT) AS sigma
      FROM f0 f JOIN sym e ON e.a = f.v
      WHERE e.b NOT IN (SELECT v FROM f0 WHERE f0.src = f.src)
      GROUP BY f.src, e.b),
    f2 AS MATERIALIZED (
      SELECT f.src, e.b AS v, CAST(sum(f.sigma) AS BIGINT) AS sigma
      FROM f1 f JOIN sym e ON e.a = f.v
      WHERE NOT EXISTS (SELECT 1 FROM f0 p WHERE p.src = f.src AND p.v = e.b)
        AND NOT EXISTS (SELECT 1 FROM f1 p WHERE p.src = f.src AND p.v = e.b)
      GROUP BY f.src, e.b),
    f3 AS MATERIALIZED (
      SELECT f.src, e.b AS v, CAST(sum(f.sigma) AS BIGINT) AS sigma
      FROM f2 f JOIN sym e ON e.a = f.v
      WHERE NOT EXISTS (SELECT 1 FROM f0 p WHERE p.src = f.src AND p.v = e.b)
        AND NOT EXISTS (SELECT 1 FROM f1 p WHERE p.src = f.src AND p.v = e.b)
        AND NOT EXISTS (SELECT 1 FROM f2 p WHERE p.src = f.src AND p.v = e.b)
      GROUP BY f.src, e.b),
    d2 AS MATERIALIZED (
      SELECT v2.src, v2.v,
             sum(CAST(v2.sigma AS DOUBLE) / v3.sigma) AS delta
      FROM f2 v2
      JOIN sym e ON e.a = v2.v
      JOIN f3 v3 ON v3.src = v2.src AND v3.v = e.b
      GROUP BY v2.src, v2.v),
    d1 AS MATERIALIZED (
      SELECT v1.src, v1.v,
             sum(CAST(v1.sigma AS DOUBLE) / v2.sigma
                 * (1 + coalesce(dd.delta, 0))) AS delta
      FROM f1 v1
      JOIN sym e ON e.a = v1.v
      JOIN f2 v2 ON v2.src = v1.src AND v2.v = e.b
      LEFT JOIN d2 dd ON dd.src = v2.src AND dd.v = v2.v
      GROUP BY v1.src, v1.v)
    SELECT v, round(sum(delta), 6) AS bc
    FROM (SELECT src, v, delta FROM d1
          UNION ALL SELECT src, v, delta FROM d2)
    GROUP BY v
    """


@query("q_betweenness", oracle=_BC_ORACLE)
def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X608 — betweenness centrality by SAMPLED-SOURCE, DEPTH-BOUNDED
    Brandes (the missing centrality next to X74 PageRank / X100 degree
    / round-5 harmonic): from every BC_EVERY-th supplier, a forward
    BFS accumulates shortest-path counts σ per level (exact integers),
    then the backward dependency pass folds δ(v) = Σ σ(v)/σ(w)·(1+δ(w))
    level by level; bc(v) = Σ_sources δ(v). Both passes are unrolled
    join+aggregate supersteps on the integer-keyed shipment graph —
    one vertex-keyed shuffle each, no driver-side adjacency — and the
    DuckDB twin replays σ and δ exactly.

    Sampling sources and bounding depth is THE published scale recipe
    for betweenness (Brandes-Pich 2007): exact Brandes is O(V·E),
    hopeless at 100 TB, while k sampled sources cost k bounded BFS
    sweeps and estimate bc up to a known bound. On this dense bipartite
    graph depth 3 covers the reachable set. δ sums are doubles (σ
    ratios); they round to 6 only at the output."""
    # hash-partition the edge table by its join key ONCE: every forward
    # superstep and every backward-pass join probes sym on `a`, so the
    # persisted partitioning lets all 6+ joins reuse one exchange
    # instead of re-shuffling the edge table per level (guide §2.4)
    sym = (
        _edges(spark, sf_dir)
        .repartition(default_parallelism(), "a")
        .persist()
    )
    srcs = (
        sym.select(F.col("a").alias("src"))
        .filter(((F.col("src") / 2) % BC_EVERY == 1) & (F.col("src") % 2 == 0))
        .distinct()
    )
    f = [
        srcs.select(
            "src", F.col("src").alias("v"), F.lit(1).cast("long").alias("sigma")
        ).localCheckpoint(eager=True)
    ]
    for _ in range(BC_DEPTH):
        visited = f[0].select("src", "v")
        for fr in f[1:]:
            visited = visited.unionByName(fr.select("src", "v"))
        nxt = (
            f[-1]
            .join(sym, f[-1]["v"] == sym["a"])
            .select("src", F.col("b").alias("v"), "sigma")
            # aggregate FIRST, anti-join the (visited-set) group-key
            # filter on the collapsed frame: σ sums are exact integers
            # and the filter is on the group key, so order is
            # immaterial — but the old order shuffled the full
            # frontier×edge expansion (~12M rows at the deepest level)
            # through the anti-join before collapsing it (guide §2.3
            # aggregate before you shuffle)
            .groupBy("src", "v")
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .join(visited, ["src", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        f.append(nxt)

    # backward dependency accumulation, deepest level first. Join
    # order: the (deeper, smaller) n-side frontier joins the edge
    # table on the partitioned key first, then the c-side frontier
    # attaches by BROADCAST — the old order shuffled the full
    # frontier×edge expansion by (src, b) to meet n (guide §3.1/§3.3).
    # Per-pair contrib arithmetic is character-identical; only the
    # execution order of the (unchanged) addend set moves, which the
    # query's 6-dp-rounded output already tolerates (F.sum order is
    # partitioning-dependent in any plan).
    deltas: dict[int, DataFrame] = {}
    for lvl in range(BC_DEPTH - 1, 0, -1):
        cur, nxt = f[lvl], f[lvl + 1]
        n_side = nxt.alias("n")
        if lvl + 1 in deltas:
            dn = deltas[lvl + 1].select(
                F.col("src").alias("dsrc"),
                F.col("v").alias("dv"),
                F.col("delta").alias("ddelta"),
            )
            n_side = n_side.join(
                dn,
                (F.col("dsrc") == F.col("n.src"))
                & (F.col("dv") == F.col("n.v")),
                "left",
            )
            contrib = (
                F.col("c.sigma").cast("double") / F.col("n.sigma")
            ) * (1 + F.coalesce(F.col("ddelta"), F.lit(0.0)))
        else:
            contrib = F.col("c.sigma").cast("double") / F.col("n.sigma")
        # sym is symmetric, so "edges c→n" ≡ rows (a=n.v, b=c.v): the
        # join below probes sym on its partitioned key `a`
        succ = n_side.join(sym, F.col("n.v") == sym["a"]).join(
            F.broadcast(cur.alias("c")),
            (F.col("c.src") == F.col("n.src"))
            & (F.col("c.v") == F.col("b")),
        )
        deltas[lvl] = (
            succ.groupBy(F.col("c.src").alias("src"), F.col("c.v").alias("v"))
            .agg(F.sum(contrib).alias("delta"))
            .localCheckpoint(eager=True)
        )

    alld = deltas[1]
    for lvl in range(2, BC_DEPTH):
        alld = alld.unionByName(deltas[lvl])
    return alld.groupBy("v").agg(F.round(F.sum("delta"), 6).alias("bc"))
