"""Round-8 additions (X613+): byte-level BPE — the GPT-2-style rung of
the tokenizer ladder (round-7 verdict "Next round" #5).

Reference scope note: the reference pipeline (kafka_s.py) has no
tokenizer surface; these are §2.13 LLM-data-pipeline mandate
components, reference-free by design.

Byte-level BPE (Radford et al. 2019, GPT-2) differs from the X598
character trainer in its ALPHABET: every word type is first serialized
to its UTF-8 bytes, so the base vocabulary is the 256 byte values and
NOTHING is ever out-of-vocabulary — an unseen word simply stops
merging and falls back to raw bytes.  Symbols here are lowercase hex
byte pairs ("74", "68", …) and a merged symbol is their concatenation
("7468"), which keeps every intermediate value an exact string both
engines hash identically.

The trainer reuses the X598 round machinery verbatim (freq-weighted
argmax pair, greedy left-to-right merge with offset-parity overlap
resolution, unrolled rounds with per-stage localCheckpoint — the
load-bearing discipline measured in round 7); only the initial
splitter changes.  The fallback ENCODER is the genuinely new piece:
it applies the learned merge table to a FOREIGN vocabulary (part-name
word types, disjoint from the document corpus beyond a few shared
words) by replaying each merge rule in rank order — one greedy pass
per rule, which is exact because merging (L, R) into LR can never
create a new (L, R) adjacency.  Words the trainer never saw keep
their unmerged bytes: measurable byte fallback, the pressure X399
quantified per-language, now exercised by a real encoder.

Scale: identical to X598 — training folds the word-TYPE relation
(Heaps-law vocabulary-sized, ~31 types here, ~byte-length rows after
the split), the corpus is scanned once for word counts; the encoder
is R sequential window passes over the target vocabulary (16 part
words), then a broadcast join if applied corpus-wide.  At 100 TB the
dominant cost stays the initial word count — one map-side-combinable
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text
from ..sources.tables import load
from .registry import query
from .round7 import _bpe_round, _merge_best, _pair_rows

#: Unrolled byte-BPE merge rounds (kept independent of round7.R_BPE so
#: the two trainers' oracles can evolve separately).
R_BYTE = 6


def _byte_split(words: DataFrame) -> DataFrame:
    """(w, freq) -> (w, freq, pos, sym): UTF-8 byte serialization as
    lowercase hex pairs — the byte-level analog of round7._bpe_initial."""
    return words.select(
        "w",
        "freq",
        F.posexplode(
            F.regexp_extract_all(
                F.lower(F.hex(F.encode(F.col("w"), "UTF-8"))),
                F.lit(".."),
                0,
            )
        ).alias("pos", "sym"),
    )


def _doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(text.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _part_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.select(F.explode(text.tokens(F.col("p_name"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _byte_train_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[list[DataFrame], DataFrame]:
    """R_BYTE unrolled byte-level merge rounds over the document
    word-type table; returns (per-round merge rows, final symbols)."""
    cur = _byte_split(_doc_words(spark, sf_dir)).localCheckpoint(eager=True)
    merges = []
    for r in range(1, R_BYTE + 1):
        cur, mrow = _bpe_round(cur, r)
        cur = cur.localCheckpoint(eager=True)
        merges.append(mrow.localCheckpoint(eager=True))
    return merges, cur


# --- DuckDB replay ---------------------------------------------------------

_BYTE_SPLIT_SQL = """
      SELECT w, freq, CAST(i AS INT) AS pos,
             substring(h, CAST(2 * i + 1 AS INT), 2) AS sym
      FROM (SELECT w, freq, lower(hex(encode(w))) AS h FROM {src}),
           unnest(range(CAST(length(h) // 2 AS BIGINT))) AS t(i)"""


def _merge_pass_sql(prev: str, best: str, out: str) -> str:
    """One greedy merge application (the X598 sel/psel window replay),
    parameterized by which CTE supplies the (bl, br) rule — the argmax
    CTE during training, a TRAINED round's rule during fallback
    encoding."""
    return f"""{out}_pairs AS MATERIALIZED (
      SELECT w, freq, pos, sym,
             lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nsym
      FROM {prev}),
    {out}_sel AS MATERIALIZED (
      SELECT *, m AND (row_number() OVER (PARTITION BY w, grp ORDER BY pos) - 1) % 2 = 0 AS sel
      FROM (
        SELECT *, CASE WHEN m THEN pos - row_number() OVER (PARTITION BY w, m ORDER BY pos) END AS grp
        FROM (
          SELECT p.*, b.bl, b.br,
                 (p.nsym IS NOT NULL AND p.sym = b.bl AND p.nsym = b.br) AS m
          FROM {out}_pairs p CROSS JOIN {best} b))),
    {out} AS MATERIALIZED (
      SELECT w, freq,
             CAST(row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS INT) AS pos,
             sym
      FROM (
        SELECT w, freq, pos,
               CASE WHEN sel THEN sym || nsym ELSE sym END AS sym,
               coalesce(lag(sel) OVER (PARTITION BY w ORDER BY pos), FALSE) AS psel
        FROM {out}_sel) WHERE NOT psel)"""


def _byte_train_ctes(rounds: int) -> str:
    parts = [
        f"""bwords AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({text.tokens_sql('text')}) AS w FROM documents)
      GROUP BY w),
    b0 AS MATERIALIZED ({_BYTE_SPLIT_SQL.format(src='bwords')})"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""b{r}_best AS MATERIALIZED (
      SELECT sym AS bl, nsym AS br, sum(freq) AS bn
      FROM (SELECT w, freq, pos, sym,
                   lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nsym
            FROM b{r - 1})
      WHERE nsym IS NOT NULL
      GROUP BY sym, nsym ORDER BY bn DESC, bl, br LIMIT 1),
    {_merge_pass_sql(f'b{r - 1}', f'b{r}_best', f'b{r}')}"""
        )
    return ",\n    ".join(parts)


_BYTE_TRAIN_SELECT = " UNION ALL ".join(
    f"SELECT {r} AS merge_rank, bl AS lhs, br AS rhs, bl || br AS merged, "
    f"CAST(bn AS BIGINT) AS n FROM b{r}_best"
    for r in range(1, R_BYTE + 1)
)


@query(
    "q_bpe_bytes",
    oracle=f"""
    WITH {_byte_train_ctes(R_BYTE)}
    {_BYTE_TRAIN_SELECT}
    """,
)
def q_bpe_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X613 — byte-level BPE trainer (GPT-2 rung of the X598 ladder):
    word types serialize to UTF-8 bytes (lowercase hex-pair symbols)
    before R_BYTE unrolled freq-weighted merge rounds — same round
    machinery, 256-value base alphabet, so the trained tokenizer has
    no OOV by construction.  Output = the learned merge table
    (merge_rank, lhs, rhs, merged, n) in byte-symbol space; the DuckDB
    oracle replays every round (hex serialization included), putting
    the full byte-level training trajectory under the value-hash gate.
    Fertility vs the character trainer is measured by X614."""
    merges, _ = _byte_train_frames(spark, sf_dir)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _byte_fallback_ctes() -> str:
    """Training chain + fallback-encode chain: e0 = part-name word
    types byte-split, e{r} = merge rule b{r}_best applied (rank
    order)."""
    parts = [
        _byte_train_ctes(R_BYTE),
        f"""pwords AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({text.tokens_sql('p_name')}) AS w FROM part)
      GROUP BY w),
    e0 AS MATERIALIZED ({_BYTE_SPLIT_SQL.format(src='pwords')})""",
    ]
    for r in range(1, R_BYTE + 1):
        parts.append(_merge_pass_sql(f"e{r - 1}", f"b{r}_best", f"e{r}"))
    return ",\n    ".join(parts)


@query(
    "q_byte_fallback_encode",
    oracle=f"""
    WITH {_byte_fallback_ctes()}
    SELECT e.w,
           CAST(max(e.freq) AS BIGINT) AS freq,
           CAST(octet_length(encode(max(e.w))) AS BIGINT) AS n_bytes,
           CAST(count(*) AS BIGINT) AS n_pieces,
           CAST(sum(CASE WHEN length(e.sym) = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_raw_bytes,
           CAST(CASE WHEN bw.w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS oov
    FROM e{R_BYTE} e LEFT JOIN bwords bw ON bw.w = e.w
    GROUP BY e.w, bw.w
    """,
)
def q_byte_fallback_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X614 — byte-fallback encoding with the X613-trained merges: the
    part-name vocabulary (FOREIGN to the training corpus beyond a few
    shared words) is byte-split and every learned merge rule is
    applied in rank order — one greedy left-to-right pass per rule,
    exact because a (L, R)→LR merge can never create a new (L, R)
    adjacency.  Unseen words stop merging and keep raw single bytes:
    per word type the output counts total pieces, surviving raw bytes
    (length-2 hex symbols) and an OOV flag, so the fallback pressure
    X399 estimated is here MEASURED by a real encoder.  The oracle
    replays training AND all R_BYTE application passes."""
    merges, _ = _byte_train_frames(spark, sf_dir)
    cur = _byte_split(_part_words(spark, sf_dir)).localCheckpoint(eager=True)
    for m in merges:
        rule = m.select(F.col("lhs").alias("bl"), F.col("rhs").alias("br"))
        cur = _merge_best(_pair_rows(cur), rule).localCheckpoint(eager=True)
    train_vocab = _doc_words(spark, sf_dir).select("w").withColumn(
        "seen", F.lit(1)
    )
    return (
        cur.groupBy("w")
        .agg(
            F.max("freq").cast("long").alias("freq"),
            F.octet_length(F.max("w")).cast("long").alias("n_bytes"),
            F.count("*").cast("long").alias("n_pieces"),
            F.sum((F.length("sym") == 2).cast("int"))
            .cast("long")
            .alias("n_raw_bytes"),
        )
        .join(F.broadcast(train_vocab), "w", "left")
        .select(
            "w",
            "freq",
            "n_bytes",
            "n_pieces",
            "n_raw_bytes",
            F.when(F.col("seen").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("oov"),
        )
    )
