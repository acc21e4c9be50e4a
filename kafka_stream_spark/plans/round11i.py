"""Round-11 batch I (X766): DGIM sliding-window counting sketch.

Reference scope note: §2.13 mandate extensions, reference-free — the
bounded-memory answer to "how many 1s in the last N stream elements"
(Datar-Gionis-Indyk-Motwani 2002): O(log²N) bucket state instead of
an N-bit window, with a guaranteed ≤50% error — the sketch behind
sliding-window rates/counters when the window can't be buffered.

Determinism: the fold is pure integer bucket arithmetic (timestamps +
power-of-two sizes; merge the two OLDEST when a size class reaches
3); the recursive-CTE oracle replays the identical cascade, each of
the log₂-bounded merge layers generated as one nested derived table.
Gate cap carried in schema (the q_elo_ratings discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

_DGIM_N = 128  # window length (stream steps)
_DGIM_LEVELS = 8  # merge-cascade depth (sizes 1..2^7; 2^8 > N)
_DGIM_THRESH = 100.0  # x_t = 1 if value > threshold
_DGIM_GATE_STEPS = 300


def dgim_fold(xs, n: int = _DGIM_N, state=None):
    """DGIM over a 0/1 iterable: returns (bts, bsz, t) — bucket END
    timestamps (ascending) and power-of-two sizes, plus the final step
    index.  Update: expire buckets older than t−N, append a size-1
    bucket on a 1, then cascade-merge the two OLDEST buckets of any
    size class that reaches 3 (merged bucket keeps the NEWER
    timestamp).  Estimate = Σ sizes − oldest/2, true count within
    ±50% (DGIM Thm).  ``state`` resumes from (bts, bsz, t)."""
    if state is not None:
        bts, bsz, t = list(state[0]), list(state[1]), state[2]
    else:
        bts, bsz, t = [], [], 0
    for x in xs:
        t += 1
        while bts and bts[0] <= t - n:
            bts.pop(0)
            bsz.pop(0)
        if x == 1:
            bts.append(t)
            bsz.append(1)
            s = 1
            while bsz.count(s) >= 3:
                p1 = bsz.index(s)
                p2 = bsz.index(s, p1 + 1)
                # merge the two oldest of size s: keep the newer ts
                del bts[p1], bsz[p1]
                bsz[p2 - 1] = 2 * s
                s *= 2
    return bts, bsz, t


def dgim_estimate(bsz) -> int:
    return sum(bsz) - bsz[0] // 2 if bsz else 0


def _dgim_layer_sql(s: int, ts_in: str, sz_in: str, ts_out: str,
                    sz_out: str) -> str:
    """One cascade layer: if ≥3 buckets of size ``s`` exist, merge the
    two oldest (remove the first, double the second — which keeps the
    newer timestamp and preserves ascending-ts order)."""
    p1 = f"list_position({sz_in}, {s})"
    return f"""
      CASE WHEN len(list_filter({sz_in}, z -> z = {s})) >= 3 THEN
        list_concat({ts_in}[1:{p1} - 1], {ts_in}[{p1} + 1:])
      ELSE {ts_in} END AS {ts_out},
      CASE WHEN len(list_filter({sz_in}, z -> z = {s})) >= 3 THEN
        list_transform(
          list_concat({sz_in}[1:{p1} - 1], {sz_in}[{p1} + 1:]),
          z -> z)
      ELSE {sz_in} END AS _pre_{sz_out},
      CASE WHEN len(list_filter({sz_in}, z -> z = {s})) >= 3 THEN
        {p1} + list_position({sz_in}[{p1} + 1:], {s}) - 1
      ELSE CAST(0 AS BIGINT) END AS _mp_{sz_out}"""


def _dgim_oracle() -> str:
    n, cap = _DGIM_N, _DGIM_GATE_STEPS
    # build the nested cascade: each level is one derived-table layer
    # computing (ts, pre-sz, merge-pos) then one finishing the doubling
    inner = f"""
          SELECT st.event_type, st.step, q.x,
                 CASE WHEN q.x = 1
                   THEN list_append(exp_ts, CAST(st.step + 1 AS BIGINT))
                   ELSE exp_ts END AS ts0,
                 CASE WHEN q.x = 1
                   THEN list_append(exp_sz, CAST(1 AS BIGINT))
                   ELSE exp_sz END AS sz0
          FROM (
            SELECT st.*,
                   list_transform(
                     list_filter(range(1, len(st.bts) + 1),
                                 i -> st.bts[i] > st.step + 1 - {n}),
                     i -> st.bts[i]) AS exp_ts,
                   list_transform(
                     list_filter(range(1, len(st.bts) + 1),
                                 i -> st.bts[i] > st.step + 1 - {n}),
                     i -> st.bsz[i]) AS exp_sz
            FROM st
          ) st JOIN s q
            ON q.event_type = st.event_type AND q.gn = st.step + 1
          WHERE st.step < {cap}"""
    lvl_sql = f"(\n{inner}\n          ) l0"
    for lv in range(_DGIM_LEVELS):
        s = 2**lv
        layer = _dgim_layer_sql(
            s, f"ts{lv}", f"sz{lv}", f"ts{lv + 1}", f"szf{lv + 1}"
        )
        lvl_sql = f"""(
        SELECT event_type, step, x, ts{lv + 1},
               CASE WHEN _mp_szf{lv + 1} > 0 THEN
                 list_transform(
                   range(1, len(_pre_szf{lv + 1}) + 1),
                   i -> CASE WHEN i = _mp_szf{lv + 1}
                             THEN CAST({2 * s} AS BIGINT)
                             ELSE _pre_szf{lv + 1}[i] END)
               ELSE _pre_szf{lv + 1} END AS sz{lv + 1}
        FROM (
          SELECT event_type, step, x, {layer}
          FROM {lvl_sql}
        ) m{lv}
        ) l{lv + 1}"""
    top = _DGIM_LEVELS
    return f"""
    WITH RECURSIVE s AS (
      SELECT event_type,
             CASE WHEN value > {_DGIM_THRESH} THEN 1 ELSE 0 END AS x,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS gn
      FROM events),
    st AS (
      SELECT event_type, 0 AS step,
             CAST([] AS BIGINT[]) AS bts,
             CAST([] AS BIGINT[]) AS bsz
      FROM (SELECT DISTINCT event_type FROM s)
      UNION ALL
      SELECT event_type, step + 1, ts{top}, sz{top}
      FROM {lvl_sql}
      ),
    fin AS (
      SELECT event_type, bts, bsz, step,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY step DESC) AS rk
      FROM st),
    est AS (
      SELECT event_type, step,
             CAST(len(bsz) AS BIGINT) AS n_buckets,
             CAST(CASE WHEN len(bsz) = 0 THEN 0
                  ELSE list_sum(bsz) - bsz[1] // 2 END AS BIGINT)
               AS est_ones
      FROM fin WHERE rk = 1),
    exact AS (
      SELECT event_type,
             CAST(sum(x) AS BIGINT) AS exact_ones
      FROM (
        SELECT event_type, x,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY gn DESC) AS rn
        FROM s WHERE gn <= {cap})
      WHERE rn <= {n} AND rn <= (SELECT max(step) FROM est)
      GROUP BY event_type)
    SELECT e.event_type, e.n_buckets, e.est_ones,
           coalesce(x.exact_ones, 0) AS exact_ones,
           CAST(abs(e.est_ones - coalesce(x.exact_ones, 0)) * 2
                <= coalesce(x.exact_ones, 0)
                OR e.est_ones = coalesce(x.exact_ones, 0)
                AS BIGINT) AS within_bound,
           CAST({cap} AS BIGINT) AS gate_steps_cap
    FROM est e LEFT JOIN exact x ON x.event_type = e.event_type
    ORDER BY e.event_type
    """


@query("q_dgim", oracle=_dgim_oracle())
def q_dgim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X766 — DGIM sliding-window ones-counting sketch (Datar et al.
    2002) per event_type: O(log²N) exponentially-sized buckets answer
    "how many 1s in the last {_DGIM_N} steps" with ≤50% error,
    without buffering the window — the sketch behind sliding-window
    rate counters in stream processors.  The output joins the EXACT
    window count and pins the guarantee (within_bound = 1).

    Order-dependent integer fold (expire → append → cascade-merge the
    two oldest of any size class reaching 3) — ONE applyInPandas per
    stream; the recursive-CTE oracle replays the identical cascade
    with each of the {_DGIM_LEVELS} log-bounded merge layers unrolled
    as a nested derived table.  Gate cap {_DGIM_GATE_STEPS} carried in
    schema.

    Scale: state is ≤ 2·log₂N buckets per stream however long the
    stream; streams partition the shuffle."""
    from pyspark.sql.window import Window as W

    s = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.when(F.col("value") > _DGIM_THRESH, 1)
            .otherwise(0)
            .alias("x"),
            "ts",
            "event_id",
        )
        .withColumn(
            "gn",
            F.row_number().over(
                W.partitionBy("event_type").orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("gn") <= _DGIM_GATE_STEPS)
    )

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values("gn")
        xs = [int(x) for x in pdf["x"]]
        bts, bsz, t = dgim_fold(iter(xs))
        win = xs[-min(_DGIM_N, len(xs)):]
        exact = sum(win)
        est = dgim_estimate(bsz)
        ok = 1 if (abs(est - exact) * 2 <= exact or est == exact) else 0
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_buckets": [len(bsz)],
                "est_ones": [est],
                "exact_ones": [exact],
                "within_bound": [ok],
            }
        )

    out = s.groupBy("event_type").applyInPandas(
        fold,
        schema=(
            "event_type string, n_buckets long, est_ones long, "
            "exact_ones long, within_bound long"
        ),
    )
    return out.withColumn(
        "gate_steps_cap", F.lit(_DGIM_GATE_STEPS).cast("long")
    ).orderBy("event_type")
