"""Round-11 batch A (X748): the persisted-IVF-index serving path as a
first-class, gate-pinned operator.

Reference scope note: §2.13 mandate extensions (similarity search),
reference-free — the reference (1,735 LoC Kafka consumer) has no
similarity surface; this is the 100-TB mandate path.

- X748 q_ann_ivf_indexed: top-k cosine search served ENTIRELY from a
  persisted ``operators/ann.build_ivf_index`` layout (√n-spacing
  deterministic codebook + inverted lists partitioned by centroid) —
  the production deployment the round-10 64× probes demanded: the
  build-each-run every=50 codebook grows linearly with the corpus, so
  corpus-sized query sets pay n·(n/50) routing (measured exponent
  1.02, quadratic); the persisted √n index amortizes the build into
  corpus state and measured 0.69.  Round 11 promotes that twin from
  tools/scale_probe.py into operators/ann.py where every routed
  family inherits it (VERDICT r10 "Next #3").

Determinism contract: the codebook is the floor(sqrt(n)) modulus rule
(ann.sqrt_every — IEEE-double sqrt, bit-identical in Spark and
DuckDB), assignment/probe/top-k tie-breaks and 6-digit score rounding
as everywhere else in the ANN stack, so the DuckDB oracle replays the
full routed search including the index's contents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ann as _ann
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X748 — persisted-IVF-index top-k search (the serving path, gate-pinned)
# ---------------------------------------------------------------------------

_IVFX_K = 5
_IVFX_NPROBE = 2
#: query batch = every 17th vector (mod 3) — serving-shaped (|Q| ≪ n)
_IVFX_QMOD, _IVFX_QRES = 17, 3

_SQRT_EVERY_SQL = (
    "greatest(2, CAST(floor(sqrt(CAST((SELECT count(*) FROM corpus) "
    "AS DOUBLE))) AS BIGINT))"
)

_IVFX_ORACLE = f"""
    WITH corpus AS (
      SELECT vec_id AS n_id, embedding AS emb FROM embeddings),
    qs AS (
      SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
      WHERE vec_id % {_IVFX_QMOD} = {_IVFX_QRES}),
    cent AS (
      SELECT n_id AS c_id, emb AS c_emb FROM corpus
      WHERE n_id % {_SQRT_EVERY_SQL} = 0),
    {_ann.ivf_search_sql("corpus", "qs", "cent",
                         k=_IVFX_K, nprobe=_IVFX_NPROBE, prefix="ix_")}
    SELECT q_id, n_id, score, CAST(rn AS BIGINT) AS rn
    FROM ix_topk
    """


def ensure_embedding_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-once accessor for the embeddings corpus' persisted IVF
    index (√n modulus codebook, residue 0): returns the index dir,
    building it on first touch.  Shared by every gate key that serves
    from the index, so one build amortizes across the whole round —
    exactly the corpus-state contract deployed at 100 TB."""
    corpus = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("emb")
    )
    n = corpus.count()
    idx = _ann.default_index_dir(sf_dir, "embeddings", n)
    _ann.build_ivf_index(corpus, idx, every=_ann.sqrt_every(n))
    return idx


@query("q_ann_ivf_indexed", oracle=_IVFX_ORACLE)
def q_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X748 — IVF top-k search served from the PERSISTED index: the
    steady-state production path where the codebook + inverted lists
    are corpus state (built once by operators/ann.build_ivf_index,
    √n-spacing deterministic codebook) and a serving-shaped query
    batch (every {_IVFX_QMOD}th vector) routes through nprobe={_IVFX_NPROBE}
    lists to exact-rerank ~nprobe·√n candidates per query.

    This key pins the WHOLE contract, not just the math: the DuckDB
    oracle independently reconstructs the index contents (same
    floor-sqrt modulus rule) and replays routing + re-rank, so a bug
    in either the persisted layout (e.g. the partition-column type
    narrowing ann._read_assigned guards) or the search would
    hash-mismatch.  tests/test_ann.py pins that serving does NOT
    rebuild (index mtime unchanged across searches).

    Scale: build is one corpus scan against a broadcast codebook,
    amortized across every search and every routed family
    (ensure_embedding_index); search reads only the probed lists'
    parquet files (layout partitioned by centroid_id) — |Q|·nprobe·√n
    work however large the corpus."""
    idx = ensure_embedding_index(spark, sf_dir)
    qs = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % _IVFX_QMOD == _IVFX_QRES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
    )
    return _ann.ivf_search_indexed(
        spark, idx, qs, k=_IVFX_K, nprobe=_IVFX_NPROBE
    ).select("q_id", "n_id", "score", F.col("rn").cast("long").alias("rn"))
