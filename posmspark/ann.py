"""Approximate nearest neighbor over embedding columns (north-rule
training-data addition; no posm counterpart).

Two paths, both over array<float> embedding columns:
- brute-force cosine top-k (relops.q_ann_cosine_topk is the oracle'd
  single-query version; here the batched many-queries variant runs the
  dot products in numpy inside one Arrow batch) — the CORRECTNESS
  baseline, O(N*Q).
- LSH-bucketed (random signed hyperplanes): each vector hashes to an
  n_planes-bit signature; queries probe their own bucket (+ optional
  multi-probe neighbors at Hamming distance 1). Candidates come from an
  equi-join on the signature — the scale path: shuffle keys are
  signatures, candidate sets are bucket-sized, never a cross join.

The hyperplanes are generated from a fixed seed -> deterministic across
runs and executors (broadcast once).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

SEED = 42


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(vectors: DataFrame, queries_pdf: pd.DataFrame, k: int,
                     spark: SparkSession, id_col: str = "vec_id",
                     emb_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of every vector row against a broadcast query
    set. One numpy matmul per Arrow batch — the vectorized baseline."""
    qids = queries_pdf["query_id"].astype(str).to_numpy()
    qm = _normalize(np.vstack(queries_pdf["embedding"].to_numpy()).astype(np.float64))
    bc = spark.sparkContext.broadcast((qids, qm))

    out_schema = T.ArrayType(T.StructType([
        T.StructField("query_id", T.StringType()),
        T.StructField("cos_sim", T.DoubleType()),
    ]))

    @pandas_udf(out_schema)
    def topk(emb: pd.Series) -> pd.Series:
        ids, q = bc.value
        m = _normalize(np.vstack(emb.to_numpy()).astype(np.float64))
        sims = m @ q.T  # (batch, n_queries)
        kk = min(k, len(ids))
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = []
        for r in range(len(m)):
            idx = part[r]
            order = sorted(idx, key=lambda i: (-sims[r, i], str(ids[i])))
            rows.append([
                {"query_id": str(ids[i]), "cos_sim": float(sims[r, i])}
                for i in order
            ])
        return pd.Series(rows)

    return vectors.withColumn("topk", topk(F.col(emb_col)))


def hyperplanes(dim: int, n_planes: int, seed: int = SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _sig_udf(planes: np.ndarray, bc):
    @pandas_udf(T.LongType())
    def sig(emb: pd.Series) -> pd.Series:
        pl = bc.value
        m = np.vstack(emb.to_numpy()).astype(np.float64)
        bits = (m @ pl.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(pl.shape[0], dtype=np.int64))
        return pd.Series((bits @ weights).astype(np.int64))

    return sig


def with_lsh_signature(vectors: DataFrame, spark: SparkSession, dim: int,
                       n_planes: int = 12, emb_col: str = "embedding",
                       out_col: str = "lsh_sig", seed: int = SEED) -> DataFrame:
    """Add a signed-hyperplane LSH signature column (int64 bucket key).

    At cluster scale the vectors table is written bucketed/partitioned
    by this key, so repeated ANN queries prune to matching buckets at
    scan time."""
    pl = hyperplanes(dim, n_planes, seed)
    bc = spark.sparkContext.broadcast(pl)
    return vectors.withColumn(out_col, _sig_udf(pl, bc)(F.col(emb_col)))


def lsh_topk(vectors: DataFrame, queries_pdf: pd.DataFrame, k: int,
             spark: SparkSession, dim: int, n_planes: int = 12,
             id_col: str = "vec_id", emb_col: str = "embedding",
             multiprobe: bool = True, seed: int = SEED) -> DataFrame:
    """ANN top-k via LSH bucket equi-join.

    Query signatures (plus Hamming-1 probes) are broadcast; candidates
    come from the signature equi-join; exact cosine re-ranks candidates;
    row_number keeps top-k per query. Recall is tested against
    brute_force_topk in tests/test_ann.py.
    """
    pl = hyperplanes(dim, n_planes, seed)
    vecs = with_lsh_signature(vectors, spark, dim, n_planes, emb_col, seed=seed)

    qm = np.vstack(queries_pdf["embedding"].to_numpy()).astype(np.float64)
    qsig = ((qm @ pl.T) > 0) @ (1 << np.arange(n_planes, dtype=np.int64))
    probe_rows = []
    for qi, q in queries_pdf.iterrows():
        sigs = {int(qsig[qi])}
        if multiprobe:
            for b in range(n_planes):
                sigs.add(int(qsig[qi]) ^ (1 << b))
        for s in sigs:
            probe_rows.append(
                {"query_id": str(q["query_id"]), "lsh_sig": s,
                 "q_emb": [float(x) for x in q["embedding"]]}
            )
    probes = spark.createDataFrame(pd.DataFrame(probe_rows))

    cand = vecs.join(F.broadcast(probes), "lsh_sig", "inner")
    dot = F.expr(
        f"aggregate(zip_with({emb_col}, q_emb,"
        " (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE),"
        " (acc, v) -> acc + v)"
    )
    nv = F.expr(
        f"sqrt(aggregate({emb_col}, CAST(0.0 AS DOUBLE),"
        " (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )
    nq = F.expr(
        "sqrt(aggregate(q_emb, CAST(0.0 AS DOUBLE),"
        " (acc, v) -> acc + v * v))"
    )
    scored = cand.withColumn("cos_sim", dot / (nv * nq))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", id_col, "cos_sim", "rn")
    )
