"""Similarity search over an embedding column (`embeddings(vec_id,
embedding array<float>, label)`).

Two paths, per the build brief:

- ``cosine_topk``  — brute-force exact top-k per query vector.  The
  per-batch kernel is one numpy matmul (Arrow → float32 matrix → BLAS),
  i.e. the fastest possible single-pass scan; at cluster scale this is
  the map side, and only (n_queries × k) candidate rows shuffle to the
  final global top-k window.
- ``lsh_topk``     — random-hyperplane LSH bucketing: signature bits
  from deterministic hyperplanes, candidates = same bucket ∪ Hamming-1
  buckets, exact re-rank inside candidates.  The scale path: the scan
  prunes to a small candidate fraction; recall is tested vs brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _query_matrix(df: DataFrame, query_ids: list[int]) -> tuple[np.ndarray, list[int]]:
    rows = (
        df.filter(F.col("vec_id").isin([int(q) for q in query_ids]))
        .select("vec_id", "embedding")
        .collect()
    )
    got = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    qids = [q for q in query_ids if q in got]
    if not qids:
        raise ValueError(f"none of query_ids {query_ids!r} exist in the table")
    Q = np.stack([got[q] for q in qids])
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    return Q, qids


def cosine_topk(df: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Exact cosine top-k: returns (query_id, vec_id, rank).

    Self-matches are excluded.  Ties broken by vec_id ascending so the
    result is fully deterministic (and oracle-comparable).
    """
    spark = df.sparkSession
    Q, qids = _query_matrix(df, query_ids)
    bc = spark.sparkContext.broadcast((Q, qids, k))

    def scan(batches):
        Qm, qid_list, kk = bc.value
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(V, axis=1)
            norms[norms == 0] = 1.0
            S = (V / norms[:, None]) @ Qm.T  # (batch, nq)
            vec_ids = pdf["vec_id"].to_numpy()
            out_q, out_v, out_s = [], [], []
            for j, qid in enumerate(qid_list):
                s = S[:, j]
                mask = vec_ids != qid
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    continue
                take = min(kk, len(idx))
                # partial top-k per batch; global window finishes the job
                part = idx[np.argpartition(-s[idx], take - 1)[:take]]
                out_q.extend([qid] * len(part))
                out_v.extend(vec_ids[part].tolist())
                out_s.extend(s[part].tolist())
            if out_q:
                yield pd.DataFrame({"query_id": out_q, "vec_id": out_v, "score": out_s})

    cand = df.select("vec_id", "embedding").mapInPandas(
        scan, schema="query_id long, vec_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank")
    )


def ivf_centroids(df: DataFrame, n_centroids: int = 16, iters: int = 3, sample: int = 2048) -> np.ndarray:
    """Deterministic IVF codebook: k-means (Lloyd) on a fixed-id sample,
    seeded from evenly spaced sample rows — fully deterministic by
    construction (no RNG, hence no seed parameter).  Driver-side numpy
    on a tiny sample — the 10^12-scale path trains on a bounded sample
    too."""
    rows = (
        df.select("vec_id", "embedding")
        .filter(F.col("vec_id") % 13 == 0)  # deterministic 1/13 sample
        .orderBy("vec_id")
        .limit(sample)
        .collect()
    )
    V = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    C = V[:: max(1, len(V) // n_centroids)][:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(V @ C.T, axis=1)
        for c in range(len(C)):
            members = V[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return C


def ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: vectors are assigned to their nearest
    centroid (one matmul per Arrow batch); each query scans only its
    ``nprobe`` closest inverted lists and re-ranks exactly inside them.

    At cluster scale the centroid id is a partition/cluster key, so a
    probe touches nprobe/n_centroids of the data; the codebook is tiny
    and broadcast.  Returns (query_id, vec_id, rank, score).
    """
    spark = df.sparkSession
    Q, qids = _query_matrix(df, query_ids)
    C = ivf_centroids(df, n_centroids=n_centroids)
    probes = {qid: set(np.argsort(-(C @ Q[j]))[:nprobe].tolist()) for j, qid in enumerate(qids)}
    bc = spark.sparkContext.broadcast((Q, qids, C, probes, k))

    def scan(batches):
        Qm, qid_list, Cm, pr, kk = bc.value
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(V, axis=1)
            norms[norms == 0] = 1.0
            Vn = V / norms[:, None]
            cent = np.argmax(Vn @ Cm.T, axis=1)
            vec_ids = pdf["vec_id"].to_numpy()
            out_q, out_v, out_s = [], [], []
            for j, qid in enumerate(qid_list):
                mask = np.isin(cent, list(pr[qid])) & (vec_ids != qid)
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    continue
                s = Vn[idx] @ Qm[j]
                take = min(kk, len(idx))
                part = np.argpartition(-s, take - 1)[:take]
                out_q.extend([qid] * take)
                out_v.extend(vec_ids[idx[part]].tolist())
                out_s.extend(s[part].tolist())
            if out_q:
                yield pd.DataFrame({"query_id": out_q, "vec_id": out_v, "score": out_s})

    cand = df.select("vec_id", "embedding").mapInPandas(
        scan, schema="query_id long, vec_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "score")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic hyperplanes via splitmix64-seeded Gaussian."""
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((n_planes, dim))
    return H / np.linalg.norm(H, axis=1, keepdims=True)


def with_lsh_bucket(df: DataFrame, dim: int = 64, n_planes: int = 12, seed: int = 42) -> DataFrame:
    """Add an int LSH bucket column (sign bits against n_planes hyperplanes)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(_hyperplanes(dim, n_planes, seed))

    def buckets(batches):
        H = bc.value
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = (V @ H.T) > 0  # (batch, planes)
            b = np.zeros(len(pdf), dtype=np.int64)
            for j in range(bits.shape[1]):
                b |= bits[:, j].astype(np.int64) << j
            out = pdf.copy()
            out["bucket"] = b
            yield out

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField("bucket", LongType())])
    return df.mapInPandas(buckets, schema=schema)


def lsh_topk(df: DataFrame, query_ids: list[int], k: int = 5, n_planes: int = 12, seed: int = 42) -> DataFrame:
    """Approximate cosine top-k: candidates from the query's bucket and all
    Hamming-1 neighbor buckets, exact re-rank within candidates.

    At 10^12 scale the bucket column is a partition/cluster key, so the
    candidate read touches (n_planes+1)/2^n_planes of the data.
    """
    spark = df.sparkSession
    Q, qids = _query_matrix(df, query_ids)
    H = _hyperplanes(Q.shape[1], n_planes, seed)
    qbits = (Q @ H.T) > 0
    qbuckets = {}
    for j, qid in enumerate(qids):
        b = 0
        for p in range(n_planes):
            b |= int(qbits[j, p]) << p
        qbuckets[qid] = {b} | {b ^ (1 << p) for p in range(n_planes)}

    bucketed = with_lsh_bucket(df, dim=Q.shape[1], n_planes=n_planes, seed=seed)
    bc = spark.sparkContext.broadcast((Q, qids, qbuckets, k))

    def scan(batches):
        Qm, qid_list, qb, kk = bc.value
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(V, axis=1)
            norms[norms == 0] = 1.0
            Vn = V / norms[:, None]
            vec_ids = pdf["vec_id"].to_numpy()
            bkt = pdf["bucket"].to_numpy()
            out_q, out_v, out_s = [], [], []
            for j, qid in enumerate(qid_list):
                cand_mask = np.isin(bkt, list(qb[qid])) & (vec_ids != qid)
                idx = np.nonzero(cand_mask)[0]
                if len(idx) == 0:
                    continue
                s = Vn[idx] @ Qm[j]
                take = min(kk, len(idx))
                part = np.argpartition(-s, take - 1)[:take]
                out_q.extend([qid] * take)
                out_v.extend(vec_ids[idx[part]].tolist())
                out_s.extend(s[part].tolist())
            if out_q:
                yield pd.DataFrame({"query_id": out_q, "vec_id": out_v, "score": out_s})

    cand = bucketed.select("vec_id", "embedding", "bucket").mapInPandas(
        scan, schema="query_id long, vec_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "score")
    )
