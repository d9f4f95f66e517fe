"""Cross-modal embedding alignment (CLIP-score-style image↔caption filtering).

The build target's input is an image + caption table; the standard
curation step over it is alignment filtering: embed both modalities,
score each pair by cosine, and drop rows whose caption does not describe
its image (LAION-style "CLIP filtering" — public recipe).  The embedding
MODELS are external; this module is the engine side: given two
embedding tables keyed by the same id (one vector per image, one per
caption), score and filter pairs at table scale.

Scale shape: ONE keyed equi-join (both sides are fact-sized at 100 TB —
plain shuffle hash join on the key, co-partitioned if the tables are
bucketed by id via sources/layout.write_bucketed), then the cosine as
pure JVM higher-order folds (`zip_with` product → `aggregate` sum, no
Python anywhere) inside the same stage.  No window, no second shuffle.

Float discipline: dot and norms fold in ascending element order on both
engines and the score is emitted floor(x·1e6 + 0.5)/1e6 (the repo's
floor-form rounding invariant, CLAUDE.md), so the DuckDB oracle lands
on identical bits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _norm(col):
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_align(
    left: DataFrame,
    right: DataFrame,
    key: str = "vec_id",
    left_vec: str = "embedding",
    right_vec: str = "embedding",
    out: str = "cos_align",
) -> DataFrame:
    """(key, cos_align) for every key present in BOTH tables: exact
    cosine between the two modalities' vectors, floor-form rounded to
    6 decimals.  Inner join drops unmatched keys (an image without a
    caption embedding has no alignment to score)."""
    a = left.select(F.col(key), F.col(left_vec).alias("_ea"))
    b = right.select(F.col(key), F.col(right_vec).alias("_eb"))
    j = a.join(b, key)
    dot = F.aggregate(
        F.zip_with(F.col("_ea"), F.col("_eb"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos6 = F.floor(dot / (_norm(F.col("_ea")) * _norm(F.col("_eb"))) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return j.select(F.col(key), cos6.alias(out))


def align_filter(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    key: str = "vec_id",
    left_vec: str = "embedding",
    right_vec: str = "embedding",
    out: str = "cos_align",
) -> DataFrame:
    """Keep pairs with alignment ≥ threshold — the CLIP-filter keep set."""
    return cosine_align(left, right, key, left_vec, right_vec, out).filter(
        F.col(out) >= F.lit(threshold)
    )


def mismatch_bottomk(
    left: DataFrame,
    right: DataFrame,
    k: int,
    key: str = "vec_id",
    left_vec: str = "embedding",
    right_vec: str = "embedding",
    out: str = "cos_align",
) -> DataFrame:
    """The k WORST-aligned pairs — the audit view (likely caption swaps /
    decode corruption).  orderBy+limit plans as TakeOrderedAndProject:
    per-partition top-k then one driver merge of k·partitions rows — no
    global sort shuffle."""
    return (
        cosine_align(left, right, key, left_vec, right_vec, out)
        .orderBy(F.col(out).asc(), F.col(key).asc())
        .limit(k)
    )


def cosine_align_sql(
    left_rel: str,
    right_rel: str,
    key: str = "vec_id",
    left_vec: str = "embedding",
    right_vec: str = "embedding",
    out: str = "cos_align",
) -> str:
    """DuckDB twin of :func:`cosine_align` — identical fold order and
    floor-form rounding, so scores are bit-exact."""
    def nrm(rel, col):
        return (
            f"sqrt(list_sum(list_transform({rel}.{col}, "
            f"x -> cast(x as double) * cast(x as double))))"
        )

    dot = (
        f"list_sum(list_transform(range(1, len(a.{left_vec}) + 1), "
        f"i -> cast(a.{left_vec}[i] as double) * cast(b.{right_vec}[i] as double)))"
    )
    return f"""
      select a.{key} as {key},
             floor({dot} / ({nrm('a', left_vec)} * {nrm('b', right_vec)}) * 1e6 + 0.5) / 1e6
               as {out}
      from {left_rel} a join {right_rel} b on a.{key} = b.{key}
    """


def hard_negatives(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    emb: str = "embedding",
    label: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the k
    MOST-similar vectors whose ``label`` differs from the query's —
    the standard negatives-selection step for CLIP/InfoNCE-style
    training (similar-but-wrong pairs teach the sharpest decision
    boundary; random negatives are too easy).  Here ``label`` is the
    positive-group key (pair id / class / dedup component).

    Output: (query_id, vec_id, rank, cos6) — cos6 is the cosine,
    floor-form rounded to 1e-6 (the repo's float-output law); ranking
    uses the raw score with vec_id tie-break (the ann_cosine precedent:
    both engines fold the dot in index order, so order is stable).

    Scale shape: the query side is a bounded broadcast; the corpus
    side is ONE codegen'd scan — broadcast nested-loop against the tiny
    query set, JVM zip_with/aggregate folds, label-mismatch filter
    inside the same stage, then only (n_queries × candidates) rows
    reach the rank-window shuffle.  For table×table mining compose
    ann.with_lsh_bucket first (see hard_negatives_lsh) so candidates
    are bucket-local instead of the full corpus.
    """
    q = df.filter(F.col(id_col).isin([int(i) for i in query_ids])).select(
        F.col(id_col).alias("query_id"),
        F.col(label).alias("_qlab"),
        F.col(emb).alias("_qe"),
    )
    j = (
        df.crossJoin(F.broadcast(q))
        .filter(F.col(label) != F.col("_qlab"))
        .filter(F.col(id_col) != F.col("query_id"))
    )
    dot = F.aggregate(
        F.zip_with(F.col(emb), F.col("_qe"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # greatest(·, 1e-12): zero-norm guard, same law as kcenter_select
    score = dot / F.greatest(_norm(F.col(emb)) * _norm(F.col("_qe")), F.lit(1e-12))
    cos6 = F.floor(score * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    w = Window.partitionBy("query_id").orderBy(F.col("_s").desc(), F.col(id_col).asc())
    return (
        j.select("query_id", F.col(id_col), score.alias("_s"), cos6.alias("cos6"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "cos6")
    )


def hard_negatives_ivf(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    emb: str = "embedding",
    label: str = "label",
    n_centroids: int = 16,
    nprobe: int = 8,
) -> DataFrame:
    """The scale path of hard_negatives: candidates restricted to the
    query's ``nprobe`` nearest IVF inverted lists (ann.ivf_centroids —
    deterministic trainer), label-mismatch filter + exact cosine
    re-rank inside the probed lists.  Declared recall < 1; measured vs
    the exact miner in tests/test_ann.py (printed + pinned).  Same
    output schema as hard_negatives.

    Why IVF and not hyperplane LSH here: hard negatives sit at
    MODERATE angles (the nearest OTHER-label vector is farther than
    same-label neighbors), where sign-LSH collision probability decays
    fast — measured on the synthetic corpus, 12-plane Hamming≤1
    buckets capture only 4% of the true top-5 and even 6-plane
    Hamming≤2 only 60% while scanning a third of the corpus.  IVF at
    the same scan fraction measures 0.64–0.80 recall@5 here (nprobe
    8..12 of 16) — and this synthetic corpus is the WORST case for any
    partition-probe scheme: it is near-uniform (no cluster structure),
    so recall degenerates toward the scan fraction; on a real clustered
    embedding table the probed lists track the data geometry.  The
    exact miner above is the correctness anchor; this one trades
    declared recall for a bounded scan.
    """
    from geodesk_spark.operators.ann import _query_matrix, ivf_centroids

    spark = df.sparkSession
    Q, qids = _query_matrix(df, query_ids)
    qlab = {
        int(r[0]): r[1]
        for r in df.filter(F.col(id_col).isin([int(i) for i in query_ids]))
        .select(id_col, label)
        .collect()
    }
    C = ivf_centroids(df, n_centroids=n_centroids)
    probes = {qid: set(np.argsort(-(C @ Q[j]))[:nprobe].tolist()) for j, qid in enumerate(qids)}
    bc = spark.sparkContext.broadcast((Q, qids, qlab, C, probes, k))

    def scan(batches):
        Qm, qid_list, qlab_m, Cm, pr, kk = bc.value
        for pdf in batches:
            V = np.stack(pdf[emb].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(V, axis=1)
            norms[norms == 0] = 1.0
            Vn = V / norms[:, None]
            cent = np.argmax(Vn @ Cm.T, axis=1)
            vec_ids = pdf[id_col].to_numpy()
            labs = pdf[label].to_numpy()
            out_q, out_v, out_s = [], [], []
            for j, qid in enumerate(qid_list):
                mask = (
                    np.isin(cent, list(pr[qid]))
                    & (vec_ids != qid)
                    & (labs != qlab_m[qid])
                )
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    continue
                s = Vn[idx] @ Qm[j]  # Qm rows are unit-norm (_query_matrix)
                take = min(kk, len(idx))
                part = np.argpartition(-s, take - 1)[:take]
                out_q.extend([qid] * take)
                out_v.extend(vec_ids[idx[part]].tolist())
                out_s.extend(s[part].tolist())
            if out_q:
                yield pd.DataFrame({"query_id": out_q, "vec_id": out_v, "score": out_s})

    cand = df.select(F.col(id_col), F.col(emb), F.col(label)).mapInPandas(
        scan, schema="query_id long, vec_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    cos6 = F.floor(F.col("score") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", cos6.alias("cos6"))
    )


def hard_negatives_sql(
    query_ids: list[int],
    k: int = 5,
    table: str = "embeddings",
    id_col: str = "vec_id",
    emb: str = "embedding",
    label: str = "label",
) -> str:
    """DuckDB twin of hard_negatives — same index-order dot fold,
    zero-norm guard, floor-form cos6, raw-score ordering."""
    ids = ", ".join(str(int(i)) for i in query_ids)

    def nrm(rel: str) -> str:
        return (
            f"sqrt(list_sum(list_transform({rel}.{emb}, "
            f"x -> cast(x as double) * cast(x as double))))"
        )

    dot = (
        f"list_sum(list_transform(range(1, len(e.{emb}) + 1), "
        f"i -> cast(e.{emb}[i] as double) * cast(q.{emb}[i] as double)))"
    )
    return f"""
      with q as (select {id_col}, {label}, {emb} from {table}
                 where {id_col} in ({ids})),
      sc as (
        select q.{id_col} as query_id, e.{id_col} as {id_col},
               {dot} / greatest({nrm('e')} * {nrm('q')}, 1e-12) as score
        from {table} e cross join q
        where e.{label} <> q.{label} and e.{id_col} <> q.{id_col})
      select query_id, {id_col}, cast(rank as int) as rank,
             floor(score * 1e6 + 0.5) / 1e6 as cos6
      from (
        select query_id, {id_col}, score,
               row_number() over (partition by query_id
                   order by score desc, {id_col} asc) as rank
        from sc) where rank <= {int(k)}
    """
