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

from pyspark.sql import DataFrame, functions as F


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
