"""Text-analysis operators over a `documents(doc_id, text, lang, source,
n_chars)` table — the language-ID / quality / token / fingerprint layer a
training-data pipeline needs (not present in the reference; added per the
build brief).

Everything is built-in `pyspark.sql.functions` (JVM-side, codegen) — no
Python in the hot path.  Each operator has a DuckDB-oracle twin in
`__spark_entry__.py`; the Spark expressions here and the oracle SQL are
generated from the same primitive recipe so the results hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language ID.  Deliberately small + deterministic: the point is the Spark
# shape (map over marker sets → scores → argmax), not linguistic accuracy.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "und", "die", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "de", "que", "los", "una"],
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization of trimmed text; empty text → empty array."""
    return F.when(F.length(F.trim(text)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select(
        "doc_id", F.size(tokens_col(F.col(text_col))).alias("n_tokens")
    )


def bpe_ish_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-like subword proxy: count word chunks + digit runs + punctuation
    as separate tokens (regex split), the standard cheap token estimator."""
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return df.select("doc_id", F.size(pieces).alias("n_bpe_tokens"))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase ratios + composite score."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    n_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin([w for ws in LANG_MARKERS.values() for w in ws]))
    )
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    upper_ratio = F.round(n_upper / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6)
    mean_word_len = F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6)
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        upper_ratio.alias("upper_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_word_len.alias("mean_word_len"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: per-language marker hit count over the
    token set, argmax with deterministic tie-break on language code."""
    toks = tokens_col(F.lower(F.col(text_col)))

    # NB: the lambda must take exactly ONE parameter — PySpark interprets a
    # two-parameter lambda in F.filter as (element, index).
    def marker_test(words):
        return lambda t: t.isin(words)

    scores = [
        F.size(F.filter(toks, marker_test(words))).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]
    scored = df.select("doc_id", *scores)
    # argmax via greatest + chained when (ties → first in sorted lang order)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pick = F.when(F.lit(False), F.lit(""))
    for l in langs:
        pick = pick.when(F.col(f"score_{l}") == best, F.lit(l))
    return scored.select(
        "doc_id",
        F.when(best > 0, pick).otherwise(F.lit("und")).alias("lang_pred"),
        best.alias("lang_score"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of casefolded, whitespace-collapsed text —
    the canonical exact-dup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select("doc_id", F.md5(norm).alias("fp"))


# --- Oracle-SQL recipe twins (DuckDB dialect) -------------------------------

def lang_id_oracle_sql() -> str:
    langs = sorted(LANG_MARKERS)
    score_exprs = []
    for lang in langs:
        words = ",".join(f"'{w}'" for w in LANG_MARKERS[lang])
        score_exprs.append(
            f"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t in ({words})))"
            f" as score_{lang}"
        )
    best = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    pick = "case " + " ".join(f"when score_{l} = best then '{l}'" for l in langs) + " end"
    return f"""
        with scored as (
          select doc_id, {', '.join(score_exprs)}
          from documents
        ), b as (
          select doc_id, {best} as best, * from scored
        )
        select doc_id,
               case when best > 0 then {pick} else 'und' end as lang_pred,
               cast(best as int) as lang_score
        from b
    """
