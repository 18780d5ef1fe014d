"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface a 100 TB corpus engine needs (no
reference equivalent; these extend SURVEY.md §2 per the build brief).

All hot-path expressions are JVM Column expressions (whole-stage
codegen); nothing here touches Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_count_col(text: Column) -> Column:
    """Whitespace token count: (#spaces + 1), 0 for empty text.
    Deliberately expressible in ANSI SQL so the DuckDB oracle can
    replicate it byte-for-byte."""
    stripped = F.trim(text)
    return F.when(F.length(stripped) == 0, F.lit(0)).otherwise(
        F.length(stripped) - F.length(F.replace(stripped, F.lit(" "), F.lit(""))) + 1
    )


BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def bpe_token_count_col(text: Column) -> Column:
    """BPE-pre-tokenizer-style token count: letter runs, single digits,
    and punctuation marks each count as one token (the GPT-2-ish
    pre-split shape). Pure regexp — SQL-replicable."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def quality_cols(text: Column) -> dict[str, Column]:
    """Quality-scoring signals: length, punctuation density, mean word
    length. Composable into filter thresholds (e.g. Gopher-style rules)."""
    n_chars = F.length(text)
    n_punct = n_chars - F.length(
        F.regexp_replace(text, F.lit(r"[.,;:!?]"), F.lit(""))
    )
    tokens = token_count_col(text)
    return {
        "n_chars": n_chars,
        "n_tokens": tokens,
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
        "mean_word_len": F.round(n_chars / F.greatest(tokens, F.lit(1)), 6),
    }


def lang_id_col(text: Column) -> Column:
    """Stopword-heuristic language ID (n-gram-free variant: the
    highest-precision single signals, checked in fixed order so the
    result is deterministic and SQL-replicable)."""
    t = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return (
        F.when(t.contains(" the ") | t.contains(" and "), F.lit("en"))
        .when(t.contains(" der ") | t.contains(" und "), F.lit("de"))
        .when(t.contains(" le ") | t.contains(" et "), F.lit("fr"))
        .when(t.contains(" el ") | t.contains(" los "), F.lit("es"))
        .otherwise(F.lit("unk"))
    )


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 of the casefolded, punctuation-stripped,
    whitespace-collapsed text — canonical near-exact-dup key."""
    norm = F.regexp_replace(F.lower(text), F.lit("[^a-z0-9 ]"), F.lit(""))
    norm = F.trim(F.regexp_replace(norm, F.lit(" +"), F.lit(" ")))
    return F.md5(norm)


def with_text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    out = docs
    for name, col in quality_cols(t).items():
        out = out.withColumn(name, col)
    return out.withColumn("lang_pred", lang_id_col(t)).withColumn(
        "fingerprint", fingerprint_col(t)
    )
