"""Text-analysis operators for training-data pipelines (beyond-parity;
SURVEY.md §4.3 / build plan step 8).

Language-ID (stopword-marker heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and document fingerprinting over
the `documents` table.  Everything is built-in-function only (JVM-side,
codegen'd): at 100 TB these run as a single scan + narrow projections —
no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from splitserve_spark.functions.parity_hash import (
    md5_hash60,
    md5_hash60_sql,
)
from splitserve_spark.registry import register
from splitserve_spark.session import ensure_parity_conf
from splitserve_spark.tables import Tables

#: Marker (stop)words per language for the heuristic classifier.  The
#: synthetic corpus is English-ish; real deployments swap these lists.
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
}

_STOPWORDS = LANG_MARKERS["en"]

#: BPE-ish tokenizer regex: letter runs, digit runs, or single symbols.
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _words(col):
    return F.split(F.trim(col), " +")


@register(
    "text_stats",
    oracle="""
    SELECT doc_id,
           length(text)                                  AS n_chars_obs,
           CAST(len(string_split_regex(trim(text), ' +')) AS INTEGER) AS n_words,
           CAST(len(list_distinct(string_split_regex(trim(text), ' +'))) AS INTEGER)
                                                         AS n_unique_words,
           CAST(len(list_filter(string_split_regex(trim(text), ' +'),
                w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS INTEGER)
                                                         AS n_stopwords
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "pipeline"),
    bench=True,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: char/word/unique-word/stopword
    counts in one narrow projection."""
    ensure_parity_conf(spark)
    t = Tables(spark, sf_dir)
    w = _words(F.col("text"))
    stop = F.filter(w, lambda x: x.isin(*_STOPWORDS))
    return (
        t.documents.select(
            "doc_id",
            F.length("text").cast("bigint").alias("n_chars_obs"),
            F.size(w).alias("n_words"),
            F.size(F.array_distinct(w)).alias("n_unique_words"),
            F.size(stop).alias("n_stopwords"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(regexp_extract_all(text, '{TOKEN_RE}')))
                AS INTEGER) AS n_token_types
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "pipeline", "tokenize"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex tokenization (BPE-ish pre-tokenizer shape) + type counts.
    regexp_extract_all is JVM-side; the pattern avoids constructs where
    Java and RE2 dialects diverge."""
    ensure_parity_conf(spark)
    t = Tables(spark, sf_dir)
    toks = F.regexp_extract_all("text", F.lit(TOKEN_RE), 0)
    return (
        t.documents.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_token_types"),
        )
        .orderBy("doc_id")
    )


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split_regex(trim(text), ' +'), "
        f"w -> w IN ({markers})))"
    )


@register(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_lang_score_sql("en")} AS s_en,
             {_lang_score_sql("de")} AS s_de,
             {_lang_score_sql("fr")} AS s_fr
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 THEN 'unknown'
                WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS predicted_lang
    FROM scored
    ORDER BY doc_id
    """,
    tags=("text", "pipeline", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID with a deterministic argmax tiebreak
    (en > de > fr).  A real system would use char-n-gram profiles; the
    pipeline shape — score columns + argmax — is identical."""
    ensure_parity_conf(spark)
    t = Tables(spark, sf_dir)
    w = _words(F.col("text"))
    def marker_count(markers):
        # Unary lambda on purpose — a second parameter would be bound to
        # PySpark's element-index column, not a Python default.
        return F.size(F.filter(w, lambda x: x.isin(*markers)))

    scores = {lang: marker_count(m) for lang, m in LANG_MARKERS.items()}
    predicted = (
        F.when(
            (scores["en"] == 0) & (scores["de"] == 0) & (scores["fr"] == 0),
            "unknown",
        )
        .when((scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]), "en")
        .when(scores["de"] >= scores["fr"], "de")
        .otherwise("fr")
    )
    return (
        t.documents.select("doc_id", "lang", predicted.alias("predicted_lang"))
        .orderBy("doc_id")
    )


@register(
    "text_quality",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE) AS n_words,
             CAST(len(list_filter(string_split_regex(trim(text), ' +'),
                  w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) AS n_stop,
             CAST(len(list_distinct(string_split_regex(trim(text), ' +')))
                  AS DOUBLE) AS n_uniq
      FROM documents
    )
    SELECT doc_id,
           round(
             0.4 * least(n_words / 50.0, 1.0)
             + 0.3 * least(n_stop / greatest(n_words, 1.0) * 10.0, 1.0)
             + 0.3 * (n_uniq / greatest(n_words, 1.0)), 6) AS quality
    FROM f
    ORDER BY doc_id
    """,
    tags=("text", "pipeline", "quality"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: length saturation + stopword density +
    lexical diversity (the classic pre-training quality-filter triple)."""
    ensure_parity_conf(spark)
    t = Tables(spark, sf_dir)
    w = _words(F.col("text"))
    n_words = F.size(w).cast("double")
    n_stop = F.size(F.filter(w, lambda x: x.isin(*_STOPWORDS))).cast("double")
    n_uniq = F.size(F.array_distinct(w)).cast("double")
    quality = F.round(
        0.4 * F.least(n_words / 50.0, F.lit(1.0))
        + 0.3 * F.least(n_stop / F.greatest(n_words, F.lit(1.0)) * 10.0, F.lit(1.0))
        + 0.3 * (n_uniq / F.greatest(n_words, F.lit(1.0))),
        6,
    )
    return t.documents.select("doc_id", quality.alias("quality")).orderBy("doc_id")


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp,
           {md5_hash60_sql("regexp_replace(trim(lower(text)), ' +', ' ', 'g')")}
             AS fp60
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "pipeline", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    plus the 60-bit integer form used by the dedup operators."""
    ensure_parity_conf(spark)
    t = Tables(spark, sf_dir)
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " ")
    return (
        t.documents.select(
            "doc_id",
            F.md5(norm.cast("binary")).alias("fp"),
            md5_hash60(norm).alias("fp60"),
        )
        .orderBy("doc_id")
    )
