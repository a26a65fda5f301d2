"""Text analysis for LLM training-data pipelines: language ID
(n-gram/stopword heuristic), quality scoring, token counting,
document fingerprinting.

North-star layer (BASELINE.json). Every ratio is computed from
integer counts divided once in double — identical across engines and
partitionings. All pure built-ins: at 100 TB these run inside
whole-stage codegen in a single scan of `documents`; none of them
shuffles anything but final aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import load_table

# Tiny per-language stopword lists for the heuristic scorer.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
}


def _sw_count_spark(words_col, lang: str):
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.size(F.expr(f"filter({words_col}, w -> w IN ({lst}))"))


def _sw_count_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(words, w -> list_contains([{lst}], w)))"


@register(
    "llm_text_stats",
    sql="""
    WITH w AS (SELECT doc_id, lang, source, n_chars, string_split(text, ' ') AS words FROM documents)
    SELECT
      doc_id, lang, source, n_chars,
      CAST(len(words) AS BIGINT) AS n_words,
      CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct_words,
      CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS ttr,
      CAST(n_chars AS DOUBLE) / len(words) AS avg_word_len
    FROM w
    """,
    doc="Per-doc stats: words, vocabulary, type-token ratio, mean word length",
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(words).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_distinct_words"),
        (F.size(F.array_distinct(words)).cast("double") / F.size(words)).alias("ttr"),
        (F.col("n_chars").cast("double") / F.size(words)).alias("avg_word_len"),
    )


@register(
    "llm_text_langid",
    sql=f"""
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
    scores AS (
      SELECT doc_id, lang,
        {_sw_count_sql("en")} AS s_en,
        {_sw_count_sql("es")} AS s_es,
        {_sw_count_sql("de")} AS s_de,
        {_sw_count_sql("fr")} AS s_fr
      FROM w)
    SELECT doc_id, lang AS labeled_lang,
      CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
           WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
           WHEN s_de >= s_fr THEN 'de'
           ELSE 'fr' END AS predicted_lang,
      CAST(s_en + s_es + s_de + s_fr AS BIGINT) AS stopword_hits
    FROM scores
    """,
    doc="Language-ID heuristic: per-language stopword scores, argmax with fixed tie order",
)
def llm_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", "lang", F.split(F.col("text"), " ").alias("words"))
    s = {k: _sw_count_spark("words", k) for k in STOPWORDS}
    scores = w.select(
        "doc_id", "lang", s["en"].alias("s_en"), s["es"].alias("s_es"), s["de"].alias("s_de"), s["fr"].alias("s_fr")
    )
    return scores.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when((F.col("s_en") >= F.col("s_es")) & (F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_fr")), "en")
        .when((F.col("s_es") >= F.col("s_de")) & (F.col("s_es") >= F.col("s_fr")), "es")
        .when(F.col("s_de") >= F.col("s_fr"), "de")
        .otherwise("fr")
        .alias("predicted_lang"),
        (F.col("s_en") + F.col("s_es") + F.col("s_de") + F.col("s_fr")).cast("bigint").alias("stopword_hits"),
    )


@register(
    "llm_text_quality",
    sql="""
    WITH w AS (
      SELECT doc_id, n_chars, string_split(text, ' ') AS words,
             len(regexp_extract_all(text, '[aeiou]')) AS n_vowel,
             len(regexp_extract_all(text, '[0-9]')) AS n_digit
      FROM documents)
    SELECT
      doc_id,
      CAST(len(words) AS BIGINT) AS n_words,
      CAST(n_vowel AS DOUBLE) / n_chars AS vowel_ratio,
      CAST(n_digit AS DOUBLE) / n_chars AS digit_ratio,
      CASE WHEN len(words) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END
        + CASE WHEN CAST(n_digit AS DOUBLE) / n_chars < 0.1 THEN 1 ELSE 0 END
        + CASE WHEN CAST(len(list_distinct(words)) AS DOUBLE) / len(words) > 0.1 THEN 1 ELSE 0 END
        AS quality_score
    FROM w
    """,
    doc="Quality scoring: length band, digit ratio, vocabulary diversity → 0-3 score",
)
def llm_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_vowel = F.size(F.regexp_extract_all(F.col("text"), F.lit("[aeiou]"), F.lit(0)))
    n_digit = F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]"), F.lit(0)))
    n_words = F.size(words)
    ttr = F.size(F.array_distinct(words)).cast("double") / n_words
    digit_ratio = n_digit.cast("double") / F.col("n_chars")
    return d.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        (n_vowel.cast("double") / F.col("n_chars")).alias("vowel_ratio"),
        digit_ratio.alias("digit_ratio"),
        (
            F.when(n_words.between(20, 1000), 1).otherwise(0)
            + F.when(digit_ratio < 0.1, 1).otherwise(0)
            + F.when(ttr > 0.1, 1).otherwise(0)
        ).cast("int").alias("quality_score"),
    )


@register(
    "llm_text_tokens",
    sql="""
    SELECT
      doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS re_tokens,
      CAST(CEIL(CAST(n_chars AS DOUBLE) / 4) AS BIGINT) AS approx_bpe_tokens
    FROM documents
    """,
    doc="Token counting: whitespace, BPE-ish regex classes, chars/4 estimate",
)
def llm_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
        ).cast("bigint").alias("re_tokens"),
        F.ceil(F.col("n_chars").cast("double") / 4).cast("bigint").alias("approx_bpe_tokens"),
    )


@register(
    "llm_text_fingerprint",
    sql="""
    WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents)
    SELECT
      doc_id,
      md5(text) AS exact_fp,
      md5(array_to_string(list_sort(list_distinct(words)), ' ')) AS bag_fp,
      MIN(md5(words[i.i] || ' ' || words[i.i + 1])) AS min_bigram_fp
    FROM w CROSS JOIN (SELECT UNNEST(range(1, 2000)) AS i) i
    WHERE i.i < len(words)
    GROUP BY doc_id, text, words
    """,
    doc="Document fingerprints: exact md5, order-insensitive bag-of-words md5, winnowing-style min-bigram hash",
)
def llm_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pre-split once into a column: Catalyst does NOT common-subexpression
    # a split() referenced inside transform() lambdas, so inlining it
    # re-tokenizes per bigram (~9× slower, measured at sf0.1).
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.split(F.col("text"), " ").alias("ws")
    )
    bigrams = F.expr(
        "transform(sequence(1, size(ws) - 1), "
        "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))"
    )
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("exact_fp"),
        F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(F.col("ws")))).cast("binary")).alias("bag_fp"),
        F.array_min(F.transform(bigrams, lambda b: F.md5(b.cast("binary")))).alias("min_bigram_fp"),
    )


VOCAB_TOP_K = 50


@register(
    "llm_vocab_topk",
    sql=f"""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT {VOCAB_TOP_K}
    """,
    doc="Corpus vocabulary top-k: global token frequencies, deterministic "
    "tie-break (the vocab/tokenizer-training feed; TakeOrdered, no full sort)",
)
def llm_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting is the canonical map-side-combinable aggregate:
    the shuffle carries one (token, partial_count) row per distinct
    token per partition — vocabulary-sized, not corpus-sized. The
    ORDER BY + LIMIT compiles to TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(VOCAB_TOP_K)
    )


NGRAM_MIN_COUNT = 5


@register(
    "llm_ngram_counts",
    sql=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (
      SELECT UNNEST(list_transform(range(1, greatest(len(ws), 2)),
                    i -> ws[i] || ' ' || ws[i+1])) AS bigram
      FROM w)
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM g GROUP BY bigram
    HAVING COUNT(*) >= {NGRAM_MIN_COUNT}
    """,
    doc="Corpus bigram LM counts with a min-count threshold (the KenLM-prep / "
    "perplexity-filter feed) — count-then-filter keeps the long tail out of "
    "the output without a second shuffle",
)
def llm_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        F.split(F.col("text"), " ").alias("ws")
    )
    bigrams = F.expr(
        "transform(sequence(1, greatest(size(ws) - 1, 1)), i -> concat(ws[i-1], ' ', ws[i]))"
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") >= NGRAM_MIN_COUNT)
    )
