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

from pyspark.sql import DataFrame, SparkSession, Window as W
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
      CAST(n_vowel AS DOUBLE) / NULLIF(n_chars, 0) AS vowel_ratio,
      CAST(n_digit AS DOUBLE) / NULLIF(n_chars, 0) AS digit_ratio,
      CASE WHEN len(words) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END
        + CASE WHEN CAST(n_digit AS DOUBLE) / NULLIF(n_chars, 0) < 0.1 THEN 1 ELSE 0 END
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
    # Empty documents (n_chars = 0): ratios are undefined -> NULL on
    # both engines. Unguarded, Spark's ANSI mode raises on the 0-div
    # while DuckDB emits inf (edge-case fuzz finding).
    nz_chars = F.when(F.col("n_chars") != 0, F.col("n_chars"))
    digit_ratio = n_digit.cast("double") / nz_chars
    return d.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        (n_vowel.cast("double") / nz_chars).alias("vowel_ratio"),
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
    FROM w LEFT JOIN (SELECT UNNEST(range(1, 2000)) AS i) i ON i.i < len(words)
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
    # sequence(1, 0) on a 1-word doc is DESCENDING [1, 0] and its
    # element_at probes raise under ANSI — emit no bigrams instead
    # (array_min over empty -> NULL, matching the twin's empty range).
    bigrams = F.expr(
        "CASE WHEN size(ws) >= 2 THEN transform(sequence(1, size(ws) - 1), "
        "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("exact_fp"),
        # concat_ws over a NULL array is '' on Spark but NULL on DuckDB
        F.when(
            F.col("ws").isNotNull(),
            F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(F.col("ws")))).cast("binary")),
        ).alias("bag_fp"),
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
    # get() is 0-based and NULL on out-of-bounds: a 1-word doc yields a
    # NULL bigram (dropped by the count) instead of an ANSI-mode array
    # index error — and matches the twin's NULL-propagating ws[i+1].
    bigrams = F.expr(
        "transform(sequence(1, greatest(size(ws) - 1, 1)), "
        "i -> concat(get(ws, i-1), ' ', get(ws, i)))"
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") >= NGRAM_MIN_COUNT)
    )


TFIDF_TOP_K = 3


@register(
    "llm_tfidf_topterms",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents),
    tfc AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfc AS (
      SELECT token, COUNT(*) AS df FROM tfc GROUP BY 1),
    n AS (
      SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.token, t.tf, d.df,
             CAST((t.tf * n.n_docs) AS DOUBLE) / d.df AS score
      FROM tfc t JOIN dfc d ON d.token = t.token CROSS JOIN n),
    r AS (
      SELECT doc_id, token, tf, df, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, token) AS term_rank
      FROM scored)
    SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           score, CAST(term_rank AS BIGINT) AS term_rank
    FROM r WHERE term_rank <= {TFIDF_TOP_K}
    """,
    doc="TF-IDF top terms per document (linear idf = N/df — no log, so the "
    "score is a single exactly-reproducible IEEE division; ties by token)",
)
def llm_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: tf from one (doc, token) aggregation, df from
    one token aggregation over it (both map-side combined, linear in
    corpus), a token-keyed join to attach df — the df frame is
    vocabulary-sized, far smaller than the corpus — and a per-doc rank
    window. idf is the LINEAR N/df variant: `log()` is not a
    correctly-rounded IEEE op, so log-idf can differ in the last ulp
    across engines/libms; integer-product-then-one-division is exact
    and preserves the same per-doc ranking for fixed N.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    tfc = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tfc.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tfc.join(dfc, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            "score",
            F.col("term_rank").cast("bigint").alias("term_rank"),
        )
    )


CMS_ROWS = 2
CMS_WIDTH = 64
CMS_TOPK = 10


def _cms_bucket_sql(row_expr: str, token_expr: str) -> str:
    from nova_pulsar_spark.operators.pipeline import _hash16_sql

    salted = f"'r' || CAST({row_expr} AS VARCHAR) || ':' || {token_expr}"
    return f"({_hash16_sql(salted)} % {CMS_WIDTH})"


@register(
    "llm_heavy_hitters_cms",
    sql=f"""
    WITH tok AS (
      SELECT UNNEST(string_split(text, ' ')) AS token FROM documents),
    pairs AS (
      SELECT r.r AS row_no, {_cms_bucket_sql("r.r", "token")} AS bucket
      FROM tok CROSS JOIN (VALUES (0), (1)) r(r)),
    sketch AS (
      SELECT row_no, bucket, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2),
    exact AS (
      SELECT token, COUNT(*) AS exact_n FROM tok GROUP BY 1),
    cand AS (
      SELECT token, exact_n FROM exact
      ORDER BY exact_n DESC, token LIMIT {CMS_TOPK}),
    est AS (
      SELECT c.token, c.exact_n, MIN(s.cnt) AS est_n
      FROM cand c JOIN sketch s
        ON s.bucket = {_cms_bucket_sql("s.row_no", "c.token")}
      GROUP BY 1, 2)
    SELECT token, CAST(exact_n AS BIGINT) AS exact_n,
           CAST(est_n AS BIGINT) AS est_n,
           est_n >= exact_n AS admissible
    FROM est
    """,
    doc="Count-min-sketch heavy hitters: deterministic md5-row hashes make "
    "the sketch oracle-exact; est = min over rows, always >= the true count",
)
def llm_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CMS shuffle is the point: after map-side partial aggregation
    the wire carries at most rows×width (= 128) counter cells per map
    partition, REGARDLESS of corpus size — the sketch is the fixed-size
    summary a 100 TB frequency pass ships to one reducer. Estimation
    joins candidates against the (broadcastable) sketch; the min over
    rows is the classic admissible overestimate, asserted per row.
    Hashes are the md5-nibble idiom, so both engines build the
    bit-identical sketch.
    """
    from nova_pulsar_spark.operators.pipeline import _hash16_spark

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))

    def bucket(row_col: F.Column, token_col: F.Column) -> F.Column:
        return _hash16_spark(
            F.concat(F.lit("r"), row_col.cast("string"), F.lit(":"), token_col)
        ) % CMS_WIDTH

    pairs = tok.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("row_no"), bucket(F.lit(r), F.col("token")).alias("bucket"))
                for r in range(CMS_ROWS)
            ])
        ).alias("p")
    ).select("p.row_no", "p.bucket")
    sketch = pairs.groupBy("row_no", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    cand = exact.orderBy(F.col("exact_n").desc(), "token").limit(CMS_TOPK)
    est = (
        cand.join(
            F.broadcast(sketch),
            F.col("bucket") == bucket(F.col("row_no"), F.col("token")),
        )
        .groupBy("token", "exact_n")
        .agg(F.min("cnt").alias("est_n"))
    )
    return est.select(
        "token",
        F.col("exact_n").cast("bigint").alias("exact_n"),
        F.col("est_n").cast("bigint").alias("est_n"),
        (F.col("est_n") >= F.col("exact_n")).alias("admissible"),
    )


@register(
    "llm_source_diversity_gini",
    sql="""
    WITH c AS (
      SELECT source, lang, COUNT(*) AS cnt FROM documents GROUP BY 1, 2),
    t AS (
      SELECT source, CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(SUM(cnt * cnt) AS BIGINT) AS sumsq,
             CAST(COUNT(*) AS BIGINT) AS n_langs
      FROM c GROUP BY 1)
    SELECT source, n_langs, total,
           CAST(1.0 AS DOUBLE)
             - CAST(sumsq AS DOUBLE) / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))
             AS gini_diversity
    FROM t
    """,
    doc="Per-source language diversity as Gini impurity (1 - Σp²) — the "
    "log-free diversity measure (entropy needs log(), which is not "
    "correctly-rounded across engines)",
)
def llm_source_diversity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix monitoring: how language-diverse is each source?
    Gini impurity 1 - Σ(cntᵢ/total)² is the reproducibility-safe
    choice — it is a rational function of integer counts (one double
    division per term pair), where Shannon entropy's log() can differ
    in the last ulp between libms. Two tiny hash aggregates; nothing
    scales with document size.
    """
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    t = c.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sumsq"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
    )
    return t.select(
        "source",
        "n_langs",
        "total",
        (
            F.lit(1.0).cast("double")
            - F.col("sumsq").cast("double")
            / (F.col("total").cast("double") * F.col("total").cast("double"))
        ).alias("gini_diversity"),
    )


@register(
    "llm_langid_confusion",
    sql=f"""
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
    scores AS (
      SELECT doc_id, lang,
        {_sw_count_sql("en")} AS s_en,
        {_sw_count_sql("es")} AS s_es,
        {_sw_count_sql("de")} AS s_de,
        {_sw_count_sql("fr")} AS s_fr
      FROM w),
    pred AS (
      SELECT lang AS labeled_lang,
        CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
             WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
             WHEN s_de >= s_fr THEN 'de'
             ELSE 'fr' END AS predicted_lang
      FROM scores)
    SELECT labeled_lang, predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           labeled_lang = predicted_lang AS correct
    FROM pred GROUP BY labeled_lang, predicted_lang
    """,
    doc="Language-ID confusion matrix: labeled vs predicted counts — "
    "in-engine classifier evaluation (precision/recall derive from it)",
)
def llm_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as one extra groupBy on top of the langid
    projection: the (labeled, predicted) count matrix from which
    per-class precision/recall/accuracy all derive. The eval costs one
    tiny shuffle on a (lang × lang) key space — model-quality
    monitoring belongs IN the corpus engine, not in a notebook after
    an export."""
    pred = llm_text_langid(spark, sf_dir).select("labeled_lang", "predicted_lang")
    return pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).select(
        "labeled_lang",
        "predicted_lang",
        "n",
        (F.col("labeled_lang") == F.col("predicted_lang")).alias("correct"),
    )


BPE_TOP_MERGES = 20


@register(
    "llm_bpe_merge_step",
    sql=f"""
    WITH wf AS (
      SELECT w, COUNT(*) AS f
      FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w),
    p AS (
      SELECT UNNEST(list_transform(range(1, length(w)),
                    i -> substring(w, i, 2))) AS pair, f
      FROM wf WHERE length(w) >= 2)
    SELECT pair, CAST(SUM(f) AS BIGINT) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {BPE_TOP_MERGES}
    """,
    doc="BPE vocabulary induction, one merge round: frequency-weighted "
    "adjacent-symbol-pair counts over distinct word TYPES, top merge "
    "candidates with deterministic tie-break (the tokenizer-training step "
    "that llm_text_tokens consumes the result of)",
)
def llm_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic BPE trick makes this scale: pair counting runs over
    the word-TYPE table (distinct words × frequency), not the corpus —
    the first groupBy collapses 100 TB of text to a vocabulary-sized
    frame, and every later merge round re-counts only that. Both
    shuffles are map-side-combinable with key spaces bounded by
    |vocab| and |alphabet|². Character pairs via substring are
    identical 1-based semantics on both engines."""
    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    pairs = (
        wf.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair"),
            "f",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(BPE_TOP_MERGES)
    )


@register(
    "llm_perplexity_proxy",
    sql="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    bg AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, greatest(len(ws), 2)),
                    i -> ws[i] || ' ' || ws[i+1])) AS bigram
      FROM w),
    cnt AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(c.n) AS DOUBLE) / COUNT(*) AS mean_bigram_count
    FROM bg b JOIN cnt c ON c.bigram = b.bigram
    GROUP BY b.doc_id
    """,
    doc="Perplexity-filter proxy: score each doc by the corpus-frequency of "
    "its own bigrams (mean bigram count; log-free so the score is one exact "
    "division of integer sums). Low score = rare/garbage n-grams — the "
    "classic LM-based quality gate, self-trained on the corpus.",
)
def llm_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two map-side-combinable aggregations plus one equi-join keyed by
    bigram. At 100 TB the count table is |bigram-vocab|-sized — far
    smaller than the corpus — and the scoring join shuffles on the
    bigram key with partial aggregation on both sides; in a real
    deployment the count table is the persisted LM artifact and the
    join side is a broadcast of its top slice."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("ws"))
    bg = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(ws) - 1, 1)), "
                "i -> concat(get(ws, i-1), ' ', get(ws, i)))"  # NULL-safe OOB
            )
        ).alias("bigram"),
    )
    cnt = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    return (
        bg.join(cnt, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mean_bigram_count"),
        )
    )


# --- BM25 retrieval scoring ------------------------------------------------

BM25_TERMS = ("spark", "query", "vector")  # fixed probe query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 15

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


def _bm25_term_sql(t: str) -> str:
    # identical operation ORDER as the Spark expression below — every
    # intermediate is the same IEEE double on both engines
    return (
        f"COALESCE(MAX(CASE WHEN t.token = '{t}' THEN "
        f"((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))"
        f" * ((CAST(tf AS DOUBLE) * ({BM25_K1} + 1)) / (CAST(tf AS DOUBLE)"
        f" + {BM25_K1} * ((1 - {BM25_B}) + {BM25_B}"
        f" * (CAST(dl AS DOUBLE) / avgdl)))) END), 0)"
    )


# Module-level so llm_simsearch_rrf's oracle twin can reuse the exact
# same sparse-retrieval CTE (operators/similarity.py).
BM25_SQL = f"""
    WITH stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avgdl
      FROM documents),
    tok AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl, UNNEST(string_split(text, ' ')) AS token
      FROM documents),
    tfc AS (
      SELECT doc_id, dl, token, COUNT(*) AS tf
      FROM tok WHERE token IN ({_BM25_TERMS_SQL})
      GROUP BY doc_id, dl, token),
    dfc AS (
      SELECT token, COUNT(*) AS df FROM tfc GROUP BY token),
    scored AS (
      SELECT t.doc_id,
             COUNT(*) AS n_terms_matched,
             {_bm25_term_sql(BM25_TERMS[0])} AS s0,
             {_bm25_term_sql(BM25_TERMS[1])} AS s1,
             {_bm25_term_sql(BM25_TERMS[2])} AS s2
      FROM tfc t JOIN dfc d ON d.token = t.token CROSS JOIN stats
      GROUP BY t.doc_id)
    SELECT doc_id, CAST(n_terms_matched AS BIGINT) AS n_terms_matched,
           s0 + s1 + s2 AS score
    FROM scored
    ORDER BY s0 + s1 + s2 DESC, doc_id LIMIT {BM25_TOPK}
    """


@register(
    "llm_bm25_score",
    sql=BM25_SQL,
    doc=f"BM25 document retrieval for a fixed {len(BM25_TERMS)}-term query: "
    "length-normalized saturating tf × rational idf ((N-df+0.5)/(df+0.5) — "
    "log-free, so scoring is exactly reproducible cross-engine), top-15 docs",
)
def llm_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse retrieval as the engine runs it at scale: tokens are
    FILTERED to the query terms before any aggregation (predicate on
    the exploded stream — at 100 TB an inverted-index/bloom layout
    makes this a pruned scan, and only matching (doc, term) rows ever
    shuffle). df/N/avgdl are tiny frames cross-joined as broadcasts.
    Per-term partial scores pivot to fixed columns so the final score
    is a FIXED-ORDER 3-term sum — grouped SUM over double rows would
    be partitioning-dependent in the last ulp; s0+s1+s2 is not.
    The idf is the rational Robertson form without the log wrapper:
    monotone in the classic idf, so ranking is preserved, and exactly
    reproducible across engines (log differs in last-ulp between
    libms). Ties break by doc_id."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(F.split("text", " "))).cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    tok = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.explode(F.split("text", " ")).alias("token"),
    ).filter(F.col("token").isin(*BM25_TERMS))
    tfc = tok.groupBy("doc_id", "dl", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tfc.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    idf = (F.col("n_docs") - F.col("df")).cast("double") + 0.5
    idf = idf / (F.col("df").cast("double") + 0.5)
    sat = (F.col("tf").cast("double") * (BM25_K1 + 1)) / (
        F.col("tf").cast("double")
        + BM25_K1 * ((1 - BM25_B) + BM25_B * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    s = idf * sat

    def term_col(t: str):
        return F.coalesce(F.max(F.when(F.col("token") == t, s)), F.lit(0.0))

    scored = (
        tfc.join(F.broadcast(dfc), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
            term_col(BM25_TERMS[0]).alias("s0"),
            term_col(BM25_TERMS[1]).alias("s1"),
            term_col(BM25_TERMS[2]).alias("s2"),
        )
    )
    return (
        scored.select(
            "doc_id",
            "n_terms_matched",
            (F.col("s0") + F.col("s1") + F.col("s2")).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


# --- Winnowing fingerprints ------------------------------------------------
# Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
# Fingerprinting" (SIGMOD 2003): hash every K-gram, then keep the MINIMUM
# hash of each sliding window of W consecutive gram hashes. Guarantees at
# least one fingerprint per W+K-1 tokens while selecting ~2/(W+1) of all
# grams — the standard robust alternative to "every Nth hash" sampling for
# plagiarism/near-dup detection.

WNW_K = 4  # gram size in tokens
WNW_W = 5  # winnowing window in grams

# 32-bit md5-prefix gram hash packed with the 1-based gram position
# (hash*32768 + pos) so min-selection tie-breaks on the EARLIEST
# position identically on both engines. Positions here are < 32768
# (test docs are ~100 tokens); production token counts widen the pack
# to hash*2^32 + pos with a 24-bit hash, same idiom.
_WNW_H_SPARK = (
    f"CASE WHEN size(ws) >= {WNW_K + WNW_W - 1} THEN "
    f"transform(sequence(1, size(ws) - {WNW_K} + 1), "
    f"i -> CAST(conv(substring(md5(CAST(concat_ws(' ', slice(ws, i, {WNW_K})) AS BINARY)), 1, 8), 16, 10) AS BIGINT) * 32768 + i) "
    f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
)
_WNW_SEL_SPARK = (
    f"CASE WHEN size(hs) >= {WNW_W} THEN "
    f"transform(sequence(1, size(hs) - {WNW_W} + 1), j -> array_min(slice(hs, j, {WNW_W}))) "
    f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
)
_WNW_H_SQL = (
    f"CASE WHEN len(ws) >= {WNW_K + WNW_W - 1} THEN "
    f"list_transform(range(1, len(ws) - {WNW_K} + 2), "
    f"i -> CAST(concat('0x', substring(md5(array_to_string(list_slice(ws, i, i + {WNW_K} - 1), ' ')), 1, 8)) AS BIGINT) * 32768 + i) "
    f"ELSE [] END"
)
_WNW_SEL_SQL = (
    f"CASE WHEN len(hs) >= {WNW_W} THEN "
    f"list_transform(range(1, len(hs) - {WNW_W} + 2), j -> list_min(list_slice(hs, j, j + {WNW_W} - 1))) "
    f"ELSE [] END"
)


def winnowing_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, sel, fps) winnowing selection over any (doc_id, text)
    frame — ``sel`` is the per-window min of (hash, position)-packed
    values (position makes min-selection tie-breaks deterministic);
    ``fps`` is the distinct set of the HASH parts (position divided
    back out: matching across documents must be position-blind, or
    two docs sharing a token run would never collide). Row-local
    array lambdas only; the pytest property suite drives this
    directly to assert the winnowing guarantee."""
    return (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
        .select("doc_id", F.expr(_WNW_H_SPARK).alias("hs"))
        .select("doc_id", F.expr(_WNW_SEL_SPARK).alias("sel"))
        .select(
            "doc_id",
            "sel",
            F.array_distinct(F.expr("transform(sel, x -> x div 32768)")).alias("fps"),
        )
    )


@register(
    "llm_winnowing",
    sql=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    hv AS (SELECT doc_id, {_WNW_H_SQL} AS hs FROM toks),
    sel AS (SELECT doc_id, {_WNW_SEL_SQL} AS sel FROM hv),
    fp AS (SELECT doc_id, sel, list_distinct(list_transform(sel, x -> x // 32768)) AS fps FROM sel)
    SELECT doc_id,
           CAST(len(sel) AS BIGINT) AS n_windows,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           CAST(COALESCE(list_sum(fps), 0) AS BIGINT) AS fp_sum,
           CAST(len(fps) AS DOUBLE) / NULLIF(len(sel), 0) AS density
    FROM fp
    """,
    doc=f"Winnowing document fingerprints (Schleimer et al. 2003): min hash "
    f"per sliding window of {WNW_W} {WNW_K}-gram hashes, earliest-position "
    "tie-break; per-doc fingerprint count + order-independent checksum",
)
def llm_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection, fully row-local: the gram
    hashing, the sliding-window min, and the distinct-set collapse are
    all array lambdas over one document — zero shuffle, whole-stage
    codegen, scan-bound at any corpus size. The selected-fingerprint
    SET is what a dedup index would shuffle next (2/(W+1)=~1/3 of the
    gram stream here vs every gram in llm_dedup_substring) — the
    guarantee that any shared run of >= W+K-1 tokens still collides
    on at least one selected fingerprint is the whole point of the
    algorithm. Cross-engine exactness: 32-bit md5-prefix hashes packed
    with the gram position (min therefore tie-breaks on the earliest
    occurrence deterministically); the `fp_sum` column is an
    order-independent checksum of the selected set, so the oracle
    pins the exact fingerprints chosen, not just their count.
    Docs shorter than W+K-1 tokens (and NULL text) yield zero windows
    on both engines."""
    out = winnowing_fingerprints(load_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.size("sel").cast("bigint").alias("n_windows"),
        F.size("fps").cast("bigint").alias("n_fingerprints"),
        F.expr("aggregate(fps, CAST(0 AS BIGINT), (a, x) -> a + x)").alias("fp_sum"),
        (F.size("fps").cast("double") / F.nullif(F.size("sel"), F.lit(0))).alias("density"),
    )


WNW_MIN_SHARED = 2  # pairs must share >= 2 selected fingerprints


@register(
    "llm_dedup_winnow",
    sql=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    hv AS (SELECT doc_id, {_WNW_H_SQL} AS hs FROM toks),
    sel AS (SELECT doc_id, {_WNW_SEL_SQL} AS sel FROM hv),
    fp AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(sel, x -> x // 32768))) AS f
      FROM sel),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b, n_shared
    FROM pairs WHERE n_shared >= {WNW_MIN_SHARED}
    """,
    doc=f"Winnowing-index near-dup candidates: inverted fingerprint index, "
    f"pairs sharing >= {WNW_MIN_SHARED} selected fingerprints (1/(W+1)~third "
    "of the span-index size with the local-coverage guarantee)",
)
def llm_dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing as a dedup CANDIDATE GENERATOR — the reason the
    fingerprints exist: an inverted index over the selected hashes
    finds every pair of documents sharing a token run of >= W+K-1
    (guaranteed by the winnowing coverage property) while indexing
    only ~2/(W+1) of the gram stream — about a third of the
    llm_dedup_substring span index for the same local-overlap class.

    Scale shape is exactly the LSH-band pattern: explode the per-doc
    fingerprint SET (already distinct, row-local), one shuffle on the
    8-byte fingerprint key, pair-count groupBy on (doc_a, doc_b).
    Nothing all-pairs: a fingerprint shared by n docs costs n index
    rows and n(n-1)/2 local pair rows within its bucket — the same
    hot-bucket profile as MinHash bands, and the same `max_bucket`
    HAVING-cap applies verbatim if a fingerprint goes boilerplate-hot
    (see operators/dedup.py lsh_candidates).
    """
    # localCheckpoint BEFORE the explode: with fps referenced exactly
    # once, CollapseProject would inline the whole winnowing lambda
    # chain (hs -> sel -> fps) into the generator and — because
    # Catalyst does not CSE inside lambdas — re-evaluate the gram
    # hashing PER WINDOW ELEMENT, an O(L²) per-doc blowup (measured:
    # sf0.1 goes from sub-second to >100 s). The checkpoint pins the
    # per-row arrays exactly once; it is also the frame a production
    # dedup DAG would materialize as the fingerprint index.
    fp = (
        winnowing_fingerprints(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "fps")
        .localCheckpoint()
        .select("doc_id", F.explode("fps").alias("f"))
    )
    a = fp.select(F.col("doc_id").alias("doc_a"), "f")
    b = fp.select(F.col("doc_id").alias("doc_b"), "f")
    return (
        a.join(b, (a.f == b.f) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= WNW_MIN_SHARED)
    )


# --- BPE encode: apply a merge table ---------------------------------------

# A fixed, hierarchy-exercising merge list (production learns it by
# iterating llm_bpe_merge_step; the encoder contract is "apply a given
# ordered merge table", which is what this pins). th+e -> the shows
# merges composing.
BPE_MERGES = [("t", "h"), ("th", "e"), ("a", "n"), ("i", "n"), ("e", "r"), ("o", "r")]


def _bpe_char_stream_spark() -> str:
    # word separator '§' becomes its own symbol; every char becomes a
    # space-separated token. `split(t1, '')` is one linear regex pass;
    # the per-codepoint `substring(t1, i, 1)` loop it replaced is
    # O(L²) on UTF8String (each substring seeks from the start —
    # measured ~2.5x slower end-to-end at sf0.1). Java's empty-pattern
    # split is per CODE UNIT: identical to DuckDB's codepoint indexing
    # for BMP text (all fixtures); an astral-plane corpus would need
    # the codepoint transform variant back. NULL text stays NULL
    # (split/array_join NULL-propagate); empty text becomes the empty
    # stream '' on both engines (DuckDB via the twin's COALESCE).
    return "array_join(split(t1, ''), ' ')"


def _bpe_char_stream_sql() -> str:
    return (
        "CASE WHEN t1 IS NULL THEN NULL ELSE "
        "COALESCE(array_to_string(CASE WHEN len(t1) >= 1 THEN "
        "list_transform(range(1, len(t1) + 1), i -> t1[i]) "
        "ELSE [] END, ' '), '') END"
    )


def _bpe_apply(expr: str, repl: str) -> str:
    """Wrap ``expr`` in the ordered merge replaces (same fn both engines)."""
    for a, b in BPE_MERGES:
        expr = f"{repl}({expr}, '{a} {b}', '{a}{b}')"
    return expr


@register(
    "llm_bpe_encode",
    sql=f"""
    WITH t AS (SELECT doc_id, replace(text, ' ', '§') AS t1, n_chars FROM documents),
    c AS (SELECT doc_id, n_chars, {_bpe_char_stream_sql()} AS cs FROM t),
    m AS (SELECT doc_id, n_chars, {_bpe_apply("cs", "replace")} AS ms FROM c)
    SELECT doc_id,
           CAST(len(string_split(ms, ' ')) AS BIGINT) AS n_tokens,
           CAST(n_chars AS DOUBLE) / NULLIF(len(string_split(ms, ' ')), 0) AS chars_per_token,
           array_to_string(list_slice(string_split(ms, ' '), 1, 8), ' ') AS head_tokens
    FROM m
    """,
    doc=f"BPE encoding: apply an ordered {len(BPE_MERGES)}-entry merge table "
    "(incl. composing merges th+e->the) over the char stream; per-doc token "
    "count, compression ratio, head tokens",
)
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply half of the tokenizer (llm_bpe_merge_step learns the
    table; this encodes with it): text becomes a space-separated char
    stream with '§' word boundaries, then each merge rule rewrites
    'a b' -> 'ab' in table order — the exact greedy-merge semantics of
    BPE inference, expressed as a fixed chain of string replaces that
    whole-stage codegen fuses into ONE map pass. No shuffle, no UDF,
    no Python: at 100 TB this is scan-bound, embarrassingly parallel,
    and the merge table (vocabulary-sized in production) compiles into
    the task closure the same way the PQ distance table does.
    Left-to-right non-overlapping replace semantics are identical on
    both engines, so token counts are oracle-exact; NULL text
    NULL-propagates, empty text tokenizes to the single empty symbol
    on both engines."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.expr("replace(text, ' ', '§')").alias("t1"), "n_chars")
    c = t.select("doc_id", "n_chars", F.expr(_bpe_char_stream_spark()).alias("cs"))
    m = c.select("doc_id", "n_chars", F.expr(_bpe_apply("cs", "replace")).alias("ms"))
    toks = F.split(F.col("ms"), " ")
    return m.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        (F.col("n_chars").cast("double") / F.nullif(F.size(toks), F.lit(0))).alias("chars_per_token"),
        F.array_join(F.slice(toks, 1, 8), " ").alias("head_tokens"),
    )


# --- Quality gate: the composed keep/drop decision -------------------------

_GATE_SW = "'the', 'a', 'of', 'and', 'to', 'el', 'la', 'de', 'y', 'que', 'der', 'die', 'das', 'und', 'ist', 'le', 'et', 'est'"


@register(
    "llm_quality_gate",
    sql=f"""
    WITH w AS (
      SELECT doc_id, text,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             len(regexp_extract_all(text, '[0-9]')) AS n_digit,
             len(text) AS n_chars_t,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains([{_GATE_SW}], t))) AS sw_hits
      FROM documents)
    SELECT doc_id,
           CASE
             WHEN text IS NULL THEN 'null'
             WHEN n_words < 10 OR n_words > 2000 THEN 'length'
             WHEN CAST(n_digit AS DOUBLE) / NULLIF(n_chars_t, 0) >= 0.2 THEN 'digits'
             WHEN CAST(n_distinct AS DOUBLE) / n_words <= 0.05 THEN 'repetition'
             WHEN sw_hits < 1 THEN 'language'
           END AS drop_reason,
           CASE
             WHEN text IS NULL THEN FALSE
             WHEN n_words < 10 OR n_words > 2000 THEN FALSE
             WHEN CAST(n_digit AS DOUBLE) / NULLIF(n_chars_t, 0) >= 0.2 THEN FALSE
             WHEN CAST(n_distinct AS DOUBLE) / n_words <= 0.05 THEN FALSE
             WHEN sw_hits < 1 THEN FALSE
             ELSE TRUE
           END AS keep
    FROM w
    """,
    doc="Composed quality gate (Gopher-style rule cascade): length band, "
    "digit ratio, vocabulary diversity, stopword presence — keep flag + "
    "first-failing-rule reason, one scan",
)
def llm_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision head of the curation pipeline: individual quality
    signals (llm_text_quality, llm_quality_repetition, langid) exist
    as reports; a production filter needs ONE boolean per document
    plus an auditable reason. This is the Gopher-style rule cascade —
    rules evaluated in a fixed order, the first failure names the
    drop_reason (so corpus-loss dashboards can attribute removals),
    all computed in a single scan inside whole-stage codegen: at
    100 TB this op IS the corpus pass, everything else reads its
    output. NULL text drops with reason 'null'; empty text fails
    'length'; ratios guard their zero denominators identically on
    both engines."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    n_words = F.size(ws)
    n_distinct = F.size(F.array_distinct(ws))
    n_digit = F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]"), F.lit(0)))
    n_chars_t = F.length(F.col("text"))
    sw_hits = F.size(F.expr(f"filter(split(text, ' '), t -> t IN ({_GATE_SW}))"))
    digit_ratio = n_digit.cast("double") / F.nullif(n_chars_t, F.lit(0))
    ttr = n_distinct.cast("double") / n_words
    reason = (
        F.when(F.col("text").isNull(), "null")
        .when((n_words < 10) | (n_words > 2000), "length")
        .when(digit_ratio >= 0.2, "digits")
        .when(ttr <= 0.05, "repetition")
        .when(sw_hits < 1, "language")
    )
    keep = (
        F.when(F.col("text").isNull(), F.lit(False))
        .when((n_words < 10) | (n_words > 2000), F.lit(False))
        .when(digit_ratio >= 0.2, F.lit(False))
        .when(ttr <= 0.05, F.lit(False))
        .when(sw_hits < 1, F.lit(False))
        .otherwise(F.lit(True))
    )
    return d.select("doc_id", reason.alias("drop_reason"), keep.alias("keep"))


# --- Tokenizer vocab coverage curve -----------------------------------------

_COVERAGE_KS = (10, 100, 1000, 10000)
_COVERAGE_KMAX = max(_COVERAGE_KS)


@register(
    "llm_token_coverage",
    sql=f"""
    WITH tok AS (
      SELECT UNNEST(string_split(text, ' ')) AS token FROM documents),
    cnt AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_occ,
                   CAST(COUNT(*) AS BIGINT) AS vocab_size FROM cnt),
    top AS (
      SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk
      FROM cnt ORDER BY n DESC, token LIMIT {_COVERAGE_KMAX}),
    cum AS (
      SELECT rnk, SUM(n) OVER (ORDER BY rnk
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS covered
      FROM top),
    ks AS (SELECT UNNEST([{", ".join(str(k) for k in _COVERAGE_KS)}]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(LEAST(ks.k, tot.vocab_size) AS BIGINT) AS k_eff,
           CAST(cum.covered AS BIGINT) AS covered_occ,
           tot.total_occ, tot.vocab_size,
           CAST(cum.covered AS DOUBLE) / tot.total_occ AS coverage_frac
    FROM ks CROSS JOIN tot
    JOIN cum ON cum.rnk = LEAST(ks.k, tot.vocab_size)
    """,
    doc="Tokenizer vocab-coverage curve: fraction of all token occurrences "
    "covered by the top-K vocabulary at K in "
    f"{_COVERAGE_KS} — the Zipf head/tail economics behind vocab-size choices",
)
def llm_token_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How big a vocabulary buys how much coverage is THE tokenizer-
    design question (the Zipf curve answers 'do we need 32k or 100k
    entries'). Scale shape: token counts are one map-side-combinable
    groupBy (the only corpus-sized pass — the reduce side is keyed by
    distinct tokens, not occurrences); the top-K_max head comes out as
    TakeOrderedAndProject (per-partition heads, no global sort); the
    rank/cumsum window then runs over a CONSTANT-bounded 10k-row frame
    — its single-partition layout is a rollup artifact, not a scale
    smell. Totals ride a 1-row broadcast cross join. All counts stay
    BIGINT; one final double division. K beyond the vocabulary clamps
    to the full-vocab row (coverage 1.0) so the curve keeps all its
    points on tiny corpora; deterministic tie-break (count DESC,
    token ASC) on both engines."""
    d = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    cnt = d.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(
        F.sum("n").cast("bigint").alias("total_occ"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
    )
    top = cnt.orderBy(F.col("n").desc(), "token").limit(_COVERAGE_KMAX)
    wr = W.orderBy(F.col("n").desc(), "token")
    cum = top.select(
        F.row_number().over(wr).alias("rnk"),
        F.sum("n").over(wr.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("covered"),
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in _COVERAGE_KS])).alias("k")
    )
    return (
        ks.crossJoin(F.broadcast(tot))
        .join(cum, F.col("rnk") == F.least(F.col("k"), F.col("vocab_size")))
        .select(
            F.col("k").cast("bigint").alias("k"),
            F.least(F.col("k"), F.col("vocab_size")).cast("bigint").alias("k_eff"),
            F.col("covered").cast("bigint").alias("covered_occ"),
            "total_occ",
            "vocab_size",
            (F.col("covered").cast("double") / F.col("total_occ")).alias("coverage_frac"),
        )
    )


COLLOC_TOPK = 20


@register(
    "llm_collocations",
    sql=f"""
    WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
    g AS (
      SELECT UNNEST(list_transform(range(1, greatest(len(ws), 2)),
                    i -> ws[i] || ' ' || ws[i+1])) AS bigram
      FROM w),
    big AS (
      SELECT bigram, COUNT(*) AS n_ab FROM g
      WHERE bigram IS NOT NULL
      GROUP BY bigram HAVING COUNT(*) >= {NGRAM_MIN_COUNT}),
    uni AS (
      SELECT w1, COUNT(*) AS n_w
      FROM (SELECT UNNEST(ws) AS w1 FROM w) GROUP BY w1),
    tot AS (SELECT SUM(n_w) AS n_tokens FROM uni)
    SELECT bigram, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(ua.n_w AS BIGINT) AS n_a, CAST(ub.n_w AS BIGINT) AS n_b,
           CAST(n_ab AS DOUBLE) * tot.n_tokens
             / (CAST(ua.n_w AS DOUBLE) * ub.n_w) AS lift
    FROM big
    JOIN uni ua ON ua.w1 = split_part(big.bigram, ' ', 1)
    JOIN uni ub ON ub.w1 = split_part(big.bigram, ' ', 2)
    CROSS JOIN tot
    ORDER BY lift DESC, bigram LIMIT {COLLOC_TOPK}
    """,
    doc=f"Collocation mining: top-{COLLOC_TOPK} bigrams by PMI-lift "
    "n_ab*N/(n_a*n_b) with a min-count floor — the log-free phrase-detection "
    "score feeding tokenizer merges and stop-phrase lists",
)
def llm_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which word pairs co-occur far above chance — the collocation
    score behind phrase detection (word2vec-style merges, multiword
    stopword lists, tokenizer vocab curation). The score is PMI as a
    RATIO (lift = P(ab)/(P(a)P(b)), rational in exact counts) rather
    than its log: same ranking, no log() in either engine — the
    catalogued not-correctly-rounded divergence class. One corpus
    scan feeds both count tables (bigram and unigram frequencies,
    each map-side-combinable); the floor prunes the bigram long tail
    BEFORE the two vocabulary-bounded unigram joins (the surviving
    head is tiny — at sf0.01, hundreds of bigrams), the scalar token
    total broadcasts, and the head is TakeOrdered under a total order
    (lift, bigram). NULL bigrams from 1-word docs are filtered
    identically on both engines before grouping."""
    d = load_table(spark, sf_dir, "documents").select(
        F.split(F.col("text"), " ").alias("ws")
    )
    d = d.localCheckpoint(eager=False)  # two consumers: bigrams + unigrams
    bigrams = F.expr(
        "transform(sequence(1, greatest(size(ws) - 1, 1)), "
        "i -> concat(get(ws, i-1), ' ', get(ws, i)))"
    )
    big = (
        d.select(F.explode(bigrams).alias("bigram"))
        .filter(F.col("bigram").isNotNull())
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= NGRAM_MIN_COUNT)
    )
    uni = (
        d.select(F.explode("ws").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("n_w"))
        .localCheckpoint(eager=False)  # three consumers: total + two joins
    )
    tot = uni.agg(F.sum("n_w").alias("n_tokens"))
    ua = uni.select(F.col("w1").alias("wa"), F.col("n_w").alias("n_a"))
    ub = uni.select(F.col("w1").alias("wb"), F.col("n_w").alias("n_b"))
    scored = (
        big.withColumn("wa", F.expr("split_part(bigram, ' ', 1)"))
        .withColumn("wb", F.expr("split_part(bigram, ' ', 2)"))
        .join(ua, "wa")
        .join(ub, "wb")
        .crossJoin(F.broadcast(tot))
        .select(
            "bigram",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            (
                F.col("n_ab").cast("double") * F.col("n_tokens")
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("lift").desc(), "bigram").limit(COLLOC_TOPK)
