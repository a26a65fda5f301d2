"""Scalar-function surface: JSON, regex, string, path, timestamp,
conditional/null, math, array, map (SURVEY.md §2.8 F1-F15).

Reference parity: these reproduce, over the analytic tables, exactly
what the reference's bash layer does with jq/sed/grep/date/cut —
JSON extraction with defaults (`hooks/status-tracker.sh:56,140`),
JSON construction (`hooks/status-tracker.sh:158-182`), regex
extract/replace (`scripts/starry-daemon.sh:154`,
`hooks/status-tracker.sh:33`), `cut -d: -f1` splits
(`scripts/starry-daemon.sh:130-131`), basename/dirname path ops
(`scripts/resolve-namespace.sh:38`), ISO-timestamp formatting and
epoch math (`hooks/status-tracker.sh:153`, `commands/pulse.md:88`),
plan-ID generation (`commands/nova.md:269`), jq-style null defaults
(`hooks/status-tracker.sh:175`).

All are built-in `pyspark.sql.functions` — JVM-side, codegen'd, no
Python in the row path; at 100 TB these run inside whole-stage
codegen at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nova_pulsar_spark.registry import register
from nova_pulsar_spark.sources.tables import finite_measures, load_table


@register(
    "fn_json_extract",
    sql="""
    SELECT
      event_id,
      CASE WHEN json_valid(props)
           THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k_value,
      COALESCE(CASE WHEN json_valid(props)
                    THEN CAST(json_extract_string(props, '$.missing') AS BIGINT) END,
               -1) AS missing_with_default
    FROM events
    """,
    doc="F1: JSON field extraction with jq-style `// default` semantics",
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
        F.coalesce(
            F.get_json_object("props", "$.missing").cast("bigint"), F.lit(-1)
        ).alias("missing_with_default"),
    )


@register(
    "fn_json_build",
    sql="""
    SELECT
      event_id,
      '{"task_id":"' || 'phase-' || CAST(user_id AS VARCHAR) || '-' || event_type ||
      '","tool_count":' || CAST(event_id % 50 AS VARCHAR) || '}' AS status_json
    FROM events
    """,
    doc="F2: JSON construction (status-record build, jq -n shape)",
)
def fn_json_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The engine-native form is to_json(struct(...)); for byte-parity
    # with the oracle we assemble the canonical string explicitly —
    # same output, and still fully codegen'd.
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.concat(
            F.lit('{"task_id":"phase-'),
            F.col("user_id").cast("string"),
            F.lit("-"),
            F.col("event_type"),
            F.lit('","tool_count":'),
            (F.col("event_id") % 50).cast("string"),
            F.lit("}"),
        ).alias("status_json"),
    )


@register(
    "fn_regex_extract",
    sql="""
    SELECT
      doc_id,
      regexp_extract(source, '([a-z]+)([0-9]+)', 1) AS src_prefix,
      CAST(NULLIF(regexp_extract(source, '([a-z]+)([0-9]+)', 2), '') AS BIGINT) AS src_num,
      regexp_extract(text, '^(\\w+)', 1) AS first_word
    FROM documents
    """,
    doc="F4: regex group extraction (plan-id / thread-id patterns)",
)
def fn_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("source", r"([a-z]+)([0-9]+)", 1).alias("src_prefix"),
        # no-match regexp_extract returns '' which BOTH engines refuse
        # to cast — NULLIF first (edge-case fuzz finding)
        F.nullif(F.regexp_extract("source", r"([a-z]+)([0-9]+)", 2), F.lit("")).cast("bigint").alias("src_num"),
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
    )


@register(
    "fn_regex_replace",
    sql="""
    SELECT
      doc_id,
      regexp_replace(source, '[0-9]+', '#', 'g') AS src_masked,
      regexp_replace(substr(text, 1, 50), '\\s+', '_', 'g') AS head_snake
    FROM documents
    """,
    doc="F5: global regex substitution (sed s/// shape)",
)
def fn_regex_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace("source", "[0-9]+", "#").alias("src_masked"),
        F.regexp_replace(F.substring("text", 1, 50), r"\s+", "_").alias("head_snake"),
    )


@register(
    "fn_split_part",
    sql="""
    SELECT
      event_id,
      string_split(event_type || ':' || CAST(user_id AS VARCHAR), ':')[1] AS kind,
      string_split(event_type || ':' || CAST(user_id AS VARCHAR), ':')[2] AS who,
      len(string_split(text, ' ')) AS n_tokens
    FROM events JOIN documents ON events.event_id % 500 = documents.doc_id
    """,
    doc="F6: delimiter split + field access (cut -d: -f1/-f2 shape)",
)
def fn_split_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = load_table(spark, sf_dir, "documents")
    joined = e.join(d, e.event_id % 500 == d.doc_id)
    composite = F.concat(F.col("event_type"), F.lit(":"), F.col("user_id").cast("string"))
    return joined.select(
        "event_id",
        F.element_at(F.split(composite, ":"), 1).alias("kind"),
        F.element_at(F.split(composite, ":"), 2).alias("who"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )


@register(
    "fn_path_ops",
    sql="""
    SELECT
      doc_id,
      '/comms/plans/' || source || '/queued/background/plan-' || CAST(doc_id AS VARCHAR) || '.md' AS path,
      regexp_extract('/comms/plans/' || source || '/queued/background/plan-' || CAST(doc_id AS VARCHAR) || '.md',
                     '([^/]+)$', 1) AS base_name,
      regexp_replace(regexp_extract('/comms/plans/' || source || '/queued/background/plan-' || CAST(doc_id AS VARCHAR) || '.md',
                     '([^/]+)$', 1), '\\.md$', '', 'g') AS plan_id,
      regexp_extract('/comms/plans/' || source || '/queued/background/plan-' || CAST(doc_id AS VARCHAR) || '.md',
                     '^(.*)/[^/]+$', 1) AS dir_name
    FROM documents
    """,
    doc="F7: basename/dirname/strip-extension (S1/P8 plan-id-from-filename)",
)
def fn_path_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("/comms/plans/"),
        F.col("source"),
        F.lit("/queued/background/plan-"),
        F.col("doc_id").cast("string"),
        F.lit(".md"),
    )
    base = F.regexp_extract(path, r"([^/]+)$", 1)
    return d.select(
        "doc_id",
        path.alias("path"),
        base.alias("base_name"),
        F.regexp_replace(base, r"\.md$", "").alias("plan_id"),
        F.regexp_extract(path, r"^(.*)/[^/]+$", 1).alias("dir_name"),
    )


@register(
    "fn_ts_format",
    sql="""
    SELECT
      event_id,
      strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_utc,
      strftime(ts, '%Y-%m-%d') AS day_str,
      CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
      CAST(EXTRACT(dow FROM ts) AS BIGINT) AS day_of_week
    FROM events
    """,
    doc="F8: ISO-8601 formatting + parts (date -u +%Y-%m-%dT%H:%M:%SZ shape)",
)
def fn_ts_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("iso_utc"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.hour("ts").cast("bigint").alias("hour_of_day"),
        # DuckDB dow: Sunday=0; Spark dayofweek: Sunday=1 → align.
        (F.dayofweek("ts") - 1).cast("bigint").alias("day_of_week"),
    )


@register(
    "fn_ts_diff",
    sql="""
    SELECT
      event_id, user_id, ts,
      CAST(EPOCH_US(ts) AS BIGINT) AS epoch_us,
      CAST((EPOCH_US(ts) - EPOCH_US(TIMESTAMP '2024-01-01 00:00:00')) // 60000000 AS BIGINT) AS minutes_since_start,
      CASE WHEN EPOCH_US(ts) - EPOCH_US(TIMESTAMP '2024-01-01 00:00:00') > 600000000
           THEN 'stale' ELSE 'fresh' END AS freshness
    FROM events
    """,
    doc="F9: epoch math, age thresholds (stall/freshness windows W1/P7)",
)
def fn_ts_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    start = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    age_us = F.unix_micros(F.col("ts")) - F.unix_micros(start)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.unix_micros("ts").alias("epoch_us"),
        F.floor(age_us / 60_000_000).cast("bigint").alias("minutes_since_start"),
        F.when(age_us > 600_000_000, "stale").otherwise("fresh").alias("freshness"),
    )


@register(
    "fn_id_gen",
    sql="""
    SELECT
      event_id,
      'plan-' || strftime(ts, '%Y%m%d-%H%M') AS plan_id,
      'phase-' || CAST(event_id % 6 AS VARCHAR) || '-plan-' || strftime(ts, '%Y%m%d-%H%M') AS task_id
    FROM events
    """,
    doc="F10: deterministic ID generation (plan-{YYYYMMDD}-{HHMM})",
)
def fn_id_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    plan_id = F.concat(F.lit("plan-"), F.date_format("ts", "yyyyMMdd-HHmm"))
    return e.select(
        "event_id",
        plan_id.alias("plan_id"),
        F.concat(
            F.lit("phase-"), (F.col("event_id") % 6).cast("string"), F.lit("-"), plan_id
        ).alias("task_id"),
    )


@register(
    "fn_duration_format",
    sql="""
    WITH per_user AS (
      SELECT user_id,
             CAST(EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts)) AS BIGINT) // 1000000 AS dur_s,
             CAST(EPOCH_US(MAX(ts)) AS BIGINT) // 1000000 AS last_s
      FROM events GROUP BY user_id),
    g AS (SELECT CAST(EPOCH_US(MAX(ts)) AS BIGINT) // 1000000 AS now_s FROM events),
    base AS (
      SELECT p.user_id, p.dur_s, g.now_s - p.last_s AS age_s
      FROM per_user p CROSS JOIN g)
    SELECT user_id, dur_s,
      CASE WHEN dur_s < 60 THEN CAST(dur_s AS VARCHAR) || 's'
           WHEN dur_s < 3600 THEN CAST(dur_s // 60 AS VARCHAR) || 'm ' || CAST(dur_s % 60 AS VARCHAR) || 's'
           WHEN dur_s < 86400 THEN CAST(dur_s // 3600 AS VARCHAR) || 'h ' || CAST((dur_s % 3600) // 60 AS VARCHAR) || 'm'
           ELSE CAST(dur_s // 86400 AS VARCHAR) || 'd ' || CAST((dur_s % 86400) // 3600 AS VARCHAR) || 'h'
      END AS duration_str,
      CASE WHEN age_s < 60 THEN CAST(age_s AS VARCHAR) || ' seconds ago'
           WHEN age_s < 3600 THEN CAST(age_s // 60 AS VARCHAR) || ' minutes ago'
           ELSE CAST(age_s // 3600 AS VARCHAR) || ' hours ago'
      END AS updated_str,
      '~' || CAST((dur_s + 59) // 60 AS VARCHAR) || ' minutes' AS eta_str
    FROM base
    """,
    doc="F16: humanized durations — '8m 45s' runtime, '15 seconds ago' "
    "recency, '~15 minutes' ETA (commands/pulsar-status.md:58-87 shapes)",
)
def fn_duration_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's status surface humanizes every duration three
    ways (`/root/reference/commands/pulsar-status.md:58-87`):
    `Duration: 8m 45s`, `Updated: 15 seconds ago`, `Estimated
    remaining: ~15 minutes`. Generalized over events: per-user span →
    duration_str (s / m s / h m / d h tiers), recency vs the corpus
    clock (MAX ts — deterministic, no wall clock) → updated_str, and
    a ceil-minutes ETA. All integer epoch-seconds arithmetic (DIV/%)
    so both engines render identical strings; one groupBy(user_id)
    plus a broadcast of the 1-row global clock — scan-bound at any SF.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1_000_000)
        .cast("bigint")
        .alias("dur_s"),
        (F.unix_micros(F.max("ts")) / 1_000_000).cast("bigint").alias("last_s"),
    )
    g = e.agg((F.unix_micros(F.max("ts")) / 1_000_000).cast("bigint").alias("now_s"))
    s = lambda c: c.cast("string")  # noqa: E731
    d = F.col("dur_s")
    a = F.col("age_s")
    duration_str = (
        F.when(d < 60, F.concat(s(d), F.lit("s")))
        .when(d < 3600, F.concat(s(F.expr("dur_s DIV 60")), F.lit("m "), s(d % 60), F.lit("s")))
        .when(
            d < 86400,
            F.concat(s(F.expr("dur_s DIV 3600")), F.lit("h "), s(F.expr("(dur_s % 3600) DIV 60")), F.lit("m")),
        )
        .otherwise(
            F.concat(s(F.expr("dur_s DIV 86400")), F.lit("d "), s(F.expr("(dur_s % 86400) DIV 3600")), F.lit("h"))
        )
    )
    updated_str = (
        F.when(a < 60, F.concat(s(a), F.lit(" seconds ago")))
        .when(a < 3600, F.concat(s(F.expr("age_s DIV 60")), F.lit(" minutes ago")))
        .otherwise(F.concat(s(F.expr("age_s DIV 3600")), F.lit(" hours ago")))
    )
    eta_str = F.concat(F.lit("~"), s(F.expr("(dur_s + 59) DIV 60")), F.lit(" minutes"))
    return (
        per_user.crossJoin(F.broadcast(g))
        .withColumn("age_s", F.col("now_s") - F.col("last_s"))
        .select(
            "user_id",
            "dur_s",
            duration_str.alias("duration_str"),
            updated_str.alias("updated_str"),
            eta_str.alias("eta_str"),
        )
    )


@register(
    "fn_cond_null",
    sql="""
    SELECT
      event_id,
      NULLIF(event_type, 'view') AS type_or_null,
      COALESCE(NULLIF(event_type, 'view'), 'default') AS type_with_default,
      CASE WHEN value IS NULL THEN 'missing'
           WHEN value < 10.0 THEN 'low'
           ELSE 'high' END AS value_class
    FROM events
    """,
    doc="F11: nullif/coalesce/case chains (jq `//` and bash ${VAR:-x})",
)
def fn_cond_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    type_or_null = F.nullif(F.col("event_type"), F.lit("view"))
    return e.select(
        "event_id",
        type_or_null.alias("type_or_null"),
        F.coalesce(type_or_null, F.lit("default")).alias("type_with_default"),
        F.when(F.col("value").isNull(), "missing")
        .when(F.col("value") < 10.0, "low")
        .otherwise("high")
        .alias("value_class"),
    )


@register(
    "fn_math",
    sql="""
    SELECT
      event_id,
      CAST(FLOOR(value) AS BIGINT) AS v_floor,
      CAST(CEIL(value) AS BIGINT) AS v_ceil,
      ABS(value - 100.0) AS v_absdiff,
      CAST(event_id % 7 AS BIGINT) AS v_mod,
      CASE WHEN value >= 0 THEN SQRT(value) END AS v_sqrt,
      CAST(value * value AS DOUBLE) AS v_sq,
      CAST(100 * event_id // 999 AS BIGINT) AS pct_progress
    FROM events WHERE value IS NULL OR isfinite(value)
    """,
    doc="F12: arithmetic (counter += 1, interval/60, 100*done/total shapes)",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sqrt is IEEE-exact (correctly rounded) in both engines; we avoid
    # transcendentals (pow/ln/exp) in oracle-checked paths since libm
    # implementations may differ in the last ulp. Finite-measures
    # contract: FLOOR/CEIL->BIGINT casts are undefined on NaN/Inf
    # (DuckDB raises) — excluded on both engines; NULLs flow through.
    e = finite_measures(load_table(spark, sf_dir, "events"), "value")
    return e.select(
        "event_id",
        F.floor("value").cast("bigint").alias("v_floor"),
        F.ceil("value").cast("bigint").alias("v_ceil"),
        F.abs(F.col("value") - 100.0).alias("v_absdiff"),
        (F.col("event_id") % 7).cast("bigint").alias("v_mod"),
        # negative input: Spark yields NaN, DuckDB raises — NULL on both
        F.when(F.col("value") >= 0, F.sqrt("value")).alias("v_sqrt"),
        (F.col("value") * F.col("value")).cast("double").alias("v_sq"),
        F.floor(100 * F.col("event_id") / 999).cast("bigint").alias("pct_progress"),
    )


@register(
    "fn_array_ops",
    sql="""
    SELECT
      doc_id,
      len(string_split(text, ' ')) AS n_words,
      string_split(text, ' ')[1] AS first_word,
      string_split(text, ' ')[-1] AS last_word,
      list_contains(string_split(text, ' '), 'spark') AS mentions_spark,
      array_to_string(list_sort(list_distinct(string_split(substr(text, 1, 60), ' '))), '|') AS head_vocab
    FROM documents
    """,
    doc="F13: array size/index/contains/distinct-sort (phase Files lists)",
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    # head_vocab is serialized with concat_ws in the final projection:
    # result columns must be scalar for the driver's hasher (array
    # semantics — size/element_at/contains — are exercised upstream).
    return d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_contains(words, "spark").alias("mentions_spark"),
        # concat_ws over a NULL array is '' on Spark but NULL on DuckDB
        F.when(
            F.col("text").isNotNull(),
            F.concat_ws(
                "|", F.sort_array(F.array_distinct(F.split(F.substring("text", 1, 60), " ")))
            ),
        ).alias("head_vocab"),
    )


@register(
    "fn_map_lookup",
    sql="""
    SELECT
      event_id, event_type,
      CASE event_type
        WHEN 'error' THEN 1 WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
        WHEN 'click' THEN 4 ELSE 5 END AS priority,
      CASE event_type
        WHEN 'error' THEN 'x' WHEN 'purchase' THEN 'v' ELSE 'o' END AS icon
    FROM events
    """,
    doc="F14: map-literal lookup (type→priority P9, status→icon P11)",
)
def fn_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # create_map literal + element_at — the engine-native rendition of
    # the reference's type→priority table (agents/orbiter.md:71-77).
    prio_map = F.create_map(
        F.lit("error"), F.lit(1), F.lit("purchase"), F.lit(2), F.lit("signup"), F.lit(3), F.lit("click"), F.lit(4)
    )
    icon_map = F.create_map(F.lit("error"), F.lit("x"), F.lit("purchase"), F.lit("v"))
    return e.select(
        "event_id",
        "event_type",
        F.coalesce(F.element_at(prio_map, F.col("event_type")), F.lit(5)).cast("int").alias("priority"),
        F.coalesce(F.element_at(icon_map, F.col("event_type")), F.lit("o")).alias("icon"),
    )


@register(
    "fn_string_ops",
    sql="""
    SELECT
      doc_id,
      upper(lang) AS lang_uc,
      trim('  ' || source || '  ') AS src_trim,
      lpad(CAST(doc_id AS VARCHAR), 8, '0') AS id_padded,
      substr(text, 1, 20) AS head,
      length(text) AS n_chars_computed,
      concat_ws('|', lang, source) AS lang_src,
      text LIKE '%vector%' AS has_vector,
      CAST(strpos(text, 'data') AS BIGINT) AS data_pos
    FROM documents
    """,
    doc="F15: case/trim/pad/substr/concat/like/instr",
)
def fn_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.trim(F.concat(F.lit("  "), F.col("source"), F.lit("  "))).alias("src_trim"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("id_padded"),
        F.substring("text", 1, 20).alias("head"),
        F.length("text").cast("bigint").alias("n_chars_computed"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
        F.col("text").like("%vector%").alias("has_vector"),
        F.instr(F.col("text"), "data").cast("bigint").alias("data_pos"),
    )


@register(
    "fn_url_ops",
    sql="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR)
               || '?lang=' || lang AS url
      FROM documents)
    SELECT doc_id, url,
           regexp_extract(url, 'https?://([^/]+)', 1) AS host,
           regexp_extract(url, 'https?://([^./]+)', 1) AS subdomain,
           regexp_extract(url, '://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([a-z]+)', 1) AS lang_param
    FROM u
    """,
    doc="URL parse family: host/subdomain/path/query-param extraction via "
    "identical regexes on both engines (provenance bookkeeping for web corpora)",
)
def fn_url_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition for crawl provenance (the reference's path
    functions, F7, applied to the web-corpus domain): a synthesized
    per-doc URL is split into host/subdomain/path/query-param with
    plain regexp_extract — the same patterns compile on both engines,
    so no parse_url dialect dependence. Pure projection inside
    whole-stage codegen; at 100 TB this is scan-bound map work, and
    the host column is the natural partition/skew key for per-site
    rollups downstream."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/d/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
        F.regexp_extract("url", r"https?://([^./]+)", 1).alias("subdomain"),
        F.regexp_extract("url", r"://[^/]+(/[^?#]*)", 1).alias("path"),
        F.regexp_extract("url", r"[?&]lang=([a-z]+)", 1).alias("lang_param"),
    )


@register(
    "fn_html_strip",
    sql="""
    WITH h AS (
      SELECT doc_id,
             '<html><body><h1>' || source || '</h1><p>' || text
               || '</p><!-- ' || lang || ' --></body></html>' AS html
      FROM documents)
    SELECT doc_id,
           regexp_extract(html, '<h1>([^<]*)</h1>', 1) AS title,
           trim(regexp_replace(regexp_replace(html, '<[^>]*>|<!--.*?-->', ' ', 'g'),
                               ' +', ' ', 'g')) AS clean_text,
           CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT) AS n_tags
    FROM h
    """,
    doc="HTML strip family: tag/comment removal, whitespace collapse, title "
    "extraction, tag census — the markup-cleanup pass of a web-corpus pipeline",
)
def fn_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup cleanup as pure JVM regex projection (no Python, no
    parser): tags and comments removed, whitespace re-collapsed, the
    title captured separately, and a tag census for quality scoring.
    A real boilerplate extractor (trafilatura-style) would slot in as
    a mapInPandas stage like multimodal_decode; the regex pass is the
    scan-bound fast path that handles the bulk of crawl text. Same
    patterns compile on both engines; scan-bound map work at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><body><h1>"),
        F.col("source"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><!-- "),
        F.col("lang"),
        F.lit(" --></body></html>"),
    )
    h = d.select("doc_id", html.alias("html"))
    return h.select(
        "doc_id",
        F.regexp_extract("html", r"<h1>([^<]*)</h1>", 1).alias("title"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace("html", r"<[^>]*>|<!--.*?-->", " "), r" +", " "
            )
        ).alias("clean_text"),
        F.size(F.expr(r"regexp_extract_all(html, '<[^>]*>', 0)")).cast("bigint").alias("n_tags"),
    )
