"""L2 output-processor: raw agent transcript → structured record.

Reference parity: `agents/output-processor.md:33-95` defines
extraction rules over a raw CLI transcript — `Edit: path` lines mean
files modified, `[main abc1234]` means a commit, test-summary lines
carry pass/fail counts. The reference runs an LLM for this; the
engine's default implementation is the deterministic regex-rule
subset (exactly the rules the md-spec enumerates at
output-processor.md:75-95), implemented as an Arrow-batched Pandas
UDF — testable, reproducible, and swappable for an LLM-backed
variant behind the same schema.

Scale: one mapInPandas pass; transcripts never shuffle.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nova_pulsar_spark.registry import register

_EDIT_RE = re.compile(r"^(?:Edit|Write|Update):\s+(\S+)", re.MULTILINE)
_COMMIT_RE = re.compile(r"\[(?:main|master)\s+([0-9a-f]{7,40})\]")
_TESTS_RE = re.compile(r"(\d+)\s+passed(?:.*?(\d+)\s+failed)?")
_ERROR_RE = re.compile(r"^(?:Error|ERROR|Traceback)\b.*$", re.MULTILINE)

# files_modified / commits are '|'-joined strings in the result: the
# driver's hasher needs scalar cells; list forms stay available from
# extract_record() and are pinned by unit tests.
EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("transcript_id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("files_modified", T.StringType()),
        T.StructField("commits", T.StringType()),
        T.StructField("tests_passed", T.IntegerType()),
        T.StructField("tests_failed", T.IntegerType()),
        T.StructField("n_errors", T.IntegerType()),
    ]
)


def extract_record(transcript: str) -> dict:
    """Pure extraction rules (output-processor.md:75-95 subset)."""
    files = sorted(set(_EDIT_RE.findall(transcript)))
    commits = _COMMIT_RE.findall(transcript)
    tm = _TESTS_RE.search(transcript)
    passed = int(tm.group(1)) if tm else 0
    failed = int(tm.group(2)) if tm and tm.group(2) else 0
    errors = _ERROR_RE.findall(transcript)
    # stop-reason sniffing (session-stop.sh:103-113): errors/fails → failed
    status = "failed" if (failed > 0 or errors) else "completed"
    return {
        "status": status,
        "files_modified": files,
        "commits": commits,
        "tests_passed": passed,
        "tests_failed": failed,
        "n_errors": len(errors),
    }


def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        recs = pdf["transcript"].map(extract_record)
        yield pd.DataFrame(
            {
                "transcript_id": pdf["transcript_id"],
                "status": recs.map(lambda r: r["status"]),
                "files_modified": recs.map(lambda r: "|".join(r["files_modified"])),
                "commits": recs.map(lambda r: "|".join(r["commits"])),
                "tests_passed": recs.map(lambda r: r["tests_passed"]).astype("int32"),
                "tests_failed": recs.map(lambda r: r["tests_failed"]).astype("int32"),
                "n_errors": recs.map(lambda r: r["n_errors"]).astype("int32"),
            }
        )


FIXTURE_TRANSCRIPTS = [
    (
        0,
        "Starting phase 1\nEdit: src/auth/model.py\nWrite: tests/test_auth.py\n"
        "Running tests\n12 passed\n[main a1b2c3d] add auth model\nDone.",
    ),
    (
        1,
        "Edit: src/pay/gateway.py\nError: connection refused\nRetrying\n"
        "3 passed, 2 failed\nGiving up.",
    ),
    (
        2,
        "Read: docs/spec.md\nUpdate: README.md\n[main 9f8e7d6] docs pass\n5 passed",
    ),
]


def transcripts_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        FIXTURE_TRANSCRIPTS, "transcript_id long, transcript string"
    )


def _transcripts_values_cte() -> str:
    rows = ",\n      ".join(
        "(" + str(i) + ", '" + t.replace("'", "''") + "')" for i, t in FIXTURE_TRANSCRIPTS
    )
    return f"transcripts AS (SELECT * FROM (VALUES\n      {rows}) AS t(transcript_id, transcript))"


# DuckDB twin of the same RE2-compatible extraction rules (regex
# semantics match Python's re for this pattern subset: multiline ^,
# non-greedy optional group, \b word boundary).
_EXTRACT_SQL = f"""
    WITH
      {_transcripts_values_cte()},
      parsed AS (
        SELECT transcript_id,
               regexp_extract_all(transcript, '(?m)^(?:Edit|Write|Update):\\s+(\\S+)', 1) AS files,
               regexp_extract_all(transcript, '\\[(?:main|master)\\s+([0-9a-f]{{7,40}})\\]', 1) AS commits_l,
               regexp_extract(transcript, '(\\d+)\\s+passed(?:.*?(\\d+)\\s+failed)?', 1) AS p_s,
               regexp_extract(transcript, '(\\d+)\\s+passed(?:.*?(\\d+)\\s+failed)?', 2) AS f_s,
               len(regexp_extract_all(transcript, '(?m)^(?:Error|ERROR|Traceback)\\b.*$', 0)) AS n_err
        FROM transcripts)
    SELECT transcript_id,
           CASE WHEN COALESCE(TRY_CAST(f_s AS INTEGER), 0) > 0 OR n_err > 0
                THEN 'failed' ELSE 'completed' END AS status,
           COALESCE(array_to_string(list_sort(list_distinct(files)), '|'), '') AS files_modified,
           COALESCE(array_to_string(commits_l, '|'), '') AS commits,
           CAST(COALESCE(TRY_CAST(p_s AS INTEGER), 0) AS INTEGER) AS tests_passed,
           CAST(COALESCE(TRY_CAST(f_s AS INTEGER), 0) AS INTEGER) AS tests_failed,
           CAST(n_err AS INTEGER) AS n_errors
    FROM parsed
"""


@register(
    "llm_output_extract",
    sql=_EXTRACT_SQL,
    doc="L2 transcript→struct extraction via mapInPandas (output-processor.md rules)",
)
def llm_output_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_df(spark).mapInPandas(_batches, schema=EXTRACT_SCHEMA)
