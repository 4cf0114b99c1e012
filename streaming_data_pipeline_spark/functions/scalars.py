"""Scalar expression helpers pinning down reference semantics exactly.

Everything here is a pure Column expression (JVM-side, whole-stage
codegen) — no Python UDFs on the hot path (SURVEY.md §2.9). The three
semantic traps called out in SURVEY.md §4 are encoded here:

1. Python truthiness for strings: empty string is falsy
   (`if data.get('user_id')`, Streamingdag.py:216) -> isNotNull AND != ''.
2. `event_hour` parse-failure -> 0 (bare except, Streamingdag.py:207-212).
3. The `user_id != 'unknown'` quality sentinel (Streamingdag.py:216).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def truthy_str(col: Column) -> Column:
    """Python truthiness for a string column: non-null AND non-empty."""
    return col.isNotNull() & (col != F.lit(""))


def message_length(message: Column) -> Column:
    """len(message); None/absent -> 0 (Streamingdag.py:206 via get('message','''))."""
    return F.length(F.coalesce(message, F.lit(""))).cast("long")


def event_hour_lenient(ts_string: Column) -> Column:
    """Hour of an ISO-8601 timestamp string; ANY parse failure -> 0.

    Reference: datetime.fromisoformat(ts.replace('Z','+00:00')).hour with a
    bare except returning 0 (Streamingdag.py:207-212). Two subtleties:

    - ``try_to_timestamp`` returns NULL (not an ANSI error) on bad input,
      so coalesce(.., 0) reproduces the bare-except fallback;
    - ``.hour`` of an offset-aware datetime is the WALL-CLOCK hour as
      written ('...T10:30:00+05:30' -> 10), while Spark's parser would
      convert to session time — so the trailing offset/Z is stripped and
      the local part parsed as a naive timestamp.
    """
    naive = F.regexp_replace(ts_string, "(Z|[+-]\\d{2}:?\\d{2})$", "")
    return F.coalesce(F.hour(F.try_to_timestamp(naive)), F.lit(0)).cast("long")


def data_quality_score(
    user_id: Column, message: Column, value: Column, timestamp_truthy: Column
) -> Column:
    """Sum of four independent +25 rules (Streamingdag.py:214-225):

    (a) user_id truthy AND != 'unknown'
    (b) message truthy (non-empty)
    (c) value > 0 (NULL value -> coerced 0.0 earlier -> rule fails)
    (d) ``timestamp_truthy`` — a BOOLEAN the caller derives from its
        timestamp representation. The reference scores truthiness of the
        RAW WIRE STRING (`if data.get('timestamp')`, Streamingdag.py:222)
        — a non-empty-but-unparseable timestamp still earns +25 — so the
        wire path passes ``truthy_str(event_time_str)``; the typed
        fixture path passes ``ts.isNotNull()`` (equivalent there).
    Result in {0, 25, 50, 75, 100}.
    """
    rule = lambda cond: F.when(cond, F.lit(25)).otherwise(F.lit(0))  # noqa: E731
    return (
        rule(truthy_str(user_id) & (user_id != F.lit("unknown")))
        + rule(truthy_str(message))
        + rule(F.coalesce(value, F.lit(0.0)) > F.lit(0.0))
        + rule(timestamp_truthy)
    ).cast("long")
