"""Gopher-style quality-rule predicates — the single Spark-side copy.

Three plans apply the same four document-quality rules (word-count
band, mean-word-length band, type-token ratio, max-token dominance):
the batch report ``curation_queries.gopher_rules_filter``, the
model-calibration gate ``curation_queries.linear_model_quality_gate``
(which needs the PASS conjunction, the logical complement of "any flag
set"), and the streaming parity proof
``streaming_queries.streaming_quality_gate``. Before round 7 each
carried its own inlined copy of the predicates — a threshold fix
applied to one and missed in another would diverge silently while both
stayed green against their own oracles. This module is now the only
place the thresholds exist on the Spark side; the DuckDB twin is
``plans/oracle_text.sql_gopher_flag_cases``.

All comparisons are integer-exact cross-multiplications (``7*n_words >
2*chars`` instead of ``chars/n_words < 3.5``): no float division, so
the flags are engine- and summation-order-independent, and everything
stays inside whole-stage codegen.

Reference parity: the rule *shape* follows the Gopher quality
heuristics (Rae et al. 2021, public); thresholds are fixture-scaled.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# word-count acceptance band [lo, hi]; mean-word-length band encoded as
# 7/2 <= chars/words <= 19/4; TTR floor 1/3; dominance cap 1/8.
WC_LO, WC_HI = 25, 90


def gopher_flag_cols(
    n_words: Column | str = "n_words",
    n_types: Column | str = "n_types",
    chars: Column | str = "chars",
    mx: Column | str = "mx",
) -> list[Column]:
    """The four rule-violation flags as 0/1 int columns
    (f_wc, f_mwl, f_ttr, f_dom), ready for a per-source SUM rollup."""
    nw = F.col(n_words) if isinstance(n_words, str) else n_words
    nt = F.col(n_types) if isinstance(n_types, str) else n_types
    ch = F.col(chars) if isinstance(chars, str) else chars
    m = F.col(mx) if isinstance(mx, str) else mx
    return [
        (~nw.between(WC_LO, WC_HI)).cast("int").alias("f_wc"),
        ((7 * nw > 2 * ch) | (4 * ch > 19 * nw)).cast("int").alias("f_mwl"),
        (3 * nt < nw).cast("int").alias("f_ttr"),
        (8 * m > nw).cast("int").alias("f_dom"),
    ]


def gopher_rule_pass(
    n_words: Column | str = "n_words",
    n_types: Column | str = "n_types",
    chars: Column | str = "chars",
    mx: Column | str = "mx",
) -> Column:
    """The PASS conjunction — provably the complement of "any flag set"
    (each conjunct is the negation of one flag's predicate; NULL-free
    inputs make De Morgan exact). Used by the linear-model gate's
    rules-agreement calibration."""
    nw = F.col(n_words) if isinstance(n_words, str) else n_words
    nt = F.col(n_types) if isinstance(n_types, str) else n_types
    ch = F.col(chars) if isinstance(chars, str) else chars
    m = F.col(mx) if isinstance(mx, str) else mx
    return (
        nw.between(WC_LO, WC_HI)
        & (7 * nw <= 2 * ch)
        & (4 * ch <= 19 * nw)
        & (3 * nt >= nw)
        & (8 * m <= nw)
    )


def gopher_report_aggs() -> list[Column]:
    """Per-source rollup over the flag columns: doc count, one fail
    count per rule, and the all-rules-pass count. Map-side partial
    aggregation applies to every term — one shuffle keyed on source."""
    return [
        F.count("*").cast("long").alias("n_docs"),
        F.sum("f_wc").cast("long").alias("fail_word_count"),
        F.sum("f_mwl").cast("long").alias("fail_mean_word_len"),
        F.sum("f_ttr").cast("long").alias("fail_ttr"),
        F.sum("f_dom").cast("long").alias("fail_dominance"),
        F.sum(
            F.when(
                (F.col("f_wc") + F.col("f_mwl") + F.col("f_ttr") + F.col("f_dom"))
                == 0,
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("pass_all"),
    ]
