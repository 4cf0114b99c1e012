"""Round-4 second wave: substring-containment dedup, Gopher-style
quality rules, A-ES weighted sampling, interval-concurrency sweep,
bigram-LM surprisal."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from conftest import SF_DIR, assert_query_matches_oracle


def test_dedup_containment_pairs_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "dedup_containment_pairs", SF_DIR)


def test_gopher_rules_filter_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "gopher_rules_filter", SF_DIR)


def test_weighted_sample_docs_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "weighted_sample_docs", SF_DIR)


def test_max_concurrent_shipments_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "max_concurrent_shipments", SF_DIR)


def test_bigram_lm_surprisal_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "bigram_lm_surprisal", SF_DIR)


def test_containment_finds_planted_pair_and_rejects_scrambles(spark):
    """The rare-shingle pigeonhole must (a) surface a true containment
    even among high-overlap decoys, and (b) never report a pair whose
    shingles all match but whose text is not contiguous."""
    from streaming_data_pipeline_spark.operators.dedup import containment_pairs

    inner = "the quick brown fox jumps over the lazy dog tonight"
    outer = "PREFIX " + inner + " SUFFIX"
    # same multiset of words, different order: full token overlap, not
    # a substring
    scramble = "dog lazy the over jumps fox brown quick the tonight"
    rows = [
        (0, inner),
        (1, outer),
        (2, scramble),
        (3, "completely unrelated content that shares nothing at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.inner_id, r.outer_id)
        for r in containment_pairs(df).collect()
    }
    assert (0, 1) in got
    assert all(p[0] != 2 and p[1] != 2 for p in got)


def test_containment_candidates_are_superset_of_truth(spark):
    """On the fixture: brute-force instr() truth must be exactly what
    the banded operator returns (candidate completeness: every shingle
    of a contained doc appears in the container, so probing ANY subset
    of its shingles cannot miss a true pair)."""
    from streaming_data_pipeline_spark.operators.dedup import containment_pairs
    from streaming_data_pipeline_spark.sources.batch import load_table

    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r.inner_id, r.outer_id)
        for r in containment_pairs(docs).collect()
    }
    a = docs.select(F.col("doc_id").alias("ia"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("ib"), F.col("text").alias("tb"))
    truth = {
        (r.ia, r.ib)
        for r in a.crossJoin(b)
        .filter(
            (F.length("ta") < F.length("tb"))
            & (F.length("ta") >= 12)
            & (F.instr(F.col("tb"), F.col("ta")) > 0)
        )
        .collect()
    }
    assert got == truth


def test_weighted_sample_matches_pure_python_reimplementation(spark):
    """The A-ES selection must be reproducible from the documented
    contract alone: u = (first-13-md5-hex + 1) / 2^52, key = -ln(u)/w
    quantized HALF_UP to 1e-12, k smallest (tie: doc_id)."""
    import duckdb

    from streaming_data_pipeline_spark.plans.curation_queries import (
        weighted_sample_docs,
    )

    got = [
        (r.rank, r.doc_id, r.weight)
        for r in weighted_sample_docs(spark, SF_DIR).collect()
    ]
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, n_chars FROM '{SF_DIR}/documents.parquet'"
        " WHERE n_chars > 0"
    ).fetchall()
    con.close()
    keyed = []
    for doc_id, w in docs:
        x = int(hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()[:13], 16)
        u = (x + 1) / 16**13
        key = Decimal(repr(-math.log(u) / w)).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )
        keyed.append((key, doc_id, w))
    keyed.sort()
    want = [(i + 1, d, w) for i, (_, d, w) in enumerate(keyed[:50])]
    assert got == want


def test_max_concurrent_top1_matches_bruteforce(spark):
    """The sweep's peak must equal a direct count of intervals covering
    the peak date."""
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        max_concurrent_shipments,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    top = max_concurrent_shipments(spark, SF_DIR).collect()[0]
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    d = F.lit(top.peak_date).cast("date")
    n = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("o_orderdate") <= F.col("l_shipdate"))
        .filter(
            (F.col("o_orderdate").cast("date") <= d)
            & (F.col("l_shipdate").cast("date") >= d)
        )
        .count()
    )
    assert n == top.in_transit


def test_bigram_surprisal_nonnegative_and_covers_multi_token_docs(spark):
    from streaming_data_pipeline_spark.plans.training_queries import (
        bigram_lm_surprisal,
    )
    from streaming_data_pipeline_spark.functions.text import tokens
    from streaming_data_pipeline_spark.sources.batch import load_table

    out = bigram_lm_surprisal(spark, SF_DIR)
    rows = out.collect()
    assert all(r.surprisal >= 0 for r in rows)
    docs = load_table(spark, SF_DIR, "documents")
    n_multi = docs.filter(F.size(tokens(F.col("text"))) >= 2).count()
    assert len(rows) == n_multi


def test_gopher_rule_counts_are_consistent(spark):
    from streaming_data_pipeline_spark.plans.curation_queries import (
        gopher_rules_filter,
    )

    from streaming_data_pipeline_spark.sources.batch import load_table

    rows = gopher_rules_filter(spark, SF_DIR).collect()
    assert rows, "expected per-source rows"
    tot = sum(r.n_docs for r in rows)
    assert tot == load_table(spark, SF_DIR, "documents").count()
    for r in rows:
        # pass_all can't exceed docs minus the worst single rule's fails
        worst = max(
            r.fail_word_count, r.fail_mean_word_len, r.fail_ttr, r.fail_dominance
        )
        assert r.pass_all <= r.n_docs - worst
    # thresholds must actually discriminate on this corpus: every rule
    # fails someone, and a meaningful share still passes everything
    assert sum(r.fail_word_count for r in rows) > 0
    assert sum(r.fail_mean_word_len for r in rows) > 0
    assert sum(r.fail_ttr for r in rows) > 0
    assert sum(r.fail_dominance for r in rows) > 0
    assert sum(r.pass_all for r in rows) > 100


def test_bpe_train_merges_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "bpe_train_merges", SF_DIR)


def test_bpe_first_merge_equals_top_pair_count(spark):
    """Round 1's winner must be exactly the max of the standalone
    char-pair count (the tokenizer_bpe_pair_counts surface), and each
    round's winning count must be <= the previous round's (merging
    can only remove occurrences of other pairs, and the argmax is
    non-increasing)."""
    from streaming_data_pipeline_spark.plans.llm_queries import bpe_train_merges
    from streaming_data_pipeline_spark.functions.text import tokens
    from streaming_data_pipeline_spark.sources.batch import load_table

    out = bpe_train_merges(spark, SF_DIR).collect()
    assert [r.step for r in out] == [1, 2, 3, 4, 5]
    docs = load_table(spark, SF_DIR, "documents")
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    pairs = (
        wf.select(
            "n", F.expr("split(w, '')").alias("cs")
        )
        .filter(F.size("cs") >= 2)
        .select(
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(cs) - 1),"
                    " i -> cs[i - 1] || ' ' || cs[i])"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("n").alias("c"))
        .orderBy(F.desc("c"), F.asc("pair"))
        .first()
    )
    assert (out[0].pair, out[0].c) == (pairs.pair, pairs.c)
    counts = [r.c for r in out]
    assert counts == sorted(counts, reverse=True)


def test_repeated_passage_coverage_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "repeated_passage_coverage", SF_DIR)


def test_token_budget_selection_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "token_budget_selection", SF_DIR)


def test_token_budget_selection_respects_budget(spark):
    """Selected tokens never exceed the 60% budget, and the selection is
    maximal at level granularity: adding the boundary level's first
    unselected doc would overflow."""
    from streaming_data_pipeline_spark.functions.text import tokens
    from streaming_data_pipeline_spark.plans.training_queries import (
        token_budget_selection,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    docs = load_table(spark, SF_DIR, "documents")
    total = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t")).count()
    )
    budget = total * 3 // 5
    rows = token_budget_selection(spark, SF_DIR).collect()
    picked = sum(r.tokens_selected for r in rows)
    assert 0 < picked <= budget


def test_k_core_peel_rounds_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "k_core_peel_rounds", SF_DIR)


def test_k_core_trajectory_is_monotone(spark):
    """Peeling can only shrink the graph, and every surviving node in
    the final round has degree >= k within the surviving edge set."""
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        k_core_peel_rounds,
    )

    rows = k_core_peel_rounds(spark, SF_DIR).collect()
    assert [r.round for r in rows] == [1, 2, 3, 4]
    nodes = [r.nodes for r in rows]
    edges = [r.edges for r in rows]
    assert nodes == sorted(nodes, reverse=True)
    assert edges == sorted(edges, reverse=True)


def test_ewma_user_value_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "ewma_user_value", SF_DIR)


def test_ewma_is_between_min_and_max_of_window(spark):
    """A weighted average must lie within the min/max of the events it
    averages (catches weight/shift sign errors)."""
    from pyspark.sql import Window

    from streaming_data_pipeline_spark.plans.analytics_queries import (
        ewma_user_value,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    out = {r.user_id: r.ewma_cents for r in ewma_user_value(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    bounds = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 16)
        .groupBy("user_id")
        .agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
        .collect()
    )
    for r in bounds:
        assert r.lo <= out[r.user_id] <= r.hi


def test_k_anonymity_audit_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "k_anonymity_audit", SF_DIR)


def test_k_anonymity_risky_counts_bounded(spark):
    from streaming_data_pipeline_spark.plans.curation_queries import (
        k_anonymity_audit,
    )

    rows = k_anonymity_audit(spark, SF_DIR).collect()
    for r in rows:
        assert r.risky_groups <= r.qi_groups
        # every risky group has < 5 rows by definition
        assert r.risky_rows < 5 * max(r.risky_groups, 1) + 1


def test_containment_operator_matches_bruteforce_on_random_corpora(spark):
    """Hypothesis: over random low-alphabet corpora with planted
    containments, the rare-shingle candidate machinery + instr verify
    must equal Python brute force exactly — no missed pair regardless
    of shingle collisions or high cross-doc overlap."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from streaming_data_pipeline_spark.operators.dedup import containment_pairs

    doc = st.text(alphabet="ab ", min_size=12, max_size=40)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(doc, min_size=2, max_size=6), st.integers(0, 4))
    def run(texts, plant_idx):
        rows = [(i, t) for i, t in enumerate(texts)]
        # plant a guaranteed containment off one of the docs
        if plant_idx < len(texts):
            rows.append((len(rows), "xx " + texts[plant_idx] + " yy"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.inner_id, r.outer_id)
            for r in containment_pairs(df).collect()
        }
        want = {
            (i, j)
            for i, a in rows
            for j, b in rows
            if i != j and len(a) < len(b) and len(a) >= 12 and a in b
        }
        assert got == want

    run()


def test_streaming_quality_gate_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "streaming_quality_gate", SF_DIR)


def test_streaming_quality_gate_equals_batch_gopher(spark):
    """Batch/stream parity: the array-expression single-agg stream form
    must produce byte-identical rule counts to the batch two-level
    hash-agg form."""
    from streaming_data_pipeline_spark.plans.curation_queries import (
        gopher_rules_filter,
    )
    from streaming_data_pipeline_spark.plans.streaming_queries import (
        streaming_quality_gate,
    )

    batch = sorted(tuple(r) for r in gopher_rules_filter(spark, SF_DIR).collect())
    stream = sorted(
        tuple(r) for r in streaming_quality_gate(spark, SF_DIR).collect()
    )
    assert batch == stream


def test_audio_energy_windows_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "audio_energy_windows", SF_DIR)


def test_audio_frames_partition_the_samples(spark):
    """Frame decomposition must conserve the whole-file features: frame
    counts and energies sum to the unframed decode's totals."""
    from streaming_data_pipeline_spark.operators.multimodal import (
        decode_wav_features,
        decode_wav_frames,
        synth_wav_payloads,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(40)
    pay = synth_wav_payloads(docs).localCheckpoint(eager=True)
    whole = {
        r.doc_id: (r.n_samples, r.sum_sq)
        for r in decode_wav_features(pay).collect()
    }
    framed = (
        decode_wav_frames(pay)
        .groupBy("doc_id")
        .agg(F.sum("n").alias("n"), F.sum("sum_sq").alias("sq"))
        .collect()
    )
    assert len(framed) == len(whole)
    for r in framed:
        assert (r.n, r.sq) == whole[r.doc_id]


def test_cumulative_unique_users_matches_oracle(spark, duck):
    assert_query_matches_oracle(
        spark, duck, "cumulative_unique_users_by_day", SF_DIR
    )


def test_cumulative_users_final_equals_total_distinct(spark):
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        cumulative_unique_users_by_day,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    rows = cumulative_unique_users_by_day(spark, SF_DIR).collect()
    total = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert rows[-1].cumulative_users == total
    assert sum(r.new_users for r in rows) == total


def test_first_touch_attribution_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "first_touch_attribution", SF_DIR)


def test_attribution_conserves_purchases(spark):
    """Every purchase is attributed exactly once: per-entry-type
    purchase counts and cents must sum to the raw totals."""
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        first_touch_attribution,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    rows = first_touch_attribution(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("event_type") == "purchase"
    )
    n = ev.count()
    cents = ev.agg(
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long")).alias("c")
    ).collect()[0].c
    assert sum(r.purchases for r in rows) == n
    assert sum(r.attributed_cents for r in rows) == cents


def test_sparse_dot_topk_pairs_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "sparse_dot_topk_pairs", SF_DIR)


def test_sparse_dot_pairs_only_share_rare_terms(spark):
    """The df cap must hold: every scored pair's shared terms are rare
    (df <= N/4), verified by recomputing the top pair's dot from raw
    term stats."""
    from streaming_data_pipeline_spark.functions.text import tokens
    from streaming_data_pipeline_spark.plans.llm_queries import (
        sparse_dot_topk_pairs,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    top = sparse_dot_topk_pairs(spark, SF_DIR).collect()[0]
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    td = (
        docs.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = td.groupBy("t").agg(F.count("*").alias("df"))
    a = td.filter(F.col("doc_id") == top.id_a).join(dfreq, "t")
    b = td.filter(F.col("doc_id") == top.id_b).join(dfreq, "t")
    joined = (
        a.alias("x")
        .join(b.alias("y"), "t")
        .filter(4 * F.col("x.df") <= n)
        .select(
            (F.col("x.tf") * (n / F.col("x.df")).cast("long")
             * F.col("y.tf") * (n / F.col("y.df")).cast("long")).alias("p")
        )
    )
    # recompute with integer idf surrogate n div df
    dot = (
        a.alias("x")
        .join(b.alias("y"), "t")
        .filter(4 * F.col("x.df") <= n)
        .select(
            (
                F.col("x.tf") * F.expr(f"{n} div x.df")
                * F.col("y.tf") * F.expr(f"{n} div y.df")
            ).alias("p")
        )
        .agg(F.sum("p").alias("s"))
        .collect()[0]
        .s
    )
    assert dot == top.dot


def test_round4b_plans_have_no_cartesian_products(spark):
    """Plan-shape guard for every query added in this wave: no
    CartesianProduct / BroadcastNestedLoopJoin anywhere (the only
    crossJoins are broadcast single-row frames, which Spark folds into
    BroadcastExchange + known-key joins), and the top-k queries use
    TakeOrderedAndProject rather than a global Sort."""
    import __spark_entry__ as entrymod

    names = [
        "dedup_containment_pairs",
        "gopher_rules_filter",
        "weighted_sample_docs",
        "max_concurrent_shipments",
        "bigram_lm_surprisal",
        "repeated_passage_coverage",
        "token_budget_selection",
        "k_core_peel_rounds",
        "ewma_user_value",
        "k_anonymity_audit",
        "cumulative_unique_users_by_day",
        "first_touch_attribution",
        "sparse_dot_topk_pairs",
        "audio_energy_windows",
    ]
    qs = entrymod.queries()
    for name in names:
        plan = (
            qs[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan, name
    for name in ["weighted_sample_docs", "sparse_dot_topk_pairs"]:
        plan = (
            qs[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan, name


def test_bpe_merges_match_pure_python_reimplementation(spark):
    """The 5 learned merges must be reproducible from the documented
    contract alone: overlapping zip pair counts weighted by word
    frequency, argmax (count desc, pair asc), non-overlapping
    leftmost replace — implemented here with collections.Counter and
    str.replace."""
    from collections import Counter

    import duckdb

    from streaming_data_pipeline_spark.plans.llm_queries import bpe_train_merges

    got = [(r.step, r.pair, r.c) for r in bpe_train_merges(spark, SF_DIR).collect()]
    con = duckdb.connect()
    wf = con.execute(
        f"""SELECT w, COUNT(*) AS n FROM (
              SELECT unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS w
              FROM '{SF_DIR}/documents.parquet') GROUP BY w"""
    ).fetchall()
    con.close()
    state = [(" " + " ".join(w) + " ", n) for w, n in wf]
    want = []
    for step in range(1, 6):
        counts: Counter = Counter()
        for s, n in state:
            syms = s.split()
            for a, b in zip(syms, syms[1:]):
                counts[f"{a} {b}"] += n
        pair, c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((step, pair, c))
        a, b = pair.split(" ")
        state = [
            (s.replace(f" {a} {b} ", f" {a}{b} "), n) for s, n in state
        ]
    assert got == want


def test_pmi_collocations_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "pmi_collocations", SF_DIR)


def test_pmi_beats_independence_for_top_pairs(spark):
    """Every reported collocation must actually beat the independence
    prediction (pmi_ppm > 1e6 means c12 * N > c1 * c2)."""
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        pmi_collocations,
    )

    rows = pmi_collocations(spark, SF_DIR).collect()
    assert rows
    assert all(r.pmi_ppm >= rows[-1].pmi_ppm for r in rows)  # sorted desc
    assert rows[0].pmi_ppm > 1_000_000  # top pair beats independence


def test_neyman_allocation_sample_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "neyman_allocation_sample", SF_DIR)


def test_neyman_allocation_sums_to_k_and_draw_is_exact(spark):
    from streaming_data_pipeline_spark.plans.curation_queries import (
        neyman_allocation_sample,
    )

    rows = neyman_allocation_sample(spark, SF_DIR).collect()
    assert sum(r.alloc for r in rows) == 100
    for r in rows:
        assert r.drawn == r.alloc
        assert r.alloc <= r.n_rows


def test_langid_confusion_metrics_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "langid_confusion_metrics", SF_DIR)


def test_langid_confusion_margins_consistent(spark):
    """Support must sum to the corpus size and correct <= support."""
    from streaming_data_pipeline_spark.plans.llm_queries import (
        langid_confusion_metrics,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    rows = langid_confusion_metrics(spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.support for r in rows) == n
    for r in rows:
        assert 0 <= r.correct <= r.support
        assert 0 <= r.recall_ppm <= 1_000_000


def test_dataset_datasheet_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "dataset_datasheet", SF_DIR)


def test_datasheet_stats_are_mutually_consistent(spark):
    from streaming_data_pipeline_spark.plans.llm_queries import dataset_datasheet

    stats = {r.stat: r.value for r in dataset_datasheet(spark, SF_DIR).collect()}
    assert stats["min_chars"] <= stats["median_chars"] <= stats["max_chars"]
    assert stats["distinct_texts"] + stats["exact_dup_docs"] == stats["n_docs"]
    assert stats["vocab_size"] <= stats["n_tokens"]
    assert stats["n_docs"] > 0


def test_within_doc_dedup_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "within_doc_dedup", SF_DIR)


def test_within_doc_dedup_removes_planted_repeats(spark):
    """A doc that is the same chunk repeated must collapse to one
    chunk; a repeat-free doc must keep everything."""
    from streaming_data_pipeline_spark.plans import curation_queries as cq

    rows = [
        (0, "aa bb aa bb aa bb"),        # chunk 'aa bb' x3 -> 1 kept
        (1, "one two three four"),        # 2 distinct chunks -> 2 kept
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        out = {
            r.doc_id: (r.n_chunks, r.kept_chunks)
            for r in cq.within_doc_dedup(spark, d).collect()
        }
    assert out[0] == (3, 1)
    assert out[1] == (2, 2)


def test_winsorized_price_stats_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "winsorized_price_stats", SF_DIR)


def test_winsorized_mean_is_between_p05_p95(spark):
    """After clipping, every group mean must lie inside the clip
    interval, and clip tallies must be ~5% tails overall."""
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        winsorized_price_stats,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    rows = winsorized_price_stats(spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "orders").count()
    lo = sum(r.clipped_low for r in rows)
    hi = sum(r.clipped_high for r in rows)
    # strictly-below-p05 tail is < 5% by definition of the empirical
    # percentile; same for the above-p95 tail
    assert lo < 0.05 * n + 1
    assert hi <= 0.05 * n + 1


def test_basket_lift_pairs_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "basket_lift_pairs", SF_DIR)


def test_basket_lift_top_pair_recomputes(spark):
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        basket_lift_pairs,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    top = basket_lift_pairs(spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n = ut.select("user_id").distinct().count()
    c_a = ut.filter(F.col("event_type") == top.type_a).count()
    c_b = ut.filter(F.col("event_type") == top.type_b).count()
    c_ab = (
        ut.filter(F.col("event_type") == top.type_a)
        .select("user_id")
        .join(
            ut.filter(F.col("event_type") == top.type_b).select("user_id"),
            "user_id",
        )
        .count()
    )
    assert c_ab == top.c_ab
    assert c_ab * n * 1_000_000 // (c_a * c_b) == top.lift_ppm


def test_bpe_apply_compression_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "bpe_apply_compression", SF_DIR)


def test_bpe_apply_learns_same_merges_and_saves_symbols(spark):
    """The apply query's global merge learning must reproduce the
    training query's merges (it aggregates the same totals), and every
    source must end with no more symbols than it started with."""
    from streaming_data_pipeline_spark.plans.llm_queries import (
        bpe_apply_compression,
        bpe_train_merges,
    )

    rows = bpe_apply_compression(spark, SF_DIR).collect()
    assert rows
    total_saved = 0
    for r in rows:
        assert r.symbols_final <= r.symbols_initial
        assert 0 <= r.saved_ppm <= 1_000_000
        total_saved += r.symbols_initial - r.symbols_final
    # each applied merge round fuses (count) pairs, each saving one
    # symbol occurrence: total symbols saved == sum of merge counts
    merges = bpe_train_merges(spark, SF_DIR).collect()
    assert total_saved == sum(m.c for m in merges)


def test_interarrival_gap_stats_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "interarrival_gap_stats", SF_DIR)


def test_interarrival_median_below_p95(spark):
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        interarrival_gap_stats,
    )

    rows = interarrival_gap_stats(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.median_gap_us <= r.p95_gap_us
        assert r.n_gaps > 0


def test_dup_cluster_size_histogram_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "dup_cluster_size_histogram", SF_DIR)


def test_dup_histogram_margins_equal_corpus(spark):
    """Cluster sizes times counts must partition the corpus, and
    removable_dups must equal the token-set dedup query's removable
    total."""
    from streaming_data_pipeline_spark.plans.llm_queries import (
        dup_cluster_size_histogram,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    rows = dup_cluster_size_histogram(spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n
    assert all(r.removable_dups == (r.cluster_size - 1) * r.n_clusters for r in rows)


def test_seasonal_residual_anomaly_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "seasonal_residual_anomaly", SF_DIR)


def test_top_event_paths_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "top_event_paths", SF_DIR)


def test_top_paths_extend_transition_counts(spark):
    """Every length-3 path's count is bounded by the count of its
    length-2 prefix transition (a path is a refinement of its prefix)."""
    from pyspark.sql import Window

    from streaming_data_pipeline_spark.plans.analytics_queries import (
        top_event_paths,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    rows = top_event_paths(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pair_counts = {
        (r.e1, r.e2): r.n
        for r in ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
        )
        .filter(F.col("e2").isNotNull())
        .groupBy("e1", "e2")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        e1, e2, _ = r.path.split(" > ")
        assert r.n <= pair_counts[(e1, e2)]


def test_grouped_leakage_free_split_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "grouped_leakage_free_split", SF_DIR)


def test_grouped_split_has_zero_leakage_and_partitions_corpus(spark):
    from streaming_data_pipeline_spark.plans.training_queries import (
        grouped_leakage_free_split,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    rows = grouped_leakage_free_split(spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n
    assert all(r.sources_in_multiple_splits == 0 for r in rows)


def test_pca_power_iteration_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "pca_power_iteration", SF_DIR)


def test_pca_direction_beats_init_rayleigh(spark):
    """Power iteration must INCREASE the Rayleigh quotient v'Gv (G the
    Gram matrix): the learned direction captures more spectral energy
    than the uniform init, and it is unit-norm with a non-negative
    leading component."""
    import numpy as np

    from streaming_data_pipeline_spark.plans.llm_queries import (
        pca_power_iteration,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    rows = pca_power_iteration(spark, SF_DIR).collect()
    v = np.array([r.component for r in sorted(rows, key=lambda r: r.pos)])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    assert v[0] >= 0
    X = np.array(
        [
            r.x
            for r in load_table(spark, SF_DIR, "embeddings")
            .select(F.col("embedding").cast("array<double>").alias("x"))
            .collect()
        ]
    )
    init = np.full(64, 0.125)
    rq = lambda u: float(u @ (X.T @ (X @ u)) / (u @ u))
    assert rq(v) >= rq(init)


def test_median_imputation_audit_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "median_imputation_audit", SF_DIR)


def test_imputation_shifts_mean_toward_median(spark):
    """Imputed counts must be ~10% of rows (event_id % 10 == 0) and the
    filled mean must lie between the before-mean and the median (the
    fill pulls the average toward the group median)."""
    from streaming_data_pipeline_spark.plans.curation_queries import (
        median_imputation_audit,
    )

    rows = median_imputation_audit(spark, SF_DIR).collect()
    for r in rows:
        assert 0 < r.n_imputed < r.n_rows
        # after-mean is a convex combination of before-mean and median
        # so it can't move past the farther of the two; loose sanity:
        assert abs(r.mean_after_cents - r.mean_before_cents) < r.mean_before_cents


def test_cross_source_dup_matrix_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "cross_source_dup_matrix", SF_DIR)


def test_mann_kendall_trend_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "mann_kendall_trend", SF_DIR)


def test_mann_kendall_margins(spark):
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        mann_kendall_trend,
    )

    r = mann_kendall_trend(spark, SF_DIR).collect()[0]
    assert r.concordant + r.discordant + r.tied == r.n_pairs
    assert r.s_statistic == r.concordant - r.discordant


def test_revenue_gini_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "revenue_gini", SF_DIR)


def test_revenue_gini_in_unit_interval_and_exact_vs_numpy(spark):
    import numpy as np

    from streaming_data_pipeline_spark.plans.analytics_queries import (
        revenue_gini,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    r = revenue_gini(spark, SF_DIR).collect()[0]
    assert 0 <= r.gini_ppm <= 1_000_000
    cents = np.array(
        [
            row.c
            for row in load_table(spark, SF_DIR, "orders")
            .groupBy("o_custkey")
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                        "long"
                    )
                ).alias("c")
            )
            .collect()
        ]
    )
    x = np.sort(cents)
    n = len(x)
    num = int(2 * (np.arange(1, n + 1) * x).sum() - (n + 1) * x.sum())
    den = int(n * x.sum())
    assert (r.gini_num, r.gini_den) == (num, den)


def test_lorenz_curve_deciles_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "lorenz_curve_deciles", SF_DIR)


def test_lorenz_curve_is_convex_and_ends_at_one(spark):
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        lorenz_curve_deciles,
    )

    rows = lorenz_curve_deciles(spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.cum_share_ppm for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] == 1_000_000
    # convexity: per-decile increments are non-decreasing (sorted
    # ascending by revenue)
    inc = [b - a for a, b in zip([0] + shares, shares)]
    assert all(b >= a - 1 for a, b in zip(inc, inc[1:]))  # -1 for div truncation


def test_theil_sen_slope_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "theil_sen_slope", SF_DIR)


def test_theil_sen_median_matches_numpy(spark):
    import numpy as np

    from streaming_data_pipeline_spark.plans.analytics_queries import (
        theil_sen_slope,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    r = theil_sen_slope(spark, SF_DIR).collect()[0]
    monthly = (
        load_table(spark, SF_DIR, "orders")
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("timestamp")).alias("m")
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            ).alias("c")
        )
        .collect()
    )
    pts = sorted((row.m.year * 12 + row.m.month, row.c) for row in monthly)
    slopes = sorted(
        (
            (cj - ci) / (mj - mi),
            cj - ci,
            mj - mi,
        )
        for i, (mi, ci) in enumerate(pts)
        for mj, cj in pts[i + 1 :]
    )
    q, dc, dm = slopes[(len(slopes) + 1) // 2 - 1]
    assert (r.n_pairs, r.slope_num_cents, r.slope_den_months) == (
        len(slopes), dc, dm,
    )


def test_ks_two_sample_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "ks_two_sample", SF_DIR)


def test_ks_statistic_matches_scipy_style_recompute(spark):
    """Recompute D with numpy ECDFs and compare the exact rational."""
    import numpy as np

    from streaming_data_pipeline_spark.plans.analytics_queries import (
        ks_two_sample,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    r = ks_two_sample(spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("c"),
    )
    a = np.array([x.c for x in ev.filter(F.col("event_type") == "purchase").collect()])
    b = np.array([x.c for x in ev.filter(F.col("event_type") == "view").collect()])
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), grid, side="right")
    fb = np.searchsorted(np.sort(b), grid, side="right")
    gaps = np.abs(fa * len(b) - fb * len(a))
    assert int(gaps.max()) == r.d_num
    assert (len(a), len(b), len(a) * len(b)) == (r.n_a, r.n_b, r.d_den)


def test_poisson_bootstrap_ci_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "poisson_bootstrap_ci", SF_DIR)


def test_bootstrap_ci_brackets_point_estimate(spark):
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        poisson_bootstrap_ci,
    )

    r = poisson_bootstrap_ci(spark, SF_DIR).collect()[0]
    assert r.n_resamples == 100
    assert r.ci_lo_cents <= r.point_mean_cents <= r.ci_hi_cents
    assert r.ci_lo_cents < r.ci_hi_cents


def test_cusum_changepoint_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "cusum_changepoint", SF_DIR)


def test_cusum_finds_planted_level_shift(spark):
    """On a synthetic series with a hard level shift, the argmax of
    |n*cumsum_t - t*total| must land exactly on the shift boundary."""
    import datetime

    from pyspark.sql import Window

    # 20 days at 100 cents, then 20 days at 500: change after day 20
    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=i),
         100 if i < 20 else 500)
        for i in range(40)
    ]
    daily = spark.createDataFrame(rows, "d date, x long")
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("d")
    cum = daily.select(
        "d", F.sum("x").over(w).alias("cs"), F.row_number().over(wt).alias("t")
    )
    best = (
        cum.crossJoin(
            F.broadcast(daily.agg(F.sum("x").alias("tot"), F.count("*").alias("n")))
        )
        .select(
            "d",
            F.abs(F.col("n") * F.col("cs") - F.col("t") * F.col("tot")).alias("c"),
        )
        .orderBy(F.desc("c"), F.desc("d"))
        .first()
    )
    assert best.d == datetime.date(2024, 1, 20)


def test_permutation_test_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "permutation_test_mean_diff", SF_DIR)


def test_permutation_p_value_is_calibrated_under_null(spark):
    """The groups differ only by noise in this fixture, so the p-value
    must be non-degenerate (not ~0) — a sign test of calibration, and
    the counts must be internally consistent."""
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        permutation_test_mean_diff,
    )

    r = permutation_test_mean_diff(spark, SF_DIR).collect()[0]
    assert r.n_perms == 100
    assert 0 <= r.n_more_extreme <= r.n_perms
    assert r.p_ppm == r.n_more_extreme * 1_000_000 // r.n_perms
    assert r.p_ppm > 10_000  # not spuriously significant under the null


def test_benford_first_digit_audit_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "benford_first_digit_audit", SF_DIR)


def test_benford_digits_partition_orders(spark):
    from streaming_data_pipeline_spark.plans.curation_queries import (
        benford_first_digit_audit,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    rows = benford_first_digit_audit(spark, SF_DIR).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    n = load_table(spark, SF_DIR, "orders").count()
    assert sum(r.observed for r in rows) == n
    # the ppm shares approximately partition a million (div truncation)
    share = sum(r.observed_ppm for r in rows)
    assert 1_000_000 - 9 <= share <= 1_000_000


def test_mann_whitney_u_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "mann_whitney_u", SF_DIR)


def test_mann_whitney_u_matches_numpy_midranks(spark):
    import numpy as np

    from streaming_data_pipeline_spark.plans.analytics_queries import (
        mann_whitney_u,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    r = mann_whitney_u(spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("c"),
    )
    a = np.array([x.c for x in ev.filter(F.col("event_type") == "purchase").collect()])
    b = np.array([x.c for x in ev.filter(F.col("event_type") == "view").collect()])
    both = np.concatenate([a, b])
    order = np.argsort(both, kind="stable")
    ranks = np.empty(len(both))
    sorted_vals = both[order]
    i = 0
    while i < len(sorted_vals):
        j = i
        while j < len(sorted_vals) and sorted_vals[j] == sorted_vals[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2  # midrank, 1-based average
        i = j
    r_a = ranks[: len(a)].sum()
    u = r_a - len(a) * (len(a) + 1) / 2
    assert r.u2 == int(round(2 * u))
    assert (r.n_a, r.n_b, r.u2_max) == (len(a), len(b), 2 * len(a) * len(b))
    # AUC under the null fixture should hover near 1/2
    assert 450_000 < r.auc_ppm < 550_000


def test_acf_lag_profile_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "acf_lag_profile", SF_DIR)


def test_acf_components_reconstruct_numpy_pearson(spark):
    import numpy as np

    from streaming_data_pipeline_spark.plans.analytics_queries import (
        acf_lag_profile,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    rows = {r.lag: r for r in acf_lag_profile(spark, SF_DIR).collect()}
    daily = (
        load_table(spark, SF_DIR, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            ).alias("x")
        )
        .collect()
    )
    series = {r.d: r.x for r in daily}
    import datetime

    for lag in (1, 3, 7):
        xs, ys = [], []
        for d, x in series.items():
            d2 = d + datetime.timedelta(days=lag)
            if d2 in series:
                xs.append(x)
                ys.append(series[d2])
        x = np.array(xs, dtype=object)
        y = np.array(ys, dtype=object)
        n = len(x)
        num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
        dx = n * sum(a * a for a in xs) - sum(xs) ** 2
        dy = n * sum(b * b for b in ys) - sum(ys) ** 2
        r = rows[lag]
        assert (r.n_pairs, int(r.num), int(r.den_x), int(r.den_y)) == (
            n, num, dx, dy,
        )
        # and the reconstructed Pearson r is a valid correlation
        assert abs(num / (dx * dy) ** 0.5) <= 1.0


def test_linear_model_quality_gate_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "linear_model_quality_gate", SF_DIR)


def test_linear_gate_agreement_beats_chance(spark):
    """The fitted linear gate must agree with the rule gate well above
    the independence baseline (its whole point is approximating the
    rules with one dot product)."""
    from streaming_data_pipeline_spark.plans.curation_queries import (
        linear_model_quality_gate,
    )

    rows = linear_model_quality_gate(spark, SF_DIR).collect()
    n = sum(r.n_docs for r in rows)
    agree = sum(r.agree for r in rows)
    mp = sum(r.model_pass for r in rows) / n
    rp = sum(r.rule_pass for r in rows) / n
    chance = mp * rp + (1 - mp) * (1 - rp)
    assert agree / n > chance + 0.10


def test_spearman_rank_correlation_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "spearman_rank_correlation", SF_DIR)


def test_spearman_matches_scipy_style_recompute(spark):
    """Rebuild rho from raw per-customer pairs with numpy midranks and
    compare the exact integer components."""
    import numpy as np

    from streaming_data_pipeline_spark.plans.analytics_queries import (
        spearman_rank_correlation,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    r = spearman_rank_correlation(spark, SF_DIR).collect()[0]
    cust = (
        load_table(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("x"),
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            ).alias("y"),
        )
        .collect()
    )

    def rank2(vals):
        order = np.argsort(vals, kind="stable")
        out = np.empty(len(vals), dtype=object)
        sv = np.array(vals)[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            for k in range(i, j):
                out[order[k]] = i + j + 1  # 2*midrank with 1-based ranks
            i = j
        return out

    xs = [c.x for c in cust]
    ys = [c.y for c in cust]
    r2x, r2y = rank2(xs), rank2(ys)
    n = len(xs)
    num = n * sum(a * b for a, b in zip(r2x, r2y)) - sum(r2x) * sum(r2y)
    dx = n * sum(a * a for a in r2x) - sum(r2x) ** 2
    dy = n * sum(b * b for b in r2y) - sum(r2y) ** 2
    assert (r.n_customers, int(r.num), int(r.den_x), int(r.den_y)) == (
        n, num, dx, dy,
    )
    rho = num / (dx * dy) ** 0.5
    assert 0.5 < rho <= 1.0  # order count and revenue are strongly monotone


def test_kaplan_meier_table_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "kaplan_meier_table", SF_DIR)


def test_km_table_is_a_valid_life_table(spark):
    """Life-table invariants: at-risk counts decrease by exactly the
    prior row's exits (d+c), the first at-risk equals the user count,
    and every cell is consistent."""
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        kaplan_meier_table,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    rows = kaplan_meier_table(spark, SF_DIR).collect()
    users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert rows[0].n_at_risk == users
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_at_risk == prev.n_at_risk - (
            prev.churn_events + prev.censored
        )
    last = rows[-1]
    assert last.n_at_risk == last.churn_events + last.censored
