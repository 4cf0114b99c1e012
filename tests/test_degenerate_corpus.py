"""Degenerate-VALUE corpus robustness (round 11): every query the dirty
sweep (tools/degenerate_corpus_sweep.py) found crashing or diverging
from its oracle on in-contract NULL / empty-string / whitespace values
is pinned here against the oracle on the same corpus. The full
244-query dirty sweep stays a tools/ cadence item (~12 min); this file
re-runs the 45 queries that were red plus the canonical-rule helpers.

The canonical NULL rules the fixes implement (each applied to BOTH the
Spark plan and its DuckDB oracle, so the spec is the agreement):

- NULL text tokenizes as the EMPTY document (functions.text.tokens /
  oracle_text.DUCK_TOKS twin), and DuckDB's array_to_string([]) -> NULL
  is coalesced to '' at every fingerprint render (Spark's concat_ws).
- NULL embeddings are excluded from every vector operator (llm _emb,
  quantize, k-means, random projection): a failed-encoder row has no
  geometry.
- Statistical / rank operators exclude NULL observations (KS, MWU,
  permutation test, winsorize, equi-depth histogram, quantile checks,
  datasheet median); pure rank windows that keep all rows pin NULLS
  LAST explicitly (customer_balance_quartiles).
- NULL group keys: a real category where both engines can express it
  (TV drift pairs day mixes with a null-safe join; snapshot DELETE of
  one partition keeps the NULL partition), excluded where the
  construct cannot hold it (map keys, identified-user baskets /
  timelines / streaming join state, path steps, per-user type maps).
- The tolerant-JSON oracle twin is TRY_CAST(props AS JSON) (T3
  semantics: NULL / '' / malformed -> NULL fields, never a parse
  error).
- Multimodal decode UDFs propagate NULL payloads as NULL features /
  zero frames instead of calling len(None).
"""

from __future__ import annotations

import pytest

from tests.conftest import canon, oracle_df

FIXED_QUERIES = [
    # tokenizer / fingerprint family (NULL text = empty document)
    "dedup_token_set",
    "doc_fingerprints",
    "dedup_keep_best_quality",
    "dedup_unicode_normalized",
    "dedup_near_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_edit_distance_pairs",
    "dedup_exact_text",
    "cdc_chunk_dedup",
    "heavy_hitter_bigrams",
    "curriculum_mix_schedule",
    "cross_source_dup_matrix",
    "dataset_datasheet",
    # NULL-vector exclusion
    "similarity_topk_bruteforce",
    "similarity_ann_lsh",
    "similarity_multiprobe_lsh",
    "similarity_multitable_lsh",
    "similarity_recall_at_k",
    "similarity_ivf",
    "similarity_int8_rerank",
    "similarity_pq_adc",
    "embedding_near_dup_pairs",
    "semantic_dedup_keep_canonical",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "kmeans_lloyd_iterations",
    # stats / rank NULL-observation rule
    "ks_two_sample",
    "mann_whitney_u",
    "permutation_test_mean_diff",
    "winsorized_price_stats",
    "value_histogram_equidepth",
    "approx_quantiles_check",
    "customer_balance_quartiles",
    "kll_quantile_sketch_check",
    # NULL group-key rules
    "daily_distribution_drift",
    "map_column_roundtrip",
    "basket_lift_pairs",
    "top_event_paths",
    "user_event_transitions",
    "snapshot_time_travel",
    "streaming_stream_stream_full_join",
    "streaming_stream_stream_left_join",
    "pii_redaction_stats",
    "etl_dead_letter_routing",
    # tolerant-JSON oracle twin
    "etl_enrich_events",
    "json_props_extract",
    "variant_nested_extract",
    "streaming_etl_file_roundtrip",
    # multimodal NULL payloads
    "multimodal_decode_fake",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
]


@pytest.fixture(scope="module")
def degen_sf(tmp_path_factory):
    from tools.degenerate_corpus_sweep import build_degenerate_dir

    return build_degenerate_dir(str(tmp_path_factory.mktemp("degen_sf")))


@pytest.mark.parametrize("name", FIXED_QUERIES)
def test_fixed_query_matches_oracle_on_degenerate_values(
    spark, duck, degen_sf, name
):
    import __spark_entry__ as entrymod

    got = entrymod.queries()[name](spark, degen_sf).toPandas()
    spark.catalog.clearCache()
    sql = entrymod.oracle_sql().get(name)
    assert sql is not None, f"{name} lost its oracle"
    want = oracle_df(duck, sql, degen_sf)
    assert len(got) == len(want), (len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns)
    assert canon(got) == canon(want)


def test_degenerate_twin_actually_degrades(degen_sf):
    """The builder must produce real dirt — NULLs in every targeted
    column, plus empty and whitespace-only text — or the sweep above
    is vacuous."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    ev = pq.read_table(os.path.join(degen_sf, "events.parquet"))
    for col in ("props", "user_id", "value", "event_type"):
        assert pc.sum(pc.is_null(ev[col])).as_py() > 0, col
    doc = pq.read_table(os.path.join(degen_sf, "documents.parquet"))
    texts = doc["text"].to_pylist()
    assert any(t is None for t in texts)
    assert any(t == "" for t in texts)
    assert any(t is not None and t.strip() == "" and t != "" for t in texts)
    emb = pq.read_table(os.path.join(degen_sf, "embeddings.parquet"))
    assert pc.sum(pc.is_null(emb["embedding"])).as_py() > 0
    # keys and the events timestamp stay in-contract (never degraded)
    assert pc.sum(pc.is_null(ev["event_id"])).as_py() == 0
    assert pc.sum(pc.is_null(ev["ts"])).as_py() == 0


def test_null_text_tokenizes_as_empty_document(spark, duck):
    """The canonical tokenizer rule on both engines: NULL, '', and
    whitespace-only text all produce the empty token set, hence the
    md5('') fingerprint on both sides."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_spark.functions.text import tokens
    from streaming_data_pipeline_spark.plans.oracle_text import DUCK_TOKS

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "a b")], "id long, text string"
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", F.size(tokens(F.col("text"))).alias("n")).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 2}
    rows = duck.execute(
        f"SELECT id, len({DUCK_TOKS}) FROM (VALUES (1, NULL), (2, ''),"
        f" (3, '   '), (4, 'a b')) t(id, text) ORDER BY id"
    ).fetchall()
    assert [(i, n) for i, n in rows] == [(1, 0), (2, 0), (3, 0), (4, 2)]
