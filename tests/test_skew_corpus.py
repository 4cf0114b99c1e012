"""Skew/duplication corpus robustness (round 11, third axis beside the
empty- and degenerate-corpus sweeps): 20% of documents cloned into one
text group, 20% of embeddings duplicated into one vector, and one user
owning ~36% of events. The full 244-query sweep went green on the
FIRST run (tools/sweep_skew_corpus_r11.log) — the group-collapse /
banding / star-topology designs and the deterministic tie-breaks are
what this file pins, via the queries most exposed to each hazard:

- the clone group: one giant token-set group (minhash collapses it to
  ONE signature row; within-group pairs come from the cnt>1 path),
  one giant fingerprint cluster (CC handles a 101-member clique), a
  101-way edit-distance star;
- the duplicate vectors: massive exact cosine ties in top-k (broken
  by cand_id on both engines) and a dense near-dup clique;
- the heavy user: one window partition with ~360 events (sessionize,
  transitions) and one fat streaming-state key.
"""

from __future__ import annotations

import pytest

from tests.conftest import canon, oracle_df

PINNED_QUERIES = [
    # clone-group hazards
    "dedup_exact_text",
    "dedup_token_set",
    "dedup_near_minhash_lsh",
    "dedup_ngram_jaccard",
    "simhash_near_dup",
    "dedup_cluster_components",
    "dedup_edit_distance_pairs",
    "dedup_keep_best_quality",
    "dup_cluster_size_histogram",
    # duplicate-vector hazards
    "similarity_topk_bruteforce",
    "similarity_ivf",
    "embedding_near_dup_pairs",
    "semantic_dedup_keep_canonical",
    # heavy-user hazards
    "sessionize_events_batch",
    "user_event_transitions",
    "top_order_per_customer",
    "streaming_user_sessions",
    "join_skew_diagnostics",
]


@pytest.fixture(scope="module")
def skew_sf(tmp_path_factory):
    from tools.skew_corpus_sweep import build_skew_dir

    return build_skew_dir(str(tmp_path_factory.mktemp("skew_sf")))


@pytest.mark.parametrize("name", PINNED_QUERIES)
def test_pinned_query_matches_oracle_on_skewed_corpus(
    spark, duck, skew_sf, name
):
    import __spark_entry__ as entrymod

    got = entrymod.queries()[name](spark, skew_sf).toPandas()
    spark.catalog.clearCache()
    sql = entrymod.oracle_sql().get(name)
    assert sql is not None, f"{name} lost its oracle"
    want = oracle_df(duck, sql, skew_sf)
    assert len(got) == len(want), (len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns)
    assert canon(got) == canon(want)


def test_skew_twin_actually_skews(skew_sf):
    import os

    import pyarrow.parquet as pq

    doc = pq.read_table(os.path.join(skew_sf, "documents.parquet"))
    texts = doc["text"].to_pylist()
    assert sum(1 for t in texts if t == texts[0]) >= len(texts) // 5
    ev = pq.read_table(os.path.join(skew_sf, "events.parquet"))
    users = ev["user_id"].to_pylist()
    assert sum(1 for u in users if u == 1) >= len(users) // 3
    emb = pq.read_table(os.path.join(skew_sf, "embeddings.parquet"))
    vecs = emb["embedding"].to_pylist()
    assert sum(1 for v in vecs if v == vecs[0]) >= len(vecs) // 5


def test_minhash_collapses_clone_group_to_one_signature(spark, skew_sf):
    """The scale claim under the hazard it exists for: 101 identical
    documents must reach the LSH banding as ONE group row (the
    candidate join never sees the clones), with the 101*100/2
    within-group pairs produced by the cnt>1 expansion instead."""
    from streaming_data_pipeline_spark.operators import dedup
    from streaming_data_pipeline_spark.sources.batch import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, skew_sf, "documents")
    member_ids, groups, _verified = dedup._minhash_group_stage(
        docs, "text", "doc_id", 32, 8, 4, 0.8, None
    )
    biggest = groups.orderBy(F.desc("cnt")).first()
    assert biggest["cnt"] >= 101
    n_groups = groups.count()
    n_docs = docs.count()
    assert n_groups <= n_docs - 100  # clones collapsed before banding
    dedup._release_caches()
