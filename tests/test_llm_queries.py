"""Oracle cross-checks + unit behavior for the LLM pipeline operators."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, SF_DIR_MID, assert_query_matches_oracle


def _names():
    from streaming_data_pipeline_spark.plans import llm_queries

    return sorted(llm_queries.QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle_sf0001(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)


@pytest.mark.parametrize(
    "name", ["dedup_near_minhash_lsh", "similarity_topk_bruteforce", "text_stats_by_lang"]
)
def test_query_matches_oracle_sf001(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR_MID)


def test_minhash_finds_known_near_dups(spark):
    """Token-set duplicates planted in a tiny corpus must surface."""
    from streaming_data_pipeline_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=3, text="completely different words entirely unrelated content"),
            Row(doc_id=4, text="dog lazy the over jumps fox brown quick the"),  # reorder
        ]
    )
    pairs = {(r.id_a, r.id_b): r.jaccard for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # same token set
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.8
    assert not any(3 in p for p in pairs)


def test_simhash_similar_docs_close(spark):
    from streaming_data_pipeline_spark.operators.dedup import simhash64

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta eta theta"),
            Row(doc_id=2, text="alpha beta gamma delta epsilon zeta eta iota"),
            Row(doc_id=3, text="one two three four five six seven eight"),
        ]
    )
    sigs = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))  # noqa: E731
    assert len(sigs[1]) == 64
    assert ham(sigs[1], sigs[2]) < ham(sigs[1], sigs[3])


def test_multimodal_stub_raises(spark):
    from streaming_data_pipeline_spark.operators.multimodal import (
        extract_features,
        with_binary_payload,
    )

    docs = spark.createDataFrame([Row(doc_id=1, text="hello")])
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        extract_features(with_binary_payload(docs), use_stub=True).collect()


def test_lsh_topk_subset_of_bruteforce(spark):
    """ANN results are always a subset of the exact scored pairs and
    ranked consistently within the bucket."""
    from streaming_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r.probe_id, r.cand_id): r.cosine
        for r in brute_force_topk(emb, probes, k=500).collect()
    }
    for r in lsh_topk(emb, probes, k=10).collect():
        assert (r.probe_id, r.cand_id) in exact
        assert exact[(r.probe_id, r.cand_id)] == r.cosine
