"""LLM training-data pipeline plans (north star, SURVEY.md §2.12):
dedup (exact / token-set / MinHash-LSH / SimHash), similarity search
(brute-force + random-hyperplane LSH), text analysis (stats, lang-id,
token counting, fingerprints), multimodal plumbing.

Every query is paired with a DuckDB oracle. Portability contract:
- all hashing via md5 (identical hex in both engines);
- tokenization: single-space split, drop empties;
- ratios/averages derived from integer sums only (no float-order drift);
- vector math: element-wise double casts, left-to-right folds; the
  oracle embeds a generated explicit sum chain with the same order;
- LSH hyperplanes are +-1 literals from a seeded PRNG at plan-build
  time, shared verbatim by both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.functions.text import (
    LANG_CUES,
    STOPWORDS,
    lang_id,
    punct_ratio,
    regex_token_count,
    text_fingerprint,
    token_count,
    token_set_fingerprint,
    tokens,
)
from streaming_data_pipeline_spark.functions.text import word_shingles
from streaming_data_pipeline_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    simhash64,
    simhash_near_dup_pairs,
    token_set_dedup_groups,
)
from streaming_data_pipeline_spark.operators.multimodal import (
    extract_features,
    with_binary_payload,
)
from streaming_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    hyperplanes,
    int8_rerank_topk,
    ivf_topk,
    lsh_topk,
    multiprobe_lsh_topk,
    multitable_lsh_topk,
    near_dup_pairs,
    pq_adc_topk,
)
from streaming_data_pipeline_spark.sources.batch import load_table, spread_small_scan

N_PROBES = 5  # probe set: vec_id < 5
DIM = 64


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats; every metric is a ratio of integer
    sums, so cross-engine equality is exact."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        token_count(F.col("text")).alias("tc"),
        F.length("text").cast("long").alias("nchars"),
        F.size(F.regexp_extract_all("text", F.lit("[^a-zA-Z0-9 ]"), 0))
        .cast("long")
        .alias("punct"),
        F.size(F.filter(tokens(F.col("text")), lambda t: t.isin(*[F.lit(s) for s in STOPWORDS])))
        .cast("long")
        .alias("stops"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("tc").alias("total_tokens"),
            F.round(F.sum("tc") / F.count("*"), 4).alias("avg_tokens"),
            F.round(F.sum("nchars") / F.count("*"), 4).alias("avg_chars"),
            F.round(F.sum("punct") / F.sum("nchars"), 6).alias("punct_char_ratio"),
            F.round(F.sum("stops") / F.sum("tc"), 6).alias("stopword_token_ratio"),
        )
        .orderBy("lang")
    )


def token_counts_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs punctuation-aware (BPE-ish regex) token totals."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            token_count(F.col("text")).alias("ws"),
            regex_token_count(F.col("text")).alias("re"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("ws").alias("total_ws_tokens"),
            F.sum("re").alias("total_regex_tokens"),
        )
        .orderBy("source")
    )


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cue-word language id per document + agreement with the label."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id(F.col("text")).alias("predicted_lang"),
    ).withColumn(
        "agrees", (F.col("labeled_lang") == F.col("predicted_lang")).cast("boolean")
    ).orderBy("doc_id")


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-text and order-insensitive token-set fingerprints."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text_fingerprint(F.col("text")).alias("text_fp"),
        token_set_fingerprint(F.col("text")).alias("token_fp"),
    ).orderBy("doc_id")


def _doc_q10() -> "F.Column":
    """Integer x10 document quality score (length band + punct ratio +
    stopword presence) — shared by the per-source histogram and the
    keep-best-quality dedup policy."""
    n = F.length("text")
    return (
        F.when((n >= 20) & (n <= 10000), F.lit(4)).otherwise(F.lit(0))
        + F.when(punct_ratio(F.col("text")) <= 0.2, F.lit(3)).otherwise(F.lit(0))
        + F.when(
            F.size(F.filter(tokens(F.col("text")), lambda t: t.isin(*[F.lit(s) for s in STOPWORDS]))) > 0,
            F.lit(3),
        ).otherwise(F.lit(0))
    ).cast("long")


def doc_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score histogramming (integer x10 scores -> exact avg)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", _doc_q10().alias("q10"))
        .groupBy("source")
        .agg(
            F.count("*").alias("doc_count"),
            F.round(F.sum("q10") / (F.count("*") * 10), 4).alias("avg_quality"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Dedup
# --------------------------------------------------------------------------
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(docs).orderBy("fp")


def dedup_token_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Only groups with >1 member (the removable near-dups)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        token_set_dedup_groups(docs)
        .filter(F.col("dup_count") > 1)
        .orderBy("fp")
    )


def dedup_near_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No orderBy: the output is millions of pairs on this corpus and the
    # driver's value compare is order-insensitive — a final total sort
    # would be pure shuffle cost (same for the other pair queries).
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.8)


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash64(docs).orderBy("doc_id")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs — order-sensitive dedup (the
    bag-of-words Jaccard above can't tell reshuffled documents apart)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.8, tokens_fn=word_shingles)


def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: chunk-match candidates, Hamming <= 3."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(docs)


def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the MinHash-LSH
    graph (operators/dedup.minhash_cluster_labels, Pregel-style
    min-label propagation on the token-set GROUP graph — doc-level CC
    would propagate over the combinatorially expanded doc pairs, ~2.6M
    at sf0.1, where the group graph has a few thousand edges) — the step
    that turns pairwise near-dups into "keep one doc per cluster". Docs
    in no pair are singleton clusters. The DuckDB oracle runs the same
    unrolled pointer-doubling min-label propagation on the GROUP graph
    (r9: group representatives as nodes, verified group pairs as edges
    — the doc-pair expansion it used to propagate over was 165 s of a
    206 s oracle at sf0.1), with a fixpoint-certificate round that
    injects a loud sentinel row if unconverged — never a silent wrong
    pass; unlike the earlier transitive-closure CTE this oracle also
    runs at sf0.1, so the full-scale sweep has no skips."""
    from streaming_data_pipeline_spark.operators.dedup import (
        minhash_cluster_labels,
    )

    docs = load_table(spark, sf_dir, "documents")
    # no total sort (r11) — see image_phash_near_dup
    return minhash_cluster_labels(docs, threshold=0.8)


def tfidf_top_terms(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Top-k terms per language by corpus TF-IDF weight. The idf factor
    is the log-free rational n_docs/df (libm log is not bit-identical
    across engines; the rational form preserves the ranking for df >= 1
    and keeps the score an exact integer-ratio double). Deterministic
    tiebreak: score desc, term asc."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tok = docs.select(
        "lang", "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    stats = tok.groupBy("lang", "term").agg(
        F.count("*").alias("tf_sum"),
        F.countDistinct("doc_id").alias("df_docs"),
    )
    scored = stats.join(F.broadcast(n_docs), "lang").withColumn(
        "score",
        F.round(F.col("tf_sum") * F.col("n_docs") / F.col("df_docs"), 4),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "lang",
            "term",
            "tf_sum",
            "df_docs",
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("lang", "rank")
    )


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column — the storage
    shape a 100 TB vector corpus actually ships (4x smaller than f32,
    8x than f64). Per vector: symmetric scale 127/max|x|, q_i =
    floor(x*scale + 0.5) (floor is exact in both engines, unlike
    round's engine-specific tie rule), integer checksum of the codes,
    and the max absolute reconstruction error (max, not sum — order-
    independent float math)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()  # canonical NULL-vector rule (_emb)
    )
    staged = (
        emb.withColumn("arr", F.transform("embedding", lambda x: x.cast("double")))
        .withColumn("amax", F.array_max(F.transform("arr", F.abs)))
        .withColumn(
            "scale",
            F.when(F.col("amax") > 0, F.lit(127.0) / F.col("amax")).otherwise(
                F.lit(1.0)
            ),
        )
        .withColumn(
            "q",
            F.transform(
                "arr",
                lambda x: F.floor(x * F.col("scale") + F.lit(0.5)).cast("long"),
            ),
        )
    )
    return staged.select(
        "vec_id",
        F.round("scale", 6).alias("scale_r"),
        F.aggregate("q", F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "q_sum"
        ),
        F.round(
            F.array_max(
                F.zip_with(
                    "arr",
                    "q",
                    lambda x, qi: F.abs(x - qi.cast("double") / F.col("scale")),
                )
            ),
            8,
        ).alias("max_abs_err"),
    ).orderBy("vec_id")


def quality_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality rules per document: the fraction
    of word trigrams that are duplicates, and the fraction of bigram
    slots covered by the single most-common bigram (the fixture has no
    line structure, so the classic duplicate-line rule maps to n-gram
    repetition). Both are integer-ratio doubles; ``repetitive`` is the
    filter flag a cleaning pipeline would drop on.

    Scale shape: two per-doc hash aggregations (explode -> count), both
    keyed by doc_id — partitions by document, no global state.
    Reference anchor: quality filtering at SURVEY §2.12 (data_quality_score,
    Streamingdag.py:243-258) extended with the public Gopher rules."""
    from streaming_data_pipeline_spark.functions.text import all_word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        all_word_ngrams(F.col("text"), 3).alias("tri"),
        all_word_ngrams(F.col("text"), 2).alias("bi"),
    )
    stats = base.select(
        "doc_id",
        "n_tokens",
        F.size("tri").alias("n_tri"),
        F.size(F.array_distinct("tri")).alias("n_tri_distinct"),
        F.size("bi").alias("n_bi"),
    )
    top_bi = (
        base.select("doc_id", F.explode("bi").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bi_count"))
    )
    fracs = (
        stats.join(top_bi, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.when(
                F.col("n_tri") > 0,
                F.round(
                    (F.col("n_tri") - F.col("n_tri_distinct")).cast("double")
                    / F.col("n_tri"),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_trigram_frac"),
            F.when(
                F.col("n_bi") > 0,
                F.round(
                    F.coalesce(F.col("top_bi_count"), F.lit(0)).cast("double")
                    / F.col("n_bi"),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
        )
    )
    return fracs.withColumn(
        "repetitive",
        (F.col("dup_trigram_frac") > 0.2) | (F.col("top_bigram_frac") > 0.18),
    ).orderBy("doc_id")


# Benchmark-contamination split: every 41st doc_id plays the "held-out
# benchmark" role; the check reports 5-gram overlap of the rest of the
# corpus against that set — the standard decontamination pass an LLM
# training pipeline runs before training.
_BENCH_MOD = 41


def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per non-benchmark document: how many of its distinct word
    5-grams appear anywhere in the benchmark split, the contamination
    fraction, and the drop flag.

    Scale shape: the benchmark gram set is tiny relative to the corpus
    (distinct 5-grams of a fixed eval suite), so it broadcasts; the
    corpus side is one explode + broadcast-hash semi-join + per-doc
    count — no corpus-side shuffle beyond the doc_id aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    bench_grams = (
        docs.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode(word_shingles(F.col("text"), 5)).alias("gram"))
        .distinct()
    )
    corpus = docs.filter(F.col("doc_id") % _BENCH_MOD != 0).select(
        "doc_id", word_shingles(F.col("text"), 5).alias("grams")
    )
    # ONE corpus pass (r11, guide §2.4): total and overlap come out of
    # the same explode — size() rides along the exploded rows and one
    # hash-agg keyed doc_id replaces the old {explode+agg} ⋈ {second
    # corpus scan} plan (the shingle split ran twice and the totals
    # joined back). explode_outer keeps zero-gram docs as one NULL-gram
    # row, which the left broadcast join scores 0 — exactly the rows
    # the old left join re-attached with coalesce(...,0).
    hit = (
        corpus.select(
            "doc_id",
            F.size("grams").cast("long").alias("total_ngrams"),
            F.explode_outer("grams").alias("gram"),
        )
        .join(F.broadcast(bench_grams.withColumn("bhit", F.lit(1))), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.any_value("total_ngrams").alias("total_ngrams"),
            F.sum(F.coalesce(F.col("bhit"), F.lit(0))).alias("overlap_ngrams"),
        )
    )
    return (
        hit.select(
            "doc_id",
            "total_ngrams",
            F.col("overlap_ngrams").cast("long").alias("overlap_ngrams"),
        )
        .withColumn(
            "contamination_frac",
            F.when(
                F.col("total_ngrams") > 0,
                F.round(
                    F.col("overlap_ngrams").cast("double") / F.col("total_ngrams"), 4
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("contaminated", F.col("overlap_ngrams") > 0)
        # no total sort (r11): the range sampler re-ran the shingle
        # explode tail once more just for bounds
    )


# Per-language sampling quotas as hex thresholds on the first md5 byte:
# 'en' keeps hashes below 0x40 (~25%), every other language below 0x80
# (~50%) — the "downsample the dominant language" rebalance an LLM data
# mix applies. Lowercase-hex string compare is identical cross-engine.
_SAMPLE_THRESH = {"en": "40", "de": "80", "es": "80", "fr": "80", "zh": "80"}


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-stratified sampling: a doc survives iff the
    first byte of md5('samp:' || doc_id) falls under its language's
    quota threshold. Salted-hash bucketing makes the sample reproducible
    across runs/engines and composable with dedup (no RNG state).

    Scale shape: a pure narrow filter — the quota map broadcasts, no
    shuffle at all; at 100 TB this is a single scan that prunes rows at
    the source."""
    docs = load_table(spark, sf_dir, "documents")
    thr = spark.createDataFrame(
        sorted(_SAMPLE_THRESH.items()), "lang string, thr string"
    )
    return (
        docs.join(F.broadcast(thr), "lang")
        .withColumn(
            "h2",
            F.substring(
                F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))), 1, 2
            ),
        )
        .filter(F.col("h2") < F.col("thr"))
        .select("doc_id", "lang", "h2")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------
def _emb(spark, sf_dir):
    """Embeddings with NULL vectors excluded — the canonical rule for
    every vector operator (similarity tiers, near-dup CC, quantization,
    k-means): a failed-encoder row has no geometry, so it is neither a
    probe, a candidate, a centroid seed, nor a cluster node. Every
    DuckDB oracle twin applies the identical `embedding IS NOT NULL`."""
    return load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )


def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # no total sort (r11): the rank column carries the per-probe order;
    # the range sampler re-ran the scoring tail once more just for bounds
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < N_PROBES))


def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # no total sort (r11) — see similarity_topk_bruteforce
    return lsh_topk(emb, emb.filter(F.col("vec_id") < N_PROBES))


def similarity_multiprobe_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k: probe bucket + every Hamming-1 neighbor
    bucket, recovering most of what single-bucket LSH loses at the sign
    boundaries, with stored codes never reshuffled (broadcast probes)."""
    emb = _emb(spark, sf_dir)
    # no total sort (r11) — see similarity_topk_bruteforce
    return multiprobe_lsh_topk(emb, emb.filter(F.col("vec_id") < N_PROBES))


def similarity_multitable_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table (16 x 6-bit) LSH top-k — the amplification layout a
    single (multi-probed) table cannot match; see
    operators/similarity.multitable_lsh_topk for the recall math."""
    emb = _emb(spark, sf_dir)
    # no total sort (r11) — see similarity_topk_bruteforce
    return multitable_lsh_topk(emb, emb.filter(F.col("vec_id") < N_PROBES))


def similarity_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of each ANN path against the exact brute-force top-10,
    per probe — the approximation-quality measurement the ANN designs
    owe. Measured floors on the fixture (near-isotropic vectors, the
    LSH worst case — true top-10 cosine ~0.25-0.3 vs bulk ~0.0):
    single-table LSH ~0.02-0.04 avg, multiprobe ~0.14-0.22,
    multi-table (16x6) ~0.4 min / ~0.6 avg at a ~25% scan fraction,
    IVF 0.94-0.98 (IVF exploits the residual directional structure
    directly), int8+rerank 1.0 (quantization error is far below the
    top-10/rest margin, and the 5x shortlist absorbs what remains),
    PQ-ADC 0.4-0.9 avg ~0.7 (8-byte codes, 32x compression — the
    recall price of a 16-entry codebook on near-isotropic data; real
    clustered corpora sit much higher). Demonstrates multitable >=
    multiprobe >= single-bucket recall, and the compression/recall
    ladder int8 (4x, ~1.0) vs PQ (32x, ~0.7)."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    bf = brute_force_topk(emb, probes).select("probe_id", "cand_id")
    approx = {
        "lsh_recall": lsh_topk(emb, probes),
        "multiprobe_recall": multiprobe_lsh_topk(emb, probes),
        "multitable_recall": multitable_lsh_topk(emb, probes),
        "ivf_recall": ivf_topk(emb, probes),
        "int8_rerank_recall": int8_rerank_topk(emb, probes),
        "pq_adc_recall": pq_adc_topk(emb, probes),
    }
    out = bf
    for name, df in approx.items():
        hit = df.select("probe_id", "cand_id").withColumn(name, F.lit(1))
        out = out.join(hit, ["probe_id", "cand_id"], "left")
    return (
        out.groupBy("probe_id")
        .agg(
            *[
                F.round(
                    F.sum(F.coalesce(F.col(n), F.lit(0))) / F.count("*"), 4
                ).alias(n)
                for n in approx
            ]
        )
        # no total sort (r11): 8 rows over the heaviest ANN tail — the
        # range sampler re-ran all six scoring paths once more
    )


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no total sort (r11) — see image_phash_near_dup
    return near_dup_pairs(_emb(spark, sf_dir), threshold=0.3)


def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: nprobe nearest centroid lists per probe."""
    emb = _emb(spark, sf_dir)
    # no total sort (r11) — see similarity_topk_bruteforce
    return ivf_topk(emb, emb.filter(F.col("vec_id") < N_PROBES))


def similarity_int8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized two-stage ANN: int8 asymmetric scoring over the whole
    corpus, exact f64 rerank of the 50-candidate shortlist — the
    standard scan-codes-then-rerank shape at 100 TB (4x less scan IO).
    Recall is measured against brute force in similarity_recall_at_k
    (int8_rerank_recall column)."""
    emb = _emb(spark, sf_dir)
    # no total sort (r11) — see similarity_topk_bruteforce
    return int8_rerank_topk(emb, emb.filter(F.col("vec_id") < N_PROBES))


# --------------------------------------------------------------------------
# Multimodal plumbing
# --------------------------------------------------------------------------
def multimodal_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> mapInPandas (Arrow) -> deterministic fake
    features; the oracle reproduces the arithmetic over octet_length."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_binary_payload(docs)).orderBy("doc_id")


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe-sampling plumbing: payload exploded into 64-byte frames,
    every 4th kept — one row per sampled frame (mapInPandas fan-out)."""
    from streaming_data_pipeline_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(with_binary_payload(docs)).orderBy("doc_id", "frame_idx")


def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning over fake-decoded dimensions
    (decode via Arrow batches, dimension plan via integer expressions)."""
    from streaming_data_pipeline_spark.operators.multimodal import resize_dims

    docs = load_table(spark, sf_dir, "documents")
    return resize_dims(extract_features(with_binary_payload(docs))).orderBy("doc_id")


QUERIES = {
    "text_stats_by_lang": text_stats_by_lang,
    "token_counts_by_source": token_counts_by_source,
    "lang_id_heuristic": lang_id_heuristic,
    "doc_fingerprints": doc_fingerprints,
    "doc_quality_by_source": doc_quality_by_source,
    "dedup_exact_text": dedup_exact_text,
    "dedup_token_set": dedup_token_set,
    "dedup_near_minhash_lsh": dedup_near_minhash_lsh,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "simhash_signatures": simhash_signatures,
    "simhash_near_dup": simhash_near_dup,
    "dedup_cluster_components": dedup_cluster_components,
    "tfidf_top_terms": tfidf_top_terms,
    "embedding_quantize_int8": embedding_quantize_int8,
    "quality_repetition_metrics": quality_repetition_metrics,
    "contamination_ngram_overlap": contamination_ngram_overlap,
    "stratified_sample_docs": stratified_sample_docs,
    "similarity_topk_bruteforce": similarity_topk_bruteforce,
    "similarity_ann_lsh": similarity_ann_lsh,
    "similarity_multiprobe_lsh": similarity_multiprobe_lsh,
    "similarity_multitable_lsh": similarity_multitable_lsh,
    "similarity_recall_at_k": similarity_recall_at_k,
    "similarity_ivf": similarity_ivf,
    "similarity_int8_rerank": similarity_int8_rerank,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "multimodal_decode_fake": multimodal_decode_fake,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_resize_plan": multimodal_resize_plan,
}


# --------------------------------------------------------------------------
# DuckDB oracle SQL (generated where the expression is dimension- or
# hash-family-parameterized, so both engines share one source of truth)
# --------------------------------------------------------------------------
# single-copy DuckDB tokenizer + banding SQL (plans/oracle_text.py)
from streaming_data_pipeline_spark.plans.oracle_text import (
    DUCK_TOKS as _TOKS,
    sql_minhash_banding_ctes,
    sql_minhash_pair_oracle,
    sql_minhash_sig as _sql_minhash_sig,
)

_DTOKS = f"list_distinct({_TOKS})"
_STOPS_IN = ", ".join(f"'{s}'" for s in STOPWORDS)
# word-3-gram shingle set (mirrors functions.text.word_shingles: 1-based
# positions 1..len-2, space-joined, distinct; <3 tokens -> empty set)
_SHINGLES = (
    f"(CASE WHEN len({_TOKS}) >= 3 THEN list_distinct(list_transform("
    f"range(1, len({_TOKS}) - 1), "
    f"i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]"
    f")) ELSE CAST([] AS VARCHAR[]) END)"
)


def _sql_ngrams(n: int, distinct: bool = True) -> str:
    """Word n-gram list (mirrors functions.text.word_shingles /
    all_word_ngrams): 1-based positions 1..len-n+1, space-joined;
    <n tokens -> empty list."""
    gram = " || ' ' || ".join(
        f"{_TOKS}[i+{j}]" if j else f"{_TOKS}[i]" for j in range(n)
    )
    lt = f"list_transform(range(1, len({_TOKS}) - {n - 2}), i -> {gram})"
    if distinct:
        lt = f"list_distinct({lt})"
    return (
        f"(CASE WHEN len({_TOKS}) >= {n} THEN {lt} "
        f"ELSE CAST([] AS VARCHAR[]) END)"
    )


def _sql_dot(a: str, b: str, dim: int = DIM) -> str:
    """Explicit left-to-right sum chain: matches the Spark fold order."""
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, dim + 1)
    )


def _sql_plane_dot(v: str, plane: list[int]) -> str:
    return " + ".join(
        f"CAST({v}[{i + 1}] AS DOUBLE) * {float(c)}" for i, c in enumerate(plane)
    )


def _sql_bucket(v: str, planes: list[list[int]]) -> str:
    bits = [
        f"(CASE WHEN ({_sql_plane_dot(v, p)}) >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    ]
    return " || ".join(bits)


def _sql_bucket_flip(v: str, planes: list[list[int]], j: int) -> str:
    """The bucket code with bit j inverted (multi-probe neighbor)."""
    bits = []
    for idx, p in enumerate(planes):
        then, els = ("'0'", "'1'") if idx == j else ("'1'", "'0'")
        bits.append(f"(CASE WHEN ({_sql_plane_dot(v, p)}) >= 0 THEN {then} ELSE {els} END)")
    return " || ".join(bits)


def _sql_probe_code_list(v: str, planes: list[list[int]]) -> str:
    codes = [_sql_bucket(v, planes)] + [
        _sql_bucket_flip(v, planes, j) for j in range(len(planes))
    ]
    return "[" + ", ".join(codes) + "]"


def _sql_table_code_list(
    v: str, n_tables: int = 16, bits: int = 6, seed: int = 42
) -> str:
    """Tagged per-table codes mirroring similarity.table_code_array
    (same seed derivation, so codes are bit-identical)."""
    codes = [
        f"'{t}|' || ({_sql_bucket(v, hyperplanes(bits, DIM, seed + 7919 * (t + 1)))})"
        for t in range(n_tables)
    ]
    return "[" + ", ".join(codes) + "]"


# _sql_minhash_sig is the shared plans/oracle_text.sql_minhash_sig
# (imported above): one copy of the signature SQL for every MinHash
# oracle in the repo.


def _sql_simhash_sig_ctes(bits: int = 64) -> str:
    """CTE chain ``tok -> th -> ssum -> h(id, simhash)`` computing the
    SimHash signature with ONE token unnest and ``bits`` vectorized
    SUM() columns over the unnested rows — the Spark aggregate's shape
    (operators/dedup.py:simhash_packed). The previous per-bit
    ``list_sum(list_transform(hs, ...))`` form re-walked every
    document's hash list once PER BIT (128 interpreted lambda passes
    per doc at the scale width — the dominant cost of the simhash128
    oracle at sf0.1). Same md5 nibble decode, same integer sums, same
    sign rule, so the signature text is bit-identical; empty/null-token
    documents come back through the LEFT JOIN with NULL sums and
    COALESCE to the all-'0' signature exactly as before. At 128 chars
    the chained ``a || b`` form exceeds DuckDB's binder recursion limit
    (left-recursive nesting, max depth 128), so the wide form joins
    through one variadic concat() call."""
    sums = ",\n       ".join(
        f"SUM((((position(substring(h, {b // 4 + 1}, 1) IN '0123456789abcdef') - 1)"
        f" >> {3 - b % 4}) & 1) * 2 - 1) AS s{b}"
        for b in range(bits)
    )
    chars = [
        f"(CASE WHEN COALESCE(s{b}, 0) > 0 THEN '1' ELSE '0' END)"
        for b in range(bits)
    ]
    sig = " || ".join(chars) if bits <= 64 else "concat(" + ", ".join(chars) + ")"
    return f"""tok AS (SELECT doc_id, unnest({_DTOKS}) AS t FROM documents),
    th AS (SELECT doc_id, md5(t) AS h FROM tok),
    ssum AS (
      SELECT doc_id,
       {sums}
      FROM th GROUP BY doc_id),
    h AS (
      SELECT d.doc_id AS id, {sig} AS simhash
      FROM documents d LEFT JOIN ssum USING (doc_id))"""


def _sql_lang_id() -> str:
    score = {
        lang: f"len(list_filter({_TOKS}, x -> x IN ({', '.join(repr(c) for c in cues)})))"
        for lang, cues in sorted(LANG_CUES.items())
    }
    langs = sorted(score)
    # same fold as functions.text.lang_id: strict > replaces, tie keeps earlier
    best_lang_expr = f"'{langs[0]}'"
    best_score_expr = f"s_{langs[0]}"
    for lang in langs[1:]:
        best_lang_expr = (
            f"(CASE WHEN s_{lang} > {best_score_expr} THEN '{lang}' ELSE {best_lang_expr} END)"
        )
        best_score_expr = (
            f"(CASE WHEN s_{lang} > {best_score_expr} THEN s_{lang} ELSE {best_score_expr} END)"
        )
    scores_sql = ", ".join(f"{expr} AS s_{lang}" for lang, expr in score.items())
    return f"""
    WITH scored AS (SELECT doc_id, lang, {scores_sql} FROM documents)
    SELECT doc_id, lang AS labeled_lang,
           {best_lang_expr} AS predicted_lang,
           (lang = {best_lang_expr}) AS agrees
    FROM scored ORDER BY doc_id
    """


ORACLE = {
    "text_stats_by_lang": f"""
    WITH per_doc AS (
      SELECT lang,
             CAST(len({_TOKS}) AS BIGINT) AS tc,
             CAST(length(text) AS BIGINT) AS nchars,
             CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS BIGINT) AS punct,
             CAST(len(list_filter({_TOKS}, x -> x IN ({_STOPS_IN}))) AS BIGINT) AS stops
      FROM documents)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS doc_count,
           CAST(SUM(tc) AS BIGINT) AS total_tokens,
           round(CAST(SUM(tc) AS DOUBLE) / COUNT(*), 4) AS avg_tokens,
           round(CAST(SUM(nchars) AS DOUBLE) / COUNT(*), 4) AS avg_chars,
           round(CAST(SUM(punct) AS DOUBLE) / SUM(nchars), 6) AS punct_char_ratio,
           round(CAST(SUM(stops) AS DOUBLE) / SUM(tc), 6) AS stopword_token_ratio
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
    "token_counts_by_source": f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS doc_count,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS total_ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT)
             AS total_regex_tokens
    FROM documents GROUP BY source ORDER BY source
    """,
    "lang_id_heuristic": _sql_lang_id(),
    "doc_fingerprints": f"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS text_fp,
           md5(COALESCE(array_to_string(list_sort({_DTOKS}), ' '), '')) AS token_fp
    FROM documents ORDER BY doc_id
    """,
    "doc_quality_by_source": f"""
    WITH per_doc AS (
      SELECT source,
             (CASE WHEN length(text) >= 20 AND length(text) <= 10000 THEN 4 ELSE 0 END
            + CASE WHEN (CASE WHEN length(text) > 0
                         THEN round(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) / length(text), 6)
                         ELSE 0.0 END) <= 0.2 THEN 3 ELSE 0 END
            + CASE WHEN len(list_filter({_TOKS}, x -> x IN ({_STOPS_IN}))) > 0 THEN 3 ELSE 0 END
             ) AS q10
      FROM documents)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS doc_count,
           round(CAST(SUM(q10) AS DOUBLE) / (COUNT(*) * 10), 4) AS avg_quality
    FROM per_doc GROUP BY source ORDER BY source
    """,
    "dedup_exact_text": """
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM documents GROUP BY 1 ORDER BY fp
    """,
    "dedup_token_set": f"""
    SELECT md5(COALESCE(array_to_string(list_sort({_DTOKS}), ' '), '')) AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM documents GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY fp
    """,
    # one parameterized banding oracle (plans/oracle_text.py) serves
    # both LSH pair queries — only the token-set expression differs
    "dedup_near_minhash_lsh": sql_minhash_pair_oracle(_DTOKS, threshold=0.8),
    "simhash_signatures": f"""
    WITH {_sql_simhash_sig_ctes()}
    SELECT id AS doc_id, simhash FROM h ORDER BY doc_id
    """,
    "dedup_ngram_jaccard": sql_minhash_pair_oracle(_SHINGLES, threshold=0.8),
    "simhash_near_dup": f"""
    WITH {_sql_simhash_sig_ctes()},
    banded AS (
      SELECT id, simhash, p, substring(simhash, p*16 + 1, 16) AS chunk
      FROM h CROSS JOIN (SELECT unnest(range(4)) AS p)
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a JOIN banded b ON a.p = b.p AND a.chunk = b.chunk AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(hamming(ha.simhash, hb.simhash) AS BIGINT) AS hamming
    FROM cand JOIN h ha ON cand.id_a = ha.id JOIN h hb ON cand.id_b = hb.id
    WHERE hamming(ha.simhash, hb.simhash) <= 3
    ORDER BY id_a, id_b
    """,
    "similarity_topk_bruteforce": f"""
    WITH probes AS MATERIALIZED (
        SELECT vec_id AS probe_id, embedding AS pv FROM embeddings
        WHERE vec_id < {N_PROBES} AND embedding IS NOT NULL),
    cand AS MATERIALIZED (
        SELECT vec_id AS cand_id, embedding AS cv FROM embeddings
        WHERE embedding IS NOT NULL),
    scored AS (
      SELECT probe_id, cand_id,
             ({_sql_dot('pv', 'cv')})
               / (sqrt({_sql_dot('pv', 'pv')}) * sqrt({_sql_dot('cv', 'cv')})) AS cos
      FROM probes, cand WHERE probe_id <> cand_id)
    SELECT probe_id, cand_id, round(cos, 6) AS cosine, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rank
          FROM scored)
    WHERE rank <= 10 ORDER BY probe_id, rank
    """,
    "similarity_ann_lsh": f"""
    WITH probes AS (SELECT vec_id AS probe_id, embedding AS pv,
                           {_sql_bucket('embedding', hyperplanes(8, DIM, 42))} AS bucket
                    FROM embeddings WHERE vec_id < {N_PROBES} AND embedding IS NOT NULL),
    cand AS (SELECT vec_id AS cand_id, embedding AS cv,
                    {_sql_bucket('embedding', hyperplanes(8, DIM, 42))} AS bucket
             FROM embeddings WHERE embedding IS NOT NULL),
    scored AS (
      SELECT probe_id, cand_id,
             ({_sql_dot('pv', 'cv')})
               / (sqrt({_sql_dot('pv', 'pv')}) * sqrt({_sql_dot('cv', 'cv')})) AS cos
      FROM probes JOIN cand USING (bucket) WHERE probe_id <> cand_id)
    SELECT probe_id, cand_id, round(cos, 6) AS cosine, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rank
          FROM scored)
    WHERE rank <= 10 ORDER BY probe_id, rank
    """,
    "similarity_ivf": f"""
    WITH cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
                   WHERE vec_id < 8 AND embedding IS NOT NULL),
    assigned AS (
      SELECT cand_id, cand_vec, cent_id FROM (
        SELECT e.vec_id AS cand_id, e.embedding AS cand_vec, c.cent_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ({_sql_dot('e.embedding', 'c.cv')})
                          / (sqrt({_sql_dot('e.embedding', 'e.embedding')})
                             * sqrt({_sql_dot('c.cv', 'c.cv')})) DESC,
                          c.cent_id
               ) AS arank
        FROM embeddings e CROSS JOIN cents c WHERE e.embedding IS NOT NULL
      ) WHERE arank = 1
    ),
    probe_lists AS (
      SELECT probe_id, probe_vec, cent_id FROM (
        SELECT p.vec_id AS probe_id, p.embedding AS probe_vec, c.cent_id,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY ({_sql_dot('p.embedding', 'c.cv')})
                          / (sqrt({_sql_dot('p.embedding', 'p.embedding')})
                             * sqrt({_sql_dot('c.cv', 'c.cv')})) DESC,
                          c.cent_id
               ) AS prank
        FROM embeddings p CROSS JOIN cents c
        WHERE p.vec_id < {N_PROBES} AND p.embedding IS NOT NULL
      ) WHERE prank <= 2
    ),
    scored AS (
      SELECT probe_id, cand_id,
             ({_sql_dot('probe_vec', 'cand_vec')})
               / (sqrt({_sql_dot('probe_vec', 'probe_vec')})
                  * sqrt({_sql_dot('cand_vec', 'cand_vec')})) AS cos
      FROM assigned JOIN probe_lists USING (cent_id)
      WHERE probe_id <> cand_id)
    SELECT probe_id, cand_id, round(cos, 6) AS cosine, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rank
          FROM scored)
    WHERE rank <= 10 ORDER BY probe_id, rank
    """,
    "embedding_near_dup_pairs": f"""
    WITH tagged AS (SELECT vec_id AS id, embedding AS v,
                           {_sql_bucket('embedding', hyperplanes(4, DIM, 7))} AS bucket
                    FROM embeddings WHERE embedding IS NOT NULL)
    SELECT a.id AS id_a, b.id AS id_b,
           round(({_sql_dot('a.v', 'b.v')})
                 / (sqrt({_sql_dot('a.v', 'a.v')}) * sqrt({_sql_dot('b.v', 'b.v')})), 6) AS cosine
    FROM tagged a JOIN tagged b ON a.bucket = b.bucket AND a.id < b.id
    WHERE ({_sql_dot('a.v', 'b.v')})
          / (sqrt({_sql_dot('a.v', 'a.v')}) * sqrt({_sql_dot('b.v', 'b.v')})) >= 0.3
    ORDER BY id_a, id_b
    """,
    # strlen, not length: the payload is the UTF-8 BYTES of the text
    # (a stand-in media blob), so every derived quantity counts bytes;
    # DuckDB length() counts characters and diverges on multibyte text
    "multimodal_decode_fake": """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(strlen(text) % 640 + 1 AS BIGINT) AS fake_width,
           CAST(strlen(text) * 7 % 480 + 1 AS BIGINT) AS fake_height
    FROM documents ORDER BY doc_id
    """,
    "multimodal_frame_sample": """
    WITH d AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n FROM documents),
    f AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS frame_idx, n
      FROM d, UNNEST(range(CAST((n + 63) // 64 AS BIGINT))) AS u(i)
      WHERE CAST(u.i AS BIGINT) % 4 = 0
    )
    SELECT doc_id, frame_idx,
           CAST(least(64, n - frame_idx * 64) AS BIGINT) AS frame_len
    FROM f ORDER BY doc_id, frame_idx
    """,
    "multimodal_resize_plan": """
    WITH dims AS (
      SELECT doc_id,
             CAST(strlen(text) % 640 + 1 AS BIGINT) AS fake_width,
             CAST(strlen(text) * 7 % 480 + 1 AS BIGINT) AS fake_height
      FROM documents
    )
    SELECT doc_id, fake_width, fake_height,
           CAST(224 AS BIGINT) AS new_width,
           greatest(CAST(1 AS BIGINT), (fake_height * 224) // fake_width)
             AS new_height
    FROM dims ORDER BY doc_id
    """,
    "similarity_multiprobe_lsh": f"""
    WITH cand AS MATERIALIZED (
        SELECT vec_id AS cand_id, embedding AS cv,
               {_sql_bucket('embedding', hyperplanes(8, DIM, 42))} AS bucket
        FROM embeddings WHERE embedding IS NOT NULL),
    probes AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings
               WHERE vec_id < {N_PROBES} AND embedding IS NOT NULL),
    pcodes AS (SELECT probe_id, unnest({_sql_probe_code_list('pv', hyperplanes(8, DIM, 42))}) AS bucket
               FROM probes),
    pairs AS (
      SELECT DISTINCT probe_id, cand_id
      FROM pcodes JOIN cand USING (bucket)
      WHERE probe_id <> cand_id
    ),
    scored AS (
      SELECT pr.probe_id, c.cand_id,
             ({_sql_dot('pr.pv', 'c.cv')})
               / (sqrt({_sql_dot('pr.pv', 'pr.pv')}) * sqrt({_sql_dot('c.cv', 'c.cv')})) AS cos
      FROM pairs JOIN probes pr USING (probe_id) JOIN cand c USING (cand_id))
    SELECT probe_id, cand_id, round(cos, 6) AS cosine, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rank
          FROM scored)
    WHERE rank <= 10 ORDER BY probe_id, rank
    """,
    "similarity_multitable_lsh": f"""
    WITH cand AS MATERIALIZED (
        SELECT vec_id AS cand_id, embedding AS cv FROM embeddings
        WHERE embedding IS NOT NULL),
    ccodes AS (SELECT cand_id, unnest({_sql_table_code_list('cv')}) AS bucket FROM cand),
    probes AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings
               WHERE vec_id < {N_PROBES} AND embedding IS NOT NULL),
    pcodes AS (SELECT probe_id, unnest({_sql_table_code_list('pv')}) AS bucket
               FROM probes),
    pairs AS (
      SELECT DISTINCT probe_id, cand_id
      FROM pcodes JOIN ccodes USING (bucket)
      WHERE probe_id <> cand_id
    ),
    scored AS (
      SELECT pr.probe_id, c.cand_id,
             ({_sql_dot('pr.pv', 'c.cv')})
               / (sqrt({_sql_dot('pr.pv', 'pr.pv')}) * sqrt({_sql_dot('c.cv', 'c.cv')})) AS cos
      FROM pairs JOIN probes pr USING (probe_id) JOIN cand c USING (cand_id))
    SELECT probe_id, cand_id, round(cos, 6) AS cosine, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rank
          FROM scored)
    WHERE rank <= 10 ORDER BY probe_id, rank
    """,
}


def _sql_recall_oracle() -> str:
    """Recall@10 oracle: brute-force / LSH / multiprobe / IVF top-10
    recomputed in DuckDB from the same hyperplanes and centroid seeding,
    then per-probe hit fractions against the brute-force truth."""
    p8 = hyperplanes(8, DIM, 42)
    topk = (
        "SELECT probe_id, cand_id FROM ("
        "SELECT probe_id, cand_id, row_number() OVER "
        "(PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rank FROM ({scored})"
        ") WHERE rank <= 10"
    )
    cos = (
        f"({_sql_dot('pv', 'cv')}) / "
        f"(sqrt({_sql_dot('pv', 'pv')}) * sqrt({_sql_dot('cv', 'cv')}))"
    )
    bf_scored = (
        "SELECT probe_id, cand_id, " + cos + " AS cos "
        "FROM probes, cand WHERE probe_id <> cand_id"
    )
    lsh_scored = (
        "SELECT probe_id, cand_id, " + cos + " AS cos "
        "FROM lshp JOIN lshc USING (bucket) WHERE probe_id <> cand_id"
    )
    mp_scored = (
        "SELECT pr.probe_id, c.cand_id, "
        f"({_sql_dot('pr.pv', 'c.cv')}) / "
        f"(sqrt({_sql_dot('pr.pv', 'pr.pv')}) * sqrt({_sql_dot('c.cv', 'c.cv')})) AS cos "
        "FROM mpairs JOIN probes pr USING (probe_id) JOIN cand c USING (cand_id)"
    )
    mt_scored = (
        "SELECT pr.probe_id, c.cand_id, "
        f"({_sql_dot('pr.pv', 'c.cv')}) / "
        f"(sqrt({_sql_dot('pr.pv', 'pr.pv')}) * sqrt({_sql_dot('c.cv', 'c.cv')})) AS cos "
        "FROM mtpairs JOIN probes pr USING (probe_id) JOIN cand c USING (cand_id)"
    )
    ivf_scored = (
        "SELECT probe_id, cand_id, "
        f"({_sql_dot('probe_vec', 'cand_vec')}) / "
        f"(sqrt({_sql_dot('probe_vec', 'probe_vec')}) * sqrt({_sql_dot('cand_vec', 'cand_vec')})) AS cos "
        "FROM assigned JOIN probe_lists USING (cent_id) WHERE probe_id <> cand_id"
    )
    return f"""
    WITH probes AS MATERIALIZED (
        SELECT vec_id AS probe_id, embedding AS pv FROM embeddings
        WHERE vec_id < {N_PROBES} AND embedding IS NOT NULL),
    cand AS MATERIALIZED (
        SELECT vec_id AS cand_id, embedding AS cv FROM embeddings
        WHERE embedding IS NOT NULL),
    bf AS ({topk.format(scored=bf_scored)}),
    lshp AS (SELECT probe_id, pv, {_sql_bucket('pv', p8)} AS bucket FROM probes),
    lshc AS (SELECT cand_id, cv, {_sql_bucket('cv', p8)} AS bucket FROM cand),
    lsh AS ({topk.format(scored=lsh_scored)}),
    pcodes AS (SELECT probe_id, unnest({_sql_probe_code_list('pv', p8)}) AS bucket
               FROM probes),
    mpairs AS (
      SELECT DISTINCT probe_id, cand_id
      FROM pcodes JOIN lshc USING (bucket) WHERE probe_id <> cand_id
    ),
    mp AS ({topk.format(scored=mp_scored)}),
    mtc AS (SELECT cand_id, unnest({_sql_table_code_list('cv')}) AS bucket FROM cand),
    mtp AS (SELECT probe_id, unnest({_sql_table_code_list('pv')}) AS bucket FROM probes),
    mtpairs AS (
      SELECT DISTINCT probe_id, cand_id
      FROM mtp JOIN mtc USING (bucket) WHERE probe_id <> cand_id
    ),
    mt AS ({topk.format(scored=mt_scored)}),
    cents AS (SELECT vec_id AS cent_id, embedding AS ctv FROM embeddings
              WHERE vec_id < 8 AND embedding IS NOT NULL),
    assigned AS (
      SELECT cand_id, cand_vec, cent_id FROM (
        SELECT e.vec_id AS cand_id, e.embedding AS cand_vec, c.cent_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ({_sql_dot('e.embedding', 'c.ctv')})
                          / (sqrt({_sql_dot('e.embedding', 'e.embedding')})
                             * sqrt({_sql_dot('c.ctv', 'c.ctv')})) DESC,
                          c.cent_id
               ) AS arank
        FROM embeddings e CROSS JOIN cents c WHERE e.embedding IS NOT NULL
      ) WHERE arank = 1
    ),
    probe_lists AS (
      SELECT probe_id, probe_vec, cent_id FROM (
        SELECT p.vec_id AS probe_id, p.embedding AS probe_vec, c.cent_id,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY ({_sql_dot('p.embedding', 'c.ctv')})
                          / (sqrt({_sql_dot('p.embedding', 'p.embedding')})
                             * sqrt({_sql_dot('c.ctv', 'c.ctv')})) DESC,
                          c.cent_id
               ) AS prank
        FROM embeddings p CROSS JOIN cents c
        WHERE p.vec_id < {N_PROBES} AND p.embedding IS NOT NULL
      ) WHERE prank <= 2
    ),
    ivf AS ({topk.format(scored=ivf_scored)}),
    {_sql_int8_ctes()},
    i8 AS ({topk.format(scored=_SQL_INT8_SCORED)}),
    {_sql_pq_ctes()},
    pq AS ({topk.format(scored=_SQL_PQ_SCORED)})
    SELECT b.probe_id,
           round(CAST(COUNT(l.cand_id) AS DOUBLE) / COUNT(*), 4) AS lsh_recall,
           round(CAST(COUNT(m.cand_id) AS DOUBLE) / COUNT(*), 4) AS multiprobe_recall,
           round(CAST(COUNT(t.cand_id) AS DOUBLE) / COUNT(*), 4) AS multitable_recall,
           round(CAST(COUNT(i.cand_id) AS DOUBLE) / COUNT(*), 4) AS ivf_recall,
           round(CAST(COUNT(q.cand_id) AS DOUBLE) / COUNT(*), 4) AS int8_rerank_recall,
           round(CAST(COUNT(pa.cand_id) AS DOUBLE) / COUNT(*), 4) AS pq_adc_recall
    FROM bf b
    LEFT JOIN lsh l ON b.probe_id = l.probe_id AND b.cand_id = l.cand_id
    LEFT JOIN mp  m ON b.probe_id = m.probe_id AND b.cand_id = m.cand_id
    LEFT JOIN mt  t ON b.probe_id = t.probe_id AND b.cand_id = t.cand_id
    LEFT JOIN ivf i ON b.probe_id = i.probe_id AND b.cand_id = i.cand_id
    LEFT JOIN i8  q ON b.probe_id = q.probe_id AND b.cand_id = q.cand_id
    LEFT JOIN pq pa ON b.probe_id = pa.probe_id AND b.cand_id = pa.cand_id
    GROUP BY b.probe_id ORDER BY b.probe_id
    """


def _sql_int8_ctes(n_probes: int = N_PROBES, shortlist: int = 50) -> str:
    """CTE chain for the quantized two-stage ANN: int8 codes (same
    floor-based quantizer as embedding_quantize_int8), asymmetric
    approximate scoring (cosine is scale-invariant, so raw codes score
    directly), shortlist, exact f64 rerank source. Yields CTEs
    ``i8cand``/``i8qc``/``i8probes``/``i8approx``/``i8short`` and the
    final scored SELECT is left to the caller."""
    return f"""
    i8cand AS MATERIALIZED (
        SELECT vec_id AS cand_id, embedding AS cv FROM embeddings
        WHERE embedding IS NOT NULL),
    i8qc AS (
      SELECT cand_id, cv,
             list_transform(cv, x -> floor(CAST(x AS DOUBLE)
               * (CASE WHEN amax > 0 THEN 127.0 / amax ELSE 1.0 END) + 0.5)) AS q
      FROM (SELECT cand_id, cv,
                   list_max(list_transform(cv, y -> abs(CAST(y AS DOUBLE)))) AS amax
            FROM i8cand)),
    i8probes AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings
                 WHERE vec_id < {n_probes} AND embedding IS NOT NULL),
    i8approx AS (
      SELECT probe_id, cand_id, cv, pv,
             ({_sql_dot('pv', 'q')})
               / (sqrt({_sql_dot('pv', 'pv')}) * sqrt({_sql_dot('q', 'q')})) AS acos
      FROM i8qc, i8probes WHERE probe_id <> cand_id),
    i8short AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY acos DESC, cand_id) AS arank
        FROM i8approx)
      WHERE arank <= {shortlist})"""


_SQL_INT8_SCORED = (
    "SELECT probe_id, cand_id, "
    f"({_sql_dot('pv', 'cv')}) / "
    f"(sqrt({_sql_dot('pv', 'pv')}) * sqrt({_sql_dot('cv', 'cv')})) AS cos "
    "FROM i8short"
)


ORACLE["similarity_int8_rerank"] = f"""
WITH {_sql_int8_ctes()}
SELECT probe_id, cand_id, round(cos, 6) AS cosine, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos DESC, cand_id) AS rank
      FROM ({_SQL_INT8_SCORED}))
WHERE rank <= 10 ORDER BY probe_id, rank
"""


# (similarity_recall_at_k oracle assigned at end of module —
# it now depends on _sql_pq_ctes, defined below)


# Connected components WITHOUT a transitive-closure CTE: the naive
# RECURSIVE `reach` accumulates one row per (node, reachable-label) —
# O(sum of cluster^2) with combinatorial re-derivation, which is why
# the sf0.1 sweep used to skip this pair. Instead: unrolled min-label
# propagation with POINTER DOUBLING, every round MATERIALIZED (DuckDB
# inlines plain CTEs and would re-evaluate the chain exponentially).
# Round k folds three candidate label sources per node — keep, best
# neighbor label, label-of-label (following the current parent
# compresses 2^k hops after k rounds) — so convergence needs only
# ~log2(diameter) rounds and every round is O(V + E) rows. A fixpoint
# CERTIFICATE runs one extra round and injects a loud sentinel row
# (doc_id = -1) if anything still moved, so an unconverged run can
# never silently pass the compare.
#
# Depth matters more than per-round cost here: DuckDB 1.0 re-evaluates
# chained CTEs despite AS MATERIALIZED when each round references its
# predecessor 3x (keep + neighbor + label-of-label) — measured ~3^depth
# blowup (12 rounds: 85 s; the same 6 rounds as temp tables: 0.07 s at
# sf0.1's 1.19M group edges). 6 doubling rounds cover diameter 32 —
# reach doubles per round starting at 1 (1,2,4,...,2^(rounds-1)),
# measured on a path graph in tests/test_round10_hardening.py —
# far past the fixture's near-clique dup components (converges at round
# 5 with zero moves at every sf) — and the certificate round turns any
# insufficiency into a loud sentinel, never a silent pass.
_CC_ROUNDS = 6  # covers component diameter up to 2^(6-1) = 32


def _cc_propagation_sql(l0_body: str, rounds: int = _CC_ROUNDS) -> str:
    """Unrolled pointer-doubling rounds over an ``l0(node, lbl,
    touched)`` CTE the caller supplies (r9: nodes are GROUP
    representatives, not docs — the doc-level node set re-derived every
    group's label once per member for nothing). Each round also folds a
    ``touched`` flag (MAX): the neighbor branch stamps 1 on any node
    with at least one edge, so the final round knows edge-connectivity
    without a separate ``edges`` consumer — DuckDB 1.0 re-evaluates the
    whole upstream chain once per TOP-LEVEL consumer of a CTE, hints
    notwithstanding (measured ~10 s per extra consumer at sf0.1), so
    the oracle keeps exactly one.

    ``rounds`` doubling rounds certify component diameter up to
    2**(rounds - 1): the per-round reach doubles starting at 1
    (measured on a path graph in tests/test_round10_hardening.py —
    round 1 only reaches direct neighbors because label-of-label is
    still the identity). The default covers the fixtures (converge at
    5, diameter << 32). A deeper-diameter
    corpus trips the loud (-1,-1) certificate sentinel
    rather than passing silently — rerun the oracle with a larger
    ``rounds`` (the caller must reference the matching ``l{rounds+1}``
    / ``l{rounds}`` CTE names) until the sentinel clears (ADVICE r9)."""
    parts = []
    prev = "l0"
    parts.append(f"l0 AS MATERIALIZED ({l0_body})")
    for k in range(1, rounds + 2):  # +1 extra round = the certificate
        cur = f"l{k}"
        parts.append(
            f"""{cur} AS MATERIALIZED (
  SELECT node, MIN(lbl) AS lbl, MAX(touched) AS touched FROM (
    SELECT node, lbl, touched FROM {prev}
    UNION ALL
    SELECT e.src AS node, p.lbl, 1 AS touched
    FROM edges e JOIN {prev} p ON e.dst = p.node
    UNION ALL
    SELECT a.node, b.lbl, a.touched FROM {prev} a JOIN {prev} b ON a.lbl = b.node
  ) GROUP BY node)"""
        )
        prev = cur
    return ",\n".join(parts)


# Group-graph CC (r8 verdict task 6): the old form expanded the 2.58M
# doc pairs (165 s of a 206 s oracle at sf0.1) just to rediscover that
# same-group docs are connected. Nodes here are GROUP representatives
# (min member doc_id — distinct across groups since groups partition
# docs), edges are the verified GROUP pairs from the shared group-level
# banding chain; a group's propagated min-label IS the component's min
# doc_id (every member id >= its group's representative). Members of an
# internally-connected group (cnt>1, non-empty token set => every pair
# has self-Jaccard 1.0) or of any group touching an edge take the
# group's component label; all other docs are singletons — exactly
# operators/dedup.minhash_cluster_labels' semantics.
_JAC_G = (
    "round(CAST(len(list_intersect(ta.ts, tb.ts)) AS DOUBLE)"
    " / len(list_distinct(list_concat(ta.ts, tb.ts))), 6)"
)

ORACLE["dedup_cluster_components"] = f"""
WITH dtoks AS (SELECT doc_id AS id, list_sort({_DTOKS}) AS ts FROM documents),
grp AS MATERIALIZED (
  SELECT ts, list_sort(list(id)) AS ids, COUNT(*) AS cnt
  FROM dtoks GROUP BY ts),
toks AS (SELECT ids[1] AS id, ts FROM grp),
{sql_minhash_banding_ctes(32, 8)},
gver AS MATERIALIZED (
  SELECT cand.id_a AS src, cand.id_b AS dst
  FROM cand JOIN toks ta ON cand.id_a = ta.id JOIN toks tb ON cand.id_b = tb.id
  WHERE {_JAC_G} >= 0.8),
edges AS MATERIALIZED (
  SELECT src, dst FROM gver UNION SELECT dst AS src, src AS dst FROM gver),
{_cc_propagation_sql("SELECT ids[1] AS node, ids[1] AS lbl, 0 AS touched FROM grp")},
lfin AS MATERIALIZED (
  SELECT nx.node, nx.lbl, nx.touched,
         CASE WHEN f.lbl <> nx.lbl THEN 1 ELSE 0 END AS moved
  FROM l{_CC_ROUNDS + 1} nx JOIN l{_CC_ROUNDS} f USING (node)),
g AS (SELECT ids[1] AS gid, ids, cnt, len(ts) AS n_ts FROM grp),
members AS (
  SELECT unnest(g.ids) AS doc_id,
         CASE WHEN (g.cnt > 1 AND g.n_ts > 0) OR gl.touched = 1
              THEN gl.lbl END AS glbl
  FROM g
  JOIN (SELECT node AS gid, lbl, touched FROM lfin) gl USING (gid)
  UNION ALL
  -- fixpoint certificate: one loud (-1, -1) row if any node still
  -- moved in the extra round (cluster_size 1 via the window below) —
  -- emitted INSIDE members so lfin keeps a single top-level consumer
  SELECT CAST(-1 AS BIGINT) AS doc_id, CAST(-1 AS BIGINT) AS glbl
  FROM (SELECT SUM(moved) AS n FROM lfin) WHERE n > 0),
labels AS (SELECT doc_id, COALESCE(glbl, doc_id) AS cluster_id FROM members)
SELECT doc_id,
       CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM labels
ORDER BY doc_id
"""

ORACLE["tfidf_top_terms"] = f"""
WITH n AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
tok AS (SELECT lang, doc_id, unnest({_TOKS}) AS term FROM documents),
stats AS (
  SELECT lang, term,
         CAST(COUNT(*) AS BIGINT) AS tf_sum,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df_docs
  FROM tok GROUP BY lang, term),
scored AS (
  SELECT s.lang, term, tf_sum, df_docs,
         round(CAST(tf_sum * n_docs AS DOUBLE) / df_docs, 4) AS score
  FROM stats s JOIN n USING (lang))
SELECT lang, term, tf_sum, df_docs, score, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rank
      FROM scored)
WHERE rank <= 5 ORDER BY lang, rank
"""

ORACLE["quality_repetition_metrics"] = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         {_sql_ngrams(3, distinct=False)} AS tri,
         {_sql_ngrams(2, distinct=False)} AS bi
  FROM documents),
top_bi AS (
  SELECT doc_id, MAX(c) AS top_bi_count FROM (
    SELECT doc_id, bg, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(bi) AS bg FROM base)
    GROUP BY doc_id, bg)
  GROUP BY doc_id),
fracs AS (
  SELECT b.doc_id, b.n_tokens,
         CASE WHEN len(tri) > 0
              THEN round(CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE)
                         / len(tri), 4)
              ELSE 0.0 END AS dup_trigram_frac,
         CASE WHEN len(bi) > 0
              THEN round(CAST(COALESCE(top_bi_count, 0) AS DOUBLE)
                         / len(bi), 4)
              ELSE 0.0 END AS top_bigram_frac
  FROM base b LEFT JOIN top_bi USING (doc_id))
SELECT doc_id, n_tokens, dup_trigram_frac, top_bigram_frac,
       (dup_trigram_frac > 0.2 OR top_bigram_frac > 0.18) AS repetitive
FROM fracs ORDER BY doc_id
"""

ORACLE["contamination_ngram_overlap"] = f"""
WITH bench AS (
  SELECT DISTINCT unnest({_sql_ngrams(5)}) AS gram
  FROM documents WHERE doc_id % {_BENCH_MOD} = 0),
corpus AS (
  SELECT doc_id, {_sql_ngrams(5)} AS grams
  FROM documents WHERE doc_id % {_BENCH_MOD} <> 0),
hits AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS overlap_ngrams
  FROM (SELECT doc_id, unnest(grams) AS gram FROM corpus) c
  JOIN bench USING (gram)
  GROUP BY doc_id)
SELECT c.doc_id,
       CAST(len(grams) AS BIGINT) AS total_ngrams,
       CAST(COALESCE(overlap_ngrams, 0) AS BIGINT) AS overlap_ngrams,
       CASE WHEN len(grams) > 0
            THEN round(CAST(COALESCE(overlap_ngrams, 0) AS DOUBLE)
                       / len(grams), 4)
            ELSE 0.0 END AS contamination_frac,
       COALESCE(overlap_ngrams, 0) > 0 AS contaminated
FROM corpus c LEFT JOIN hits USING (doc_id)
ORDER BY c.doc_id
"""

_THR_VALUES = ", ".join(f"('{k}', '{v}')" for k, v in sorted(_SAMPLE_THRESH.items()))

ORACLE["stratified_sample_docs"] = f"""
WITH thr(lang, thr) AS (VALUES {_THR_VALUES})
SELECT doc_id, d.lang,
       substring(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 2) AS h2
FROM documents d JOIN thr ON d.lang = thr.lang
WHERE substring(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 2) < thr.thr
ORDER BY doc_id
"""

ORACLE["embedding_quantize_int8"] = """
WITH s AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS arr
  FROM embeddings WHERE embedding IS NOT NULL),
t AS (
  SELECT vec_id, arr, list_max(list_transform(arr, x -> abs(x))) AS amax
  FROM s),
u AS (
  SELECT vec_id, arr,
         CASE WHEN amax > 0 THEN 127.0 / amax ELSE 1.0 END AS scale
  FROM t),
v AS (
  SELECT vec_id, arr, scale,
         list_transform(arr, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS q
  FROM u),
err AS (
  SELECT vec_id,
         MAX(abs(arr[CAST(u.i AS INT) + 1]
                 - CAST(q[CAST(u.i AS INT) + 1] AS DOUBLE) / scale)) AS max_err
  FROM v, UNNEST(range(len(arr))) AS u(i)
  GROUP BY vec_id)
SELECT v.vec_id,
       round(scale, 6) AS scale_r,
       CAST(list_sum(q) AS BIGINT) AS q_sum,
       round(err.max_err, 8) AS max_abs_err
FROM v JOIN err USING (vec_id)
ORDER BY v.vec_id
"""


def tokenizer_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, pass 1: adjacent character-pair counts —
    the statistic whose argmax becomes the first merge rule. Uses the
    classic scale trick: count over the WEIGHTED DISTINCT VOCABULARY
    (word -> corpus frequency), not the raw token stream, so the
    per-character explode runs on |vocab| rows while corpus volume only
    feeds the cheap word-count hash-agg (map-side combined). At 100 TB
    the vocab table is the thing that fits in memory; every subsequent
    merge iteration would rescan only it. Top-20 by count with a
    lexicographic tiebreak for a deterministic boundary.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    pairs = (
        words.filter(F.length("word") >= 2)
        .select(
            F.expr("explode(sequence(1, length(word) - 1))").alias("i"),
            "word",
            "freq",
        )
        .select(F.expr("substr(word, i, 2)").alias("pair"), "freq")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(20)
    )


QUERIES["tokenizer_bpe_pair_counts"] = tokenizer_bpe_pair_counts
ORACLE["tokenizer_bpe_pair_counts"] = f"""
WITH w AS (
  SELECT t.tok AS word, COUNT(*) AS freq
  FROM documents d, UNNEST({_TOKS.replace("text", "d.text")}) AS t(tok)
  GROUP BY 1),
p AS (
  SELECT substr(word, CAST(u.i AS INTEGER), 2) AS pair, SUM(freq) AS cnt
  FROM w, UNNEST(range(1, CAST(length(word) AS BIGINT))) AS u(i)
  WHERE length(word) >= 2
  GROUP BY 1)
SELECT pair, CAST(cnt AS BIGINT) AS pair_count
FROM p ORDER BY pair_count DESC, pair LIMIT 20
"""


def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode end-to-end (operators/multimodal.py): each doc
    gets an actual WAV (RIFF) payload synthesized around deterministic
    int16 PCM, and a second Arrow stage genuinely parses the container
    (stdlib wave: RIFF/fmt/data chunk walk) and reduces the PCM to
    exact integer features. The oracle regenerates the PCM formula in
    SQL — so a header-parsing or byte-order bug anywhere in the decode
    path flips the row red. Upgrades the round-2 'decode is a stub'
    weakness: the codec here is real; only formats with no
    pure-Python-feasible codec (H.264/AV1) remain documented stubs.
    """
    from streaming_data_pipeline_spark.operators.multimodal import (
        synth_decode_wav_features,
    )

    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    # Fused synth+decode stage (guide §4.1): same wave write/read code
    # paths as decode_wav_features(synth_wav_payloads(..)), but the RIFF
    # bytes never cross the JVM<->Python boundary between stages.
    # No total sort (r11) — see multimodal_jpeg_decode.
    return synth_decode_wav_features(docs)


QUERIES["multimodal_wav_decode"] = multimodal_wav_decode
ORACLE["multimodal_wav_decode"] = """
WITH pcm AS (
  SELECT d.doc_id,
         ((d.doc_id * 7919 + u.i * 104729) % 65536) - 32768 AS s
  FROM documents d,
       UNNEST(range(CAST(200 + d.doc_id % 100 AS BIGINT))) AS u(i))
SELECT doc_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(s * s) AS BIGINT) AS sum_sq,
       CAST(MAX(ABS(s)) AS BIGINT) AS peak
FROM pcm GROUP BY doc_id ORDER BY doc_id
"""


def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: spec-valid grayscale PNGs (full
    filter set incl. Paeth, correct CRCs) synthesized per doc, then a
    second Arrow stage walks the chunk stream, inflates IDAT, and
    unfilters every scanline back to pixels. The oracle regenerates the
    pixel formula in SQL, so any predictor/CRC/header bug in the codec
    flips rows red. With `multimodal_wav_decode` this makes BOTH image
    and audio decode real, stdlib-only."""
    from streaming_data_pipeline_spark.operators.multimodal import (
        synth_decode_png_features,
    )

    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    # Fused synth->decode stage: same codec code paths, one Python
    # crossing instead of two (guide §4; see synth_dhash_png).
    # No total sort (r11) — see multimodal_jpeg_decode.
    return synth_decode_png_features(docs)


QUERIES["multimodal_png_decode"] = multimodal_png_decode
ORACLE["multimodal_png_decode"] = """
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h FROM documents),
px AS (
  SELECT d.doc_id, d.w, d.h, r.i AS r, c.i AS c,
         (d.doc_id * 31 + r.i * 17 + c.i * 7) % 256 AS p
  FROM dims d,
       UNNEST(range(CAST(d.h AS BIGINT))) AS r(i),
       UNNEST(range(CAST(d.w AS BIGINT))) AS c(i))
SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(SUM(p) AS BIGINT) AS pixel_sum,
       CAST(MAX(CASE WHEN r = h - 1 AND c = w - 1 THEN p END) AS BIGINT)
         AS corner
FROM px GROUP BY doc_id, w, h ORDER BY doc_id
"""


def multimodal_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> transform, fully real: nearest-neighbor resample of the
    decoded PNG pixels to 8x8 (integer index arithmetic), checksummed.
    The oracle regenerates the resized image straight from the pixel
    formula — decode, unfiltering, AND the resample must all be exact
    for the row to stay green."""
    from streaming_data_pipeline_spark.operators.multimodal import (
        synth_resize_png_pixels,
    )

    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    # Fused synth->decode->resample stage (guide §4; one crossing).
    # No total sort (r11) — see multimodal_jpeg_decode.
    return synth_resize_png_pixels(docs)


QUERIES["multimodal_png_resize"] = multimodal_png_resize
ORACLE["multimodal_png_resize"] = """
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h FROM documents),
rz AS (
  SELECT d.doc_id, d.w, d.h, r.i AS r, c.i AS c,
         (d.doc_id * 31 + ((r.i * d.h) // 8) * 17 + ((c.i * d.w) // 8) * 7)
           % 256 AS p
  FROM dims d,
       UNNEST(range(CAST(8 AS BIGINT))) AS r(i),
       UNNEST(range(CAST(8 AS BIGINT))) AS c(i))
SELECT doc_id, CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
       CAST(SUM(p) AS BIGINT) AS resized_sum,
       CAST(MAX(CASE WHEN r = 7 AND c = 7 THEN p END) AS BIGINT)
         AS resized_corner
FROM rz GROUP BY doc_id ORDER BY doc_id
"""


def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode end-to-end — the last codec stub made
    real (operators/multimodal.py): spec-valid JFIF files (SOI/APP0/
    DQT/SOF0/DHT/SOS/EOI, canonical Huffman entropy coding with byte
    stuffing) are synthesized per doc from deterministic quantized
    coefficients, then a second Arrow stage re-parses the container,
    canonical-decodes the entropy stream (DC prediction + EXTEND, AC
    run/size with EOB and ZRL — the fixture's 19-zero gaps force real
    ZRL codes), dezigzags, dequantizes, and runs a fixed-point integer
    IDCT with level shift and clamp. The oracle regenerates the
    coefficient formulas in SQL, and for the DC-only blocks evaluates
    the integer IDCT's exact closed form — so a Huffman, zigzag, DQT,
    predictor, IDCT, crop, or clamp bug flips rows red. Partial edge
    blocks (image dims below the block grid) are on the checked path.
    With `multimodal_wav_decode` and `multimodal_png_decode` all three
    dominant training-data modalities decode for real, stdlib-only."""
    from streaming_data_pipeline_spark.operators.multimodal import (
        synth_decode_jpeg_features,
    )

    # The documents scan is one split at small SF; redistribute BEFORE
    # the per-row Python encode/decode stage so the Arrow batches run
    # on every core (same rule as the repartition-before-explode plans).
    # Fused synth+decode (guide §4.1): same _jpeg_encode/_decode_jpeg
    # code paths, one MapInPandas node instead of two — the JFIF bytes
    # never cross the JVM<->Python boundary between stages.
    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    # No total sort (r11): the range sampler re-ran the whole Python
    # decode stage once more just to pick bounds; compare is order-
    # insensitive.
    return synth_decode_jpeg_features(docs)


QUERIES["multimodal_jpeg_decode"] = multimodal_jpeg_decode
# q table: q[0]=6, q[nat]=1+((nat*5)%16); zigzag 1/20/40 -> natural
# 1/40/29 -> q 6/9/2. Flat-block pixel = clamp(128 + (724^2*dc_dq +
# 2^21) >> 22); the >> is floor, expressed with a +2^32 offset so the
# numerator stays positive (// truncation == floor there).
ORACLE["multimodal_jpeg_decode"] = """
WITH geo AS (
  SELECT doc_id,
         2 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb,
         8 * (2 + doc_id % 3) - doc_id % 4 AS w,
         8 * (1 + doc_id % 2) - doc_id % 3 AS h
  FROM documents),
blk AS (
  SELECT g.doc_id, g.wb, g.hb, g.w, g.h, CAST(u.b AS BIGINT) AS b,
         (((g.doc_id * 7 + u.b * 13) % 401) - 200) * 6 AS dc_dq
  FROM geo g, UNNEST(range(CAST(g.wb * g.hb AS BIGINT))) AS u(b)),
feat AS (
  SELECT doc_id, w, h, wb, hb, dc_dq,
         CASE WHEN b % 2 = 1 THEN
             (((doc_id + b * 3) % 21) - 10) * 6
           + (((doc_id * 5 + b) % 11) - 5) * 9
           + (((doc_id * 11 + b * 7) % 7) - 3) * 2
         ELSE 0 END AS ac_dq,
         CASE WHEN b % 2 = 0 THEN
           LEAST(8, w - 8 * (b % wb)) * LEAST(8, h - 8 * (b // wb))
           * LEAST(255, GREATEST(0,
               128 + ((524176 * dc_dq + 2097152 + 4294967296) // 4194304)
               - 1024))
         ELSE 0 END AS flat_px
  FROM blk)
SELECT doc_id,
       CAST(MAX(w) AS BIGINT) AS width,
       CAST(MAX(h) AS BIGINT) AS height,
       CAST(MAX(wb) * MAX(hb) AS BIGINT) AS n_blocks,
       CAST(SUM(dc_dq) AS BIGINT) AS dc_dequant_sum,
       CAST(SUM(ac_dq) AS BIGINT) AS ac_dequant_sum,
       CAST(SUM(flat_px) AS BIGINT) AS flat_pixel_sum
FROM feat GROUP BY doc_id ORDER BY doc_id
"""


def image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection over DECODED pixels — the fusion
    of the multimodal and dedup stacks: spec-valid PNGs are decoded and
    unfiltered (operators/multimodal.py:_decode_png), dHashed on a 9x8
    nearest-neighbor grid (64 gradient-sign bits packed into two
    sign-safe longs), and paired via the Hamming-pigeonhole band join
    (operators/dedup.py:phash_near_dup_pairs — distinct-hash collapse,
    4x16-bit chunk candidates, exact bit_count(xor) verify, never
    all-pairs). dHash is brightness-shift invariant, so images of the
    same scene at different exposure land within a few bits. The oracle
    regenerates grid, bits, packed hashes, and pairs entirely in SQL
    from the pixel formula — decode, resample, hashing, and pairing all
    have to be exact for the row to stay green."""
    from streaming_data_pipeline_spark.operators.dedup import phash_near_dup_pairs
    from streaming_data_pipeline_spark.operators.multimodal import (
        synth_dhash_png,
    )

    # Redistribute before the per-row Python encode/decode stages: the
    # documents scan is one split at small SF, and the whole PNG synth +
    # unfilter + dHash pipeline would otherwise run in a single task.
    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    # Fused synth->decode->dHash stage (guide §4; one crossing).
    sig = synth_dhash_png(docs)
    # No total sort (r11): the driver compare is order-insensitive and the
    # range sampler re-executed the synth->decode->band->verify tail once
    # more just to pick partition bounds (same contract as the minhash pair
    # queries).
    return phash_near_dup_pairs(sig, max_hamming=3)


QUERIES["image_phash_near_dup"] = image_phash_near_dup
ORACLE["image_phash_near_dup"] = """
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h FROM documents),
g AS (
  SELECT d.doc_id, r.i AS r, c.i AS c,
         (d.doc_id * 31 + ((r.i * d.h) // 8) * 17 + ((c.i * d.w) // 9) * 7)
           % 256 AS p
  FROM dims d,
       UNNEST(range(CAST(8 AS BIGINT))) AS r(i),
       UNNEST(range(CAST(9 AS BIGINT))) AS c(i)),
bits AS (
  SELECT a.doc_id, a.r * 8 + a.c AS k,
         CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS bit
  FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 8),
h AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN k < 32
                       THEN bit * (CAST(1 AS BIGINT) << k) ELSE 0 END)
              AS BIGINT) AS h_lo,
         CAST(SUM(CASE WHEN k >= 32
                       THEN bit * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END)
              AS BIGINT) AS h_hi
  FROM bits GROUP BY doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.h_lo, b.h_lo)) + bit_count(xor(a.h_hi, b.h_hi))
            AS BIGINT) AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h_lo, b.h_lo)) + bit_count(xor(a.h_hi, b.h_hi)) <= 3
ORDER BY id_a, id_b
"""


def image_phash_star_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `emit='star'` output topology of the phash near-dup operator
    (operators/dedup.py:phash_near_dup_pairs) — the 100 TB shape the
    round-6 scale audit mandated: within each identical-hash group the
    min-id member is canonical and every other member gets ONE edge to
    it (hamming 0), and each verified distinct-hash group pair is
    emitted once between the two canonicals. Output is
    O(members + distinct-hash pairs) instead of the pairs listing's
    C(n,2) blow-up (audit: e(out) 2.0 -> 0.99; 32M -> 50k rows at 10x).
    Same connected components as the pairs listing, so downstream
    keep-one-per-cluster is unchanged. The oracle regenerates decode,
    dHash, grouping, and both edge classes in SQL."""
    from streaming_data_pipeline_spark.operators.dedup import phash_near_dup_pairs
    from streaming_data_pipeline_spark.operators.multimodal import (
        synth_dhash_png,
    )

    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    # Fused synth->decode->dHash stage (guide §4; one crossing).
    sig = synth_dhash_png(docs)
    # No total sort (r11) — see image_phash_near_dup.
    return phash_near_dup_pairs(sig, max_hamming=3, emit="star")


QUERIES["image_phash_star_dedup"] = image_phash_star_dedup

# single-source the decode->dHash CTE chain from the pairs oracle: the
# star oracle differs only in the emission topology.
_PHASH_H_SQL = ORACLE["image_phash_near_dup"].rsplit("SELECT a.doc_id", 1)[0]

ORACLE["image_phash_star_dedup"] = f"""{_PHASH_H_SQL},
grp AS (
  SELECT h_lo, h_hi, MIN(doc_id) AS canon_id, COUNT(*) AS cnt
  FROM h GROUP BY h_lo, h_hi)
SELECT LEAST(a.canon_id, b.canon_id) AS id_a,
       GREATEST(a.canon_id, b.canon_id) AS id_b,
       CAST(bit_count(xor(a.h_lo, b.h_lo)) + bit_count(xor(a.h_hi, b.h_hi))
            AS BIGINT) AS hamming
FROM grp a JOIN grp b ON (a.h_lo, a.h_hi) < (b.h_lo, b.h_hi)
WHERE bit_count(xor(a.h_lo, b.h_lo)) + bit_count(xor(a.h_hi, b.h_hi)) <= 3
UNION ALL
SELECT g.canon_id AS id_a, m.doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
FROM grp g JOIN h m ON m.h_lo = g.h_lo AND m.h_hi = g.h_hi
WHERE m.doc_id <> g.canon_id
ORDER BY id_a, id_b
"""


def simhash128_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 128-bit width of the SimHash near-dup operator
    (operators/dedup.py:simhash_near_dup_pairs, bits=128) — the
    >10^6-distinct-signature scale option: with 4 chunks the per-chunk
    bucket space grows 2^16 -> 2^32, collapsing the birthday-collision
    candidate term the scale audit measured (cross-copy false
    candidates 166,606 @64-bit -> 0 @128-bit on the 10x corpus,
    SCALING_AUDIT.json). Hamming is over all 128 sign bits, so the
    accepted pair set is a (stricter) subset of the 64-bit query's —
    this row keeps the scale path oracle-verified instead of
    pytest-only. Oracle: same md5-nibble signature SQL at width 128,
    32-char chunk banding, string-hamming verify."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(docs, bits=128)


QUERIES["simhash128_near_dup"] = simhash128_near_dup

ORACLE["simhash128_near_dup"] = f"""
WITH {_sql_simhash_sig_ctes(128)},
banded AS (
  SELECT id, simhash, p, substring(simhash, p*32 + 1, 32) AS chunk
  FROM h CROSS JOIN (SELECT unnest(range(4)) AS p)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b ON a.p = b.p AND a.chunk = b.chunk AND a.id < b.id
)
SELECT id_a, id_b, CAST(hamming(ha.simhash, hb.simhash) AS BIGINT) AS hamming
FROM cand JOIN h ha ON cand.id_a = ha.id JOIN h hb ON cand.id_b = hb.id
WHERE hamming(ha.simhash, hb.simhash) <= 3
ORDER BY id_a, id_b
"""


def semantic_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style SEMANTIC deduplication over the embedding space —
    the third dedup modality alongside lexical (minhash/simhash) and
    visual (image_phash_near_dup): near-dup pairs from bucketed cosine
    similarity (operators/similarity.py:near_dup_pairs — LSH buckets,
    never all-pairs), connected components via the two-phase distributed
    union-find (operators/dedup.py:_unionfind_components, bounded by
    |vectors-with-edges|), then keep the minimum vec_id per cluster.
    Output: (vec_id, cluster_id, cluster_size, keep) — the `keep=false`
    rows are the semantically redundant vectors a curation pipeline
    drops. The oracle recomputes pairs and components with a recursive
    transitive-closure CTE (oracle-only O(cluster^2) shape)."""
    from streaming_data_pipeline_spark.operators.dedup import _unionfind_components

    emb = _emb(spark, sf_dir)
    pairs = near_dup_pairs(emb, threshold=0.3).select("id_a", "id_b")
    nodes = emb.select(F.col("vec_id").alias("node"))
    labels = _unionfind_components(pairs, nodes)
    sizes = labels.groupBy("label").agg(F.count("*").alias("sz"))
    return (
        labels.join(sizes, "label")
        .select(
            F.col("node").cast("long").alias("vec_id"),
            F.col("label").cast("long").alias("cluster_id"),
            F.col("sz").cast("long").alias("cluster_size"),
            (F.col("node") == F.col("label")).alias("keep"),
        )
        # no total sort (r11) — see image_phash_near_dup
    )


QUERIES["semantic_dedup_keep_canonical"] = semantic_dedup_keep_canonical

_EMB_PAIRS_SQL = ORACLE["embedding_near_dup_pairs"].rsplit("ORDER BY", 1)[0]

ORACLE["semantic_dedup_keep_canonical"] = f"""
WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM ( {_EMB_PAIRS_SQL} )),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT vec_id AS node FROM embeddings WHERE embedding IS NOT NULL),
reach AS (
  SELECT node, node AS r FROM nodes
  UNION
  SELECT e.src AS node, r.r FROM edges e JOIN reach r ON e.dst = r.node
),
labels AS (SELECT node AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY node)
SELECT CAST(l.vec_id AS BIGINT) AS vec_id,
       CAST(l.cluster_id AS BIGINT) AS cluster_id,
       CAST(c.sz AS BIGINT) AS cluster_size,
       l.vec_id = l.cluster_id AS keep
FROM labels l
JOIN (SELECT cluster_id, COUNT(*) AS sz FROM labels GROUP BY cluster_id) c
  USING (cluster_id)
ORDER BY l.vec_id
"""


def dedup_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash APPROXIMATION QUALITY, measured — the dedup analog of
    similarity_recall_at_k: for every LSH candidate pair (shares >= 1
    band bucket; no threshold pruning), the signature-estimated Jaccard
    (matching slots / 32) is compared against the exact token-set
    Jaccard, ENTIRELY IN INTEGERS: err = |m/32 - i/u| is reported as
    err_num = |m*u - 32*i| over err_den = 32*u, so the row is exact in
    both engines — no float subtraction, no rounding ties. Same scale
    shape as minhash_lsh_pairs: docs collapse to distinct token-set
    groups, one codegen signature hash-agg, banding self-join at group
    level, doc-pair expansion last. Empty-token docs are excluded (their
    signature is all-NULL and their Jaccard 0/0 — undefined on both
    sides of the comparison by construction).

    Runs on a DETERMINISTIC 1-in-10 SAMPLE (doc_id % 10 = 0): unlike
    the production dedup path, this diagnostic keeps candidates that
    can never reach the threshold (that bias is what it measures), so
    its candidate set is near-quadratic on token-sharing corpora —
    estimator calibration on a fixed sample is exactly how a production
    pipeline sizes k before trusting a signature, and the sample keeps
    the diagnostic linear-ish at any corpus size.
    Reference anchor: SURVEY §2.12 dedup."""
    from streaming_data_pipeline_spark.functions.text import (
        MINHASH_A,
        MINHASH_B,
        distinct_tokens,
        lsh_band_buckets,
    )

    from streaming_data_pipeline_spark.plans.base import (
        plan_cached,
        release_plan_caches,
    )

    release_plan_caches()
    k, bands, rows = 32, 8, 4
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    # members / groups / sig each feed several downstream branches (the
    # banding self-join reads sig twice, the scored join reads it twice
    # more plus groups twice, the expansion reads members twice) — the
    # same compute-once-fan-out caching minhash_lsh_pairs already does;
    # uncached, every branch re-ran the tokenize + md5 + signature
    # aggregate from the parquet scan.
    members = plan_cached(
        docs.select(
            F.col("doc_id").alias("id"),
            F.array_sort(distinct_tokens(F.col("text"))).alias("toks"),
        )
        .filter(F.size("toks") > 0)
        .withColumn("fp", F.md5(F.concat_ws(" ", "toks")))
    )
    groups = plan_cached(
        members.groupBy("fp").agg(
            F.any_value("toks").alias("toks"), F.count("*").alias("cnt")
        )
    )
    tok = groups.select("fp", F.explode("toks").alias("t")).withColumn(
        "x", F.conv(F.substring(F.md5("t"), 1, 7), 16, 10).cast("long")
    )
    sig = plan_cached(
        tok.groupBy("fp").agg(
            *[
                F.min(
                    F.expr(
                        f"({MINHASH_A[j]}L * x + {MINHASH_B[j]}L) div 2147483648L"
                    )
                )
                .cast("string")
                .alias(f"h{j}")
                for j in range(k)
            ]
        )
    )
    bucketed = sig.select(
        "fp",
        F.explode(
            lsh_band_buckets(F.array(*[F.col(f"h{j}") for j in range(k)]), bands, rows)
        ).alias("bucket"),
    )
    cand = (
        bucketed.alias("a")
        .join(
            bucketed.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.fp") < F.col("b.fp")),
        )
        .select(F.col("a.fp").alias("fp_a"), F.col("b.fp").alias("fp_b"))
        .distinct()
    )
    sig_a = sig.select(F.col("fp").alias("fp_a"), *[F.col(f"h{j}").alias(f"a{j}") for j in range(k)])
    sig_b = sig.select(F.col("fp").alias("fp_b"), *[F.col(f"h{j}").alias(f"b{j}") for j in range(k)])
    matches = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0) for j in range(k)
    ).cast("long")
    g_a = groups.select(F.col("fp").alias("fp_a"), F.col("toks").alias("toks_a"))
    g_b = groups.select(F.col("fp").alias("fp_b"), F.col("toks").alias("toks_b"))
    scored = (
        cand.join(sig_a, "fp_a")
        .join(sig_b, "fp_b")
        .withColumn("m", matches)
        .join(g_a, "fp_a")
        .join(g_b, "fp_b")
        .select(
            "fp_a",
            "fp_b",
            "m",
            F.size(F.array_intersect("toks_a", "toks_b")).cast("long").alias("i"),
            F.size(F.array_union("toks_a", "toks_b")).cast("long").alias("u"),
        )
    )
    m_a = members.select(F.col("fp").alias("fp_a"), F.col("id").alias("ida"))
    m_b = members.select(F.col("fp").alias("fp_b"), F.col("id").alias("idb"))
    cross = (
        scored.join(m_a, "fp_a")
        .join(m_b, "fp_b")
        .select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            "m",
            "i",
            "u",
        )
    )
    within = (
        groups.filter(F.col("cnt") > 1)
        .join(members.select("fp", F.col("id").alias("ida")), "fp")
        .join(members.select("fp", F.col("id").alias("idb")), "fp")
        .filter(F.col("ida") < F.col("idb"))
        .select(
            F.col("ida").alias("id_a"),
            F.col("idb").alias("id_b"),
            F.lit(32).cast("long").alias("m"),
            F.size("toks").cast("long").alias("i"),
            F.size("toks").cast("long").alias("u"),
        )
    )
    return (
        cross.unionByName(within)
        .select(
            "id_a",
            "id_b",
            F.col("m").alias("sig_matches"),
            F.col("i").alias("inter_sz"),
            F.col("u").alias("union_sz"),
            F.abs(F.col("m") * F.col("u") - 32 * F.col("i")).alias("err_num"),
            (32 * F.col("u")).alias("err_den"),
        )
        # No orderBy (r11): the driver's value compare is order-
        # insensitive (same contract dedup_near_minhash_lsh relies on),
        # and a total sort here cost DOUBLE the expansion plan — the
        # range partitioner's sampling job executes the whole
        # candidate-score-expand tree once before the sort itself runs
        # it again.
    )


QUERIES["dedup_minhash_estimate_error"] = dedup_minhash_estimate_error

ORACLE["dedup_minhash_estimate_error"] = f"""
WITH toks AS (
  SELECT doc_id AS id, {_DTOKS} AS ts FROM documents
  WHERE doc_id % 10 = 0 AND len({_DTOKS}) > 0),
{sql_minhash_banding_ctes(32, 8)},
scored AS (
  SELECT id_a, id_b,
         CAST(list_sum(list_transform(range(32),
              j -> CASE WHEN sa.sig[j+1] = sb.sig[j+1] THEN 1 ELSE 0 END))
           AS BIGINT) AS m,
         CAST(len(list_intersect(ta.ts, tb.ts)) AS BIGINT) AS i,
         CAST(len(list_distinct(list_concat(ta.ts, tb.ts))) AS BIGINT) AS u
  FROM cand
  JOIN sigs sa ON cand.id_a = sa.id JOIN sigs sb ON cand.id_b = sb.id
  JOIN toks ta ON cand.id_a = ta.id JOIN toks tb ON cand.id_b = tb.id
)
SELECT id_a, id_b, m AS sig_matches, i AS inter_sz, u AS union_sz,
       abs(m * u - 32 * i) AS err_num, 32 * u AS err_den
FROM scored ORDER BY id_a, id_b
"""


def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup CANONICAL-SELECTION POLICY variant: within each token-set
    duplicate group, keep the HIGHEST-quality document (tie -> lowest
    doc_id) instead of the lowest id — the policy a production corpus
    actually wants (of N near-identical crawls, keep the cleanest).
    Quality is the shared integer x10 score (_doc_q10); selection is
    one rank-window per group. Output: every member of a dup group
    (dup_count > 1) with its score and keep flag. Scale shape: one
    fingerprint hash-agg + one window partitioned by the same key —
    no extra shuffle beyond the groups themselves."""
    from pyspark.sql import Window

    from streaming_data_pipeline_spark.functions.text import token_set_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        token_set_fingerprint(F.col("text")).alias("fp"),
        _doc_q10().alias("q10"),
    )
    w = Window.partitionBy("fp").orderBy(F.desc("q10"), F.asc("doc_id"))
    grp = base.groupBy("fp").agg(F.count("*").cast("long").alias("dup_count"))
    return (
        base.withColumn("rn", F.row_number().over(w))
        .join(grp, "fp")
        .filter(F.col("dup_count") > 1)
        .select(
            "fp",
            "doc_id",
            "q10",
            (F.col("rn") == 1).alias("keep"),
            "dup_count",
        )
        .orderBy("fp", "doc_id")
    )


QUERIES["dedup_keep_best_quality"] = dedup_keep_best_quality

ORACLE["dedup_keep_best_quality"] = f"""
WITH base AS (
  SELECT doc_id,
         md5(COALESCE(array_to_string(list_sort({_DTOKS}), ' '), '')) AS fp,
         CAST(
           CASE WHEN length(text) >= 20 AND length(text) <= 10000 THEN 4 ELSE 0 END
         + CASE WHEN (CASE WHEN length(text) > 0
                      THEN round(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) / length(text), 6)
                      ELSE 0.0 END) <= 0.2 THEN 3 ELSE 0 END
         + CASE WHEN len(list_filter({_TOKS}, x -> x IN ({_STOPS_IN}))) > 0 THEN 3 ELSE 0 END
           AS BIGINT) AS q10
  FROM documents),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY fp ORDER BY q10 DESC, doc_id) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS dup_count
  FROM base)
SELECT fp, doc_id, q10, rn = 1 AS keep, dup_count
FROM ranked WHERE dup_count > 1 ORDER BY fp, doc_id
"""


def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL exact dedup — the shape a daily ingest actually
    runs: the corpus is split into an already-deduped BASE (80%) and
    today's DELTA (doc_id % 5 = 4); only delta docs are checked, (a)
    against the base fingerprint set via a LEFT SEMI-shaped join (one
    hash lookup per delta doc, never re-pairing the base with itself)
    and (b) within the delta (first doc_id wins). Output per delta doc:
    dup_of_base / dup_within_delta / keep (novel AND first-in-delta).
    At 100 TB the base fingerprints are a stored, bucketed table and
    the daily cost is |delta| hash probes — O(delta), not O(corpus)."""
    from pyspark.sql import Window

    from streaming_data_pipeline_spark.functions.text import text_fingerprint

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", text_fingerprint(F.col("text")).alias("fp")
    )
    is_delta = F.col("doc_id") % 5 == 4
    base_fps = docs.filter(~is_delta).select("fp").distinct()
    delta = docs.filter(is_delta)
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        delta.join(
            base_fps.withColumn("in_base", F.lit(True)), "fp", "left"
        )
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "fp",
            F.coalesce(F.col("in_base"), F.lit(False)).alias("dup_of_base"),
            (F.col("rn") > 1).alias("dup_within_delta"),
            (
                F.coalesce(F.col("in_base"), F.lit(False)).eqNullSafe(False)
                & (F.col("rn") == 1)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


QUERIES["dedup_incremental_ingest"] = dedup_incremental_ingest

ORACLE["dedup_incremental_ingest"] = """
WITH fps AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         doc_id % 5 = 4 AS is_delta
  FROM documents),
base AS (SELECT DISTINCT fp FROM fps WHERE NOT is_delta),
delta AS (
  SELECT f.doc_id, f.fp,
         b.fp IS NOT NULL AS dup_of_base,
         row_number() OVER (PARTITION BY f.fp ORDER BY f.doc_id) AS rn
  FROM fps f LEFT JOIN base b ON f.fp = b.fp
  WHERE f.is_delta)
SELECT doc_id, fp, dup_of_base,
       rn > 1 AS dup_within_delta,
       (NOT dup_of_base) AND rn = 1 AS keep
FROM delta ORDER BY doc_id
"""


def dedup_unicode_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNICODE-NORMALIZATION-AWARE exact dedup: byte-level fingerprints
    miss duplicates that differ only in Unicode form (NFC "é" vs the
    decomposed "e"+U+0301 — endemic in web-crawled corpora), so the
    canonical fingerprint must hash the NFC-normalized text. The fixture
    is ASCII, so the form divergence is synthesized deterministically:
    even doc_ids get a COMPOSED suffix, odd ones the DECOMPOSED spelling
    of the same string. Normalized fingerprints collapse the two forms
    (raw fingerprints cannot), and the query reports exactly those
    groups — a correct implementation shows n_raw_variants = 2 on
    cross-parity dup groups.

    NFC itself has no Spark built-in, so it runs as an Arrow-batched
    pandas UDF (§2.9 escape hatch, justified: codepoint normalization
    is not expressible in column expressions); the oracle uses DuckDB's
    utf8proc-backed nfc_normalize — agreement proves the two
    implementations normalize identically. Everything around the UDF
    (fingerprint, group, count) stays JVM-side."""
    import pandas

    from pyspark.sql.functions import pandas_udf

    def _nfc_batch(s: pandas.Series) -> pandas.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    # explicit real annotations (module uses `from __future__ import
    # annotations`, so inline hints stringify and pandas_udf can't
    # resolve them without a module-global `pd`)
    _nfc_batch.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    nfc = pandas_udf(_nfc_batch, "string")

    docs = load_table(spark, sf_dir, "documents")
    # canonicalize to the sorted token set first (the fixture's dup
    # signal lives at the token-set level - no byte- or case-identical
    # texts exist below sf0.1), THEN append the Unicode-form suffix: dup
    # groups exist at every scale and the only divergence left inside
    # them is normalization form
    from streaming_data_pipeline_spark.functions.text import distinct_tokens

    canon = F.concat_ws(" ", F.array_sort(distinct_tokens(F.col("text"))))
    suffixed = docs.select(
        "doc_id",
        F.concat(
            canon,
            F.when(F.col("doc_id") % 2 == 0, F.lit(" café")).otherwise(
                F.lit(" café")
            ),
        ).alias("text"),
    )
    fps = suffixed.select(
        "doc_id",
        F.md5("text").alias("raw_fp"),
        F.md5(nfc(F.col("text"))).alias("norm_fp"),
    )
    return (
        fps.groupBy("norm_fp")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("raw_fp").cast("long").alias("n_raw_variants"),
            F.min("doc_id").cast("long").alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("norm_fp")
    )


QUERIES["dedup_unicode_normalized"] = dedup_unicode_normalized

ORACLE["dedup_unicode_normalized"] = f"""
WITH suffixed AS (
  SELECT doc_id,
         COALESCE(array_to_string(list_sort({_DTOKS}), ' '), '')
           || CASE WHEN doc_id % 2 = 0
                   THEN ' caf' || chr(233)
                   ELSE ' cafe' || chr(769) END AS text
  FROM documents),
fps AS (
  SELECT doc_id, md5(text) AS raw_fp, md5(nfc_normalize(text)) AS norm_fp
  FROM suffixed)
SELECT norm_fp,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT raw_fp) AS BIGINT) AS n_raw_variants,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id
FROM fps GROUP BY norm_fp HAVING COUNT(*) > 1 ORDER BY norm_fp
"""


def dedup_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDIT-DISTANCE near-dup screen — the modality that catches OCR
    noise and small in-place edits that token-set methods blur: within
    each token-set BLOCK (same bag of words — the cheap blocker that
    makes pairwise edit distance tractable), every member is compared
    to the block's CANONICAL (min doc_id) — star topology, O(n) exact
    unit-cost Levenshtein evaluations per block instead of the O(n^2)
    all-pairs that a single duplicate-heavy block turns quadratic (the
    sf0.1 fixture has a 248-member block: 30k pairs vs 247 star edges —
    measured 141 s vs sub-second). The star is the right production
    shape: dedup keeps one canonical per block, so the question that
    matters is each member's distance TO the kept doc. Distance 0 =
    byte-identical; positive = same words, different order/spacing.
    Both engines run the same classic DP (Spark levenshtein / DuckDB
    levenshtein), integer-exact."""
    from streaming_data_pipeline_spark.functions.text import token_set_fingerprint

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", token_set_fingerprint(F.col("text")).alias("fp")
    )
    grp = docs.groupBy("fp").agg(
        F.count("*").alias("cnt"), F.min("doc_id").alias("canon_id")
    )
    dup_blocks = grp.filter(F.col("cnt") > 1)
    members = docs.join(dup_blocks, "fp")
    # The broadcast side must be the CANONICAL texts only — one row per
    # duplicate block, not the full corpus. Semi-joining docs against
    # the (broadcast, tiny) canon_id set keeps the full-table pass
    # map-side; broadcasting all of docs here would ship the whole
    # corpus text to every executor at real scale.
    canon_text = docs.join(
        F.broadcast(dup_blocks.select("canon_id")),
        docs["doc_id"] == F.col("canon_id"),
        "left_semi",
    ).select(F.col("doc_id").alias("canon_id"), F.col("text").alias("canon_text"))
    # Spread the star edges by MEMBER id before the DP runs: one
    # duplicate-heavy block shares a single canon_id, so partitioning
    # by the join key (or leaving the scan's single split) would put
    # every O(len^2) Levenshtein of that block on one task; the
    # canonical texts (bounded by the duplicate-block count) broadcast.
    return (
        spread_small_scan(
            members.filter(F.col("doc_id") != F.col("canon_id")), "doc_id"
        )
        .join(F.broadcast(canon_text), "canon_id")
        .select(
            F.col("canon_id").alias("id_a"),
            F.col("doc_id").alias("id_b"),
            F.levenshtein("canon_text", "text").cast("long").alias("edit_distance"),
        )
        # no total sort (r11) — see image_phash_near_dup
    )


QUERIES["dedup_edit_distance_pairs"] = dedup_edit_distance_pairs

ORACLE["dedup_edit_distance_pairs"] = f"""
WITH d AS (
  SELECT doc_id, text,
         md5(COALESCE(array_to_string(list_sort({_DTOKS}), ' '), '')) AS fp
  FROM documents),
grp AS (SELECT fp, MIN(doc_id) AS canon_id FROM d GROUP BY fp
        HAVING COUNT(*) > 1)
SELECT g.canon_id AS id_a, m.doc_id AS id_b,
       CAST(levenshtein(c.text, m.text) AS BIGINT) AS edit_distance
FROM grp g
JOIN d m ON m.fp = g.fp AND m.doc_id <> g.canon_id
JOIN d c ON c.doc_id = g.canon_id
ORDER BY id_a, id_b
"""


def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance scoring
    (operators/similarity.py:pq_adc_topk): 8x8-dim subvector codes
    (~8 bytes/vector, 32x smaller than f32), per-probe LUT scoring,
    exact-cosine rerank of the 50-candidate shortlist. The most
    compressed tier of the similarity stack; recall measured against
    brute force in similarity_recall_at_k (pq_adc_recall)."""
    from streaming_data_pipeline_spark.operators.similarity import pq_adc_topk

    emb = _emb(spark, sf_dir)
    # no total sort (r11) — see similarity_topk_bruteforce
    return pq_adc_topk(emb, emb.filter(F.col("vec_id") < N_PROBES))


QUERIES["similarity_pq_adc"] = similarity_pq_adc


def _sql_pq_ctes(
    n_probes: int = N_PROBES, n_sub: int = 8, n_codes: int = 16, shortlist: int = 50
) -> str:
    """CTE chain for the PQ-ADC path: codebook from the first n_codes
    vectors, per-subspace nearest-code assignment (fixed-order distance
    chains, ORDER BY d, code tie-break — mirroring Spark's struct-min),
    per-probe LUT, 8-term ADC sum, shortlist. The caller appends the
    exact-rerank SELECT."""

    def sub_d(s: int) -> str:
        return " + ".join(
            f"(CAST(cv[{i + 1}] AS DOUBLE) - CAST(cb.cb_vec[{i + 1}] AS DOUBLE))"
            f" * (CAST(cv[{i + 1}] AS DOUBLE) - CAST(cb.cb_vec[{i + 1}] AS DOUBLE))"
            for i in range(8 * s, 8 * s + 8)
        )

    def sub_l(s: int) -> str:
        return " + ".join(
            f"CAST(pv[{i + 1}] AS DOUBLE) * CAST(cb.cb_vec[{i + 1}] AS DOUBLE)"
            for i in range(8 * s, 8 * s + 8)
        )

    dist_selects = "\n  UNION ALL\n  ".join(
        f"SELECT cand_id, cb.code, {s} AS s, {sub_d(s)} AS d FROM pqcand, pqcb cb"
        for s in range(n_sub)
    )
    lut_selects = "\n  UNION ALL\n  ".join(
        f"SELECT probe_id, cb.code, {s} AS s, {sub_l(s)} AS v FROM pqprobes, pqcb cb"
        for s in range(n_sub)
    )
    code_cols = ", ".join(
        f"MAX(CASE WHEN s = {s} THEN code END) AS c{s}" for s in range(n_sub)
    )
    lut_joins = "\n  ".join(
        f"JOIN pqlut l{s} ON l{s}.probe_id = p.probe_id AND l{s}.s = {s}"
        f" AND l{s}.code = e.c{s}"
        for s in range(n_sub)
    )
    adc = " + ".join(f"l{s}.v" for s in range(n_sub))
    return f"""
pqcb AS (SELECT vec_id AS code, embedding AS cb_vec FROM embeddings
         WHERE vec_id < {n_codes} AND embedding IS NOT NULL),
pqcand AS MATERIALIZED (
        SELECT vec_id AS cand_id, embedding AS cv FROM embeddings
        WHERE embedding IS NOT NULL),
pqprobes AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings
             WHERE vec_id < {n_probes} AND embedding IS NOT NULL),
pqdists AS (
  {dist_selects}),
pqenc0 AS (
  SELECT cand_id, s, code FROM (
    SELECT *, row_number() OVER (PARTITION BY cand_id, s ORDER BY d, code) AS rn
    FROM pqdists) WHERE rn = 1),
pqenc AS (SELECT cand_id, {code_cols} FROM pqenc0 GROUP BY cand_id),
pqlut AS (
  {lut_selects}),
pqadc AS (
  SELECT e.cand_id, p.probe_id, {adc} AS adc
  FROM pqenc e CROSS JOIN pqprobes p
  {lut_joins}
  WHERE p.probe_id <> e.cand_id),
pqshort AS (
  SELECT probe_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id
                                 ORDER BY adc DESC, cand_id) AS arank
    FROM pqadc) WHERE arank <= {shortlist})"""


_SQL_PQ_SCORED = (
    "SELECT s.probe_id, s.cand_id, "
    f"({_sql_dot('pv', 'cv')}) / "
    f"(sqrt({_sql_dot('pv', 'pv')}) * sqrt({_sql_dot('cv', 'cv')})) AS cos "
    "FROM pqshort s JOIN pqprobes USING (probe_id) JOIN pqcand USING (cand_id)"
)


ORACLE["similarity_pq_adc"] = f"""
WITH {_sql_pq_ctes()}
SELECT probe_id, cand_id, round(cos, 6) AS cosine, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos DESC, cand_id) AS rank
      FROM ({_SQL_PQ_SCORED}))
WHERE rank <= 10 ORDER BY probe_id, rank
"""


ORACLE["similarity_recall_at_k"] = _sql_recall_oracle()


def char_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-diversity quality screen per source — Simpson/collision
    diversity of each document's character distribution, in EXACT
    integer arithmetic (the log-free cousin of character entropy: low
    diversity = repeated-character junk, key-mash, padding).

    Per doc with n chars and per-char counts c_i: the probability two
    uniformly drawn positions hold DIFFERENT characters is
    (n² - Σc_i²)/n², reported in ppm via BIGINT `div` — no IEEE log/
    division, so Spark and the oracle agree bit-for-bit (bound: a 1e6-
    char doc gives n²·1e6 = 1e18 < 2⁶³). Shape: explode to (doc, char)
    → two chained hash aggs → per-source rollup; all map-side
    combinable, no window, no shuffle beyond the two key sets.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_char = (
        docs.select("doc_id", "source", F.explode(F.split(F.col("text"), "")).alias("ch"))
        .groupBy("doc_id", "source", "ch")
        .agg(F.count("*").alias("c"))
    )
    per_doc = (
        per_char.groupBy("doc_id", "source")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.col("c")).alias("m"),
        )
        .filter(F.col("n") > 0)
        .select(
            "source",
            F.expr("(n * n - m) * 1000000 div (n * n)").alias("ppm"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.expr("sum(ppm) div count(*)").cast("long").alias("avg_ppm"),
            F.min("ppm").cast("long").alias("min_ppm"),
            F.max("ppm").cast("long").alias("max_ppm"),
        )
        # no total sort (r11): ~20 rows, but the range sampler re-ran the
        # whole per-char explode tail once more just to pick bounds
    )


def inverted_index_postings(spark: SparkSession, sf_dir: str, k: int = 50) -> DataFrame:
    """Inverted-index head: per term, document frequency, collection
    frequency, and a CAPPED posting sample (first 5 doc_ids ascending,
    comma-joined) — the retrieval-side artifact a corpus pipeline
    materializes next to the training shards.

    Scale shape: cf is one explode→hash-agg; df aggregates the DISTINCT
    (term, doc) frame; the posting sample is bounded BEFORE collection —
    a per-term window keeps row_number ≤ 5 (state: 5 rows per term, the
    standard bounded-top-k), so no unbounded collect_list ever
    materializes a stopword's full posting list (which at 100 TB is the
    corpus itself). Real systems shard postings further; the cap IS the
    point here. Top-k terms by (df desc, term asc) — deterministic.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    term_doc = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    cf = term_doc.groupBy("term").agg(F.count("*").alias("cf"))
    td = term_doc.distinct()
    dfreq = td.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("term").orderBy("doc_id")
    sample = (
        td.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("term")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("top_docs")
        )
    )
    return (
        dfreq.join(cf, "term")
        .join(sample, "term")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
            "top_docs",
        )
        # no final re-sort (r11): the TakeOrdered limit above already
        # bounds the head deterministically; compare is order-insensitive
    )


QUERIES["char_diversity_by_source"] = char_diversity_by_source
ORACLE["char_diversity_by_source"] = """
WITH per_char AS (
  SELECT doc_id, source, x.ch, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents, LATERAL unnest(string_split(text, '')) x(ch)
  GROUP BY doc_id, source, x.ch),
per_doc AS (
  SELECT source,
         (SUM(c) * SUM(c) - SUM(c * c)) * 1000000
           // (SUM(c) * SUM(c)) AS ppm
  FROM per_char GROUP BY doc_id, source HAVING SUM(c) > 0)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ppm) // COUNT(*) AS BIGINT) AS avg_ppm,
       CAST(MIN(ppm) AS BIGINT) AS min_ppm,
       CAST(MAX(ppm) AS BIGINT) AS max_ppm
FROM per_doc GROUP BY source ORDER BY source
"""

QUERIES["inverted_index_postings"] = inverted_index_postings
ORACLE["inverted_index_postings"] = """
WITH term_doc AS (
  SELECT doc_id, x.term
  FROM documents,
       LATERAL unnest(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) x(term)),
cf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf FROM term_doc GROUP BY term),
td AS (SELECT DISTINCT doc_id, term FROM term_doc),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
         array_to_string(list_slice(list_sort(list(doc_id)), 1, 5), ',')
           AS top_docs
  FROM td GROUP BY term)
SELECT d.term, d.df, c.cf, d.top_docs
FROM dfreq d JOIN cf c ON c.term = d.term
ORDER BY d.df DESC, d.term ASC
LIMIT 50
"""


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict substring-containment duplicate pairs over documents —
    inner text contained verbatim in a strictly longer outer text
    (SURVEY §2.12 dedup family; complements exact / MinHash / SimHash /
    edit-distance with the quote-and-extend case).

    Candidates come from the rarest-shingle pigeonhole in
    operators/dedup.containment_pairs (never all-pairs; see its
    docstring for the 100 TB argument); `instr` verifies exactly. The
    oracle is the O(n^2) definitional form — tractable only at oracle
    scale, which is the point of having the banded production path.
    """
    from streaming_data_pipeline_spark.operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    # No total sort (r11) — see image_phash_near_dup.
    return containment_pairs(docs)


QUERIES["dedup_containment_pairs"] = dedup_containment_pairs
ORACLE["dedup_containment_pairs"] = """
SELECT CAST(a.doc_id AS BIGINT) AS inner_id,
       CAST(b.doc_id AS BIGINT) AS outer_id,
       CAST(length(a.text) AS BIGINT) AS inner_len,
       CAST(length(b.text) AS BIGINT) AS outer_len
FROM documents a
JOIN documents b
  ON length(a.text) < length(b.text)
 AND position(a.text IN b.text) > 0
WHERE length(a.text) >= 12
ORDER BY inner_id, outer_id
"""


def bpe_train_merges(spark: SparkSession, sf_dir: str, steps: int = 5) -> DataFrame:
    """First ``steps`` BPE merge rules learned from the corpus (Sennrich
    et al. 2016, "Neural Machine Translation of Rare Words with Subword
    Units" — public algorithm): start from characters, repeatedly count
    adjacent symbol pairs weighted by word frequency and fuse the most
    frequent pair (tie: lexicographic). Complements
    ``tokenizer_bpe_pair_counts`` (which only counts round 1) with the
    actual iterative training loop.

    Fully declarative iteration — no driver-side argmax: each round's
    winning pair is a broadcast ONE-ROW frame cross-joined into the
    next state, and the merge itself is `replace(state, ' a b ', ' ab ')`
    over the space-delimited symbol string (identical non-overlapping
    left-to-right semantics in Spark and DuckDB — the sentinel spaces
    make matches symbol-boundary-exact because symbols never contain
    spaces). Per-round cost at 100 TB: one explode + one hash-agg over
    the DISTINCT-word frequency table (vocabulary-sized, not
    corpus-sized) + a broadcast of one row; `localCheckpoint` between
    rounds keeps lineage linear in ``steps``.
    """
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    state = wf.select(
        "n",
        F.concat(
            F.lit(" "), F.array_join(F.split("w", ""), " "), F.lit(" ")
        ).alias("s"),
    ).localCheckpoint(eager=True)
    outs = []
    for step in range(1, steps + 1):
        syms = F.expr("filter(split(trim(s), ' '), x -> x <> '')")
        pairs = (
            state.select("n", syms.alias("syms"))
            .filter(F.size("syms") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> syms[i - 1] || ' ' || syms[i])"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("n").cast("long").alias("c"))
        )
        # Checkpoint the winning pair ONCE and derive both consumers
        # from the checkpoint (r11): previously the output row was
        # checkpointed but ``ab`` re-derived from the lazy ``top``, so
        # the vocabulary-sized pair aggregation executed twice per round
        # (once for the outs checkpoint, again inside the next state
        # checkpoint via the broadcast build).
        top = (
            pairs.orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        outs.append(
            top.select(
                F.lit(step).cast("long").alias("step"), "pair", F.col("c")
            )
        )
        ab = top.select(
            F.expr("split_part(pair, ' ', 1)").alias("a"),
            F.expr("split_part(pair, ' ', 2)").alias("b"),
        )
        state = (
            state.crossJoin(F.broadcast(ab))
            .select(
                "n",
                F.expr(
                    "replace(s, ' ' || a || ' ' || b || ' ',"
                    " ' ' || a || b || ' ')"
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    # no total sort (r11): step already labels the order; compare is
    # order-insensitive
    return out


def _sql_bpe_oracle(steps: int = 5) -> str:
    # Every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    # s{i}/t{i} is referenced twice (by p{i+1} and s{i+1}), so inlining
    # re-evaluates the vocabulary-sized explode chain ~2^steps times —
    # the same blow-up already diagnosed (and fixed) in
    # _sql_bpe_apply_oracle and the k-core oracle.
    ctes = [
        f"wf AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM "
        f"(SELECT unnest({_TOKS}) AS w FROM documents) GROUP BY w)",
        "s0 AS MATERIALIZED (SELECT n, ' ' || array_to_string(string_split(w, ''), ' ')"
        " || ' ' AS s FROM wf)",
    ]
    finals = []
    for i in range(1, steps + 1):
        prev = f"s{i - 1}"
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT syms[CAST(j.j AS INT)] || ' ' || "
            f"syms[CAST(j.j AS INT) + 1] AS pair, CAST(SUM(n) AS BIGINT) AS c "
            f"FROM (SELECT n, list_filter(string_split(trim(s), ' '), "
            f"x -> x <> '') AS syms FROM {prev}) t, "
            f"UNNEST(range(1, len(syms))) AS j(j) GROUP BY 1)"
        )
        ctes.append(
            f"t{i} AS MATERIALIZED "
            f"(SELECT pair, c FROM p{i} ORDER BY c DESC, pair LIMIT 1)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT n, replace(s, "
            f"' ' || split_part(pair, ' ', 1) || ' ' || split_part(pair, ' ', 2) || ' ', "
            f"' ' || split_part(pair, ' ', 1) || split_part(pair, ' ', 2) || ' ') AS s "
            f"FROM {prev}, t{i})"
        )
        finals.append(f"SELECT CAST({i} AS BIGINT) AS step, pair, c FROM t{i}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(finals) + "\nORDER BY step"


QUERIES["bpe_train_merges"] = bpe_train_merges
ORACLE["bpe_train_merges"] = _sql_bpe_oracle(5)


def repeated_passage_coverage(spark: SparkSession, sf_dir: str, gram: int = 32) -> DataFrame:
    """Per-source repeated-passage coverage: for every char position,
    is its 32-gram seen anywhere else in the corpus (>= 2 total
    occurrences, within- or cross-document)? Reports per source the
    average/max covered fraction in exact ppm and how many docs are
    majority-duplicated (> 50%). This is the measurement half of
    suffix-array exact-substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" — public paper): at
    100 TB you don't build one giant suffix array, you hash fixed-width
    grams and hash-aggregate.

    Shape: one explode emits (doc, md5(gram), local-count) collapsed
    per doc — identical grams inside a doc share one row — then one
    global hash-agg counts occurrences, one join flags repeated grams,
    and two stacked aggs fold to doc then source. All counts integer;
    coverage = repeated_positions * 1e6 // positions.
    """
    # Repartition before the ~len(text)-fold gram explode (the scan is
    # one split at small SF; amplified work must not run single-task).
    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents").filter(F.length("text") >= gram),
        "doc_id",
    )
    from pyspark.sql import Window

    per_dg = (
        docs.select(
            "doc_id",
            "source",
            # xxhash64 applied INSIDE the lambda: the exploded array
            # holds 8-byte longs, never 32-char strings (the hash is
            # engine-internal grouping identity — the verified output
            # has no hash column, so the md5 cross-engine contract
            # doesn't apply)
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(text) - {gram - 1}),"
                    f" i -> xxhash64(substr(text, i, {gram})))"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "source", "g")
        .agg(F.count("*").alias("c"))
    )
    # Corpus-wide occurrence count as a window sum over the gram key:
    # same value as the old aggregate-then-self-join (sum of c per g),
    # but the gram explode + first aggregate execute ONCE — the join
    # formulation re-derived the per_dg subtree on both sides of the
    # join (Spark shares no work between DataFrame references), i.e.
    # two full passes over the ~len(text)-fold gram blow-up. One
    # exchange keyed on g replaces agg + join, exactly the §2.4
    # "share one exchange between operations keyed the same way" move.
    per_doc = (
        per_dg.withColumn("tot", F.sum("c").over(Window.partitionBy("g")))
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").alias("positions"),
            F.sum(F.when(F.col("tot") >= 2, F.col("c")).otherwise(0)).alias("rep"),
        )
        .select(
            "source",
            (F.col("rep") * 1000000).cast("long").alias("num"),
            F.col("positions").cast("long").alias("den"),
        )
        .select(
            "source", F.expr("num div den").alias("ppm"), F.lit(1).alias("one")
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.expr("sum(ppm) div count(*)").cast("long").alias("avg_ppm"),
            F.max("ppm").cast("long").alias("max_ppm"),
            F.sum(F.when(F.col("ppm") > 500000, 1).otherwise(0))
            .cast("long")
            .alias("majority_dup_docs"),
        )
        # no total sort (r11): the range sampler re-ran the 32-gram
        # explode tail once more just to pick bounds for ~20 rows
    )


QUERIES["repeated_passage_coverage"] = repeated_passage_coverage
ORACLE["repeated_passage_coverage"] = """
WITH per_dg AS (
  SELECT doc_id, source, substr(text, CAST(i.i AS INT), 32) AS g,
         COUNT(*) AS c
  FROM documents, UNNEST(range(1, length(text) - 30)) AS i(i)
  WHERE length(text) >= 32
  GROUP BY 1, 2, 3),
gc AS (SELECT g, SUM(c) AS tot FROM per_dg GROUP BY g),
per_doc AS (
  SELECT doc_id, source,
         (SUM(CASE WHEN tot >= 2 THEN c ELSE 0 END) * 1000000)
           // SUM(c) AS ppm
  FROM per_dg JOIN gc USING (g)
  GROUP BY doc_id, source)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ppm) // COUNT(*) AS BIGINT) AS avg_ppm,
       CAST(MAX(ppm) AS BIGINT) AS max_ppm,
       CAST(SUM(CASE WHEN ppm > 500000 THEN 1 ELSE 0 END) AS BIGINT)
         AS majority_dup_docs
FROM per_doc GROUP BY source ORDER BY source
"""


def audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level audio analysis over decoded WAV payloads: 50-sample
    energy windows per doc, reduced to the per-doc loudest frame (tie:
    lowest index) plus totals — the VAD/loudness-normalization
    primitive on top of the real stdlib decode path
    (operators/multimodal.decode_wav_frames).

    The frame fan-out happens inside the Arrow batch (bounded per doc);
    the reduction is one hash-agg keyed on doc_id using a lexicographic
    struct-max for the deterministic argmax. The oracle regenerates the
    PCM formula and windows in SQL, so a frame-boundary bug in the
    decoder flips rows red.
    """
    from streaming_data_pipeline_spark.operators.multimodal import (
        synth_decode_wav_frames,
    )

    # Fused synth+decode stage (guide §4.1) over a redistributed scan —
    # the documents scan is one split at small SF and the per-doc
    # encode/decode must not run single-task (same rule as the other
    # media queries).
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    frames = synth_decode_wav_frames(docs)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_frames"),
            F.sum("sum_sq").cast("long").alias("total_sq"),
            F.max(F.struct(F.col("sum_sq"), (-F.col("frame_idx")).alias("ni")))
            .alias("m"),
        )
        .select(
            "doc_id",
            "n_frames",
            "total_sq",
            F.col("m.sum_sq").cast("long").alias("peak_frame_sq"),
            (-F.col("m.ni")).cast("long").alias("peak_frame_idx"),
        )
        # no total sort (r11) — see multimodal_jpeg_decode
    )


QUERIES["audio_energy_windows"] = audio_energy_windows
ORACLE["audio_energy_windows"] = """
WITH pcm AS (
  SELECT d.doc_id, u.i // 50 AS frame_idx,
         ((d.doc_id * 7919 + u.i * 104729) % 65536) - 32768 AS s
  FROM documents d,
       UNNEST(range(CAST(200 + d.doc_id % 100 AS BIGINT))) AS u(i)),
frames AS (
  SELECT doc_id, frame_idx, SUM(s * s) AS sum_sq
  FROM pcm GROUP BY doc_id, frame_idx),
ranked AS (
  SELECT doc_id, frame_idx, sum_sq,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY sum_sq DESC, frame_idx ASC) AS rk
  FROM frames)
SELECT f.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(f.sum_sq) AS BIGINT) AS total_sq,
       CAST(MAX(r.sum_sq) AS BIGINT) AS peak_frame_sq,
       CAST(MAX(r.frame_idx) AS BIGINT) AS peak_frame_idx
FROM frames f
JOIN ranked r ON r.doc_id = f.doc_id AND r.rk = 1
GROUP BY f.doc_id ORDER BY f.doc_id
"""


def sparse_dot_topk_pairs(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Sparse lexical similarity: top-k document pairs by inverted-index
    dot product over integer tf-idf-surrogate weights (w = tf * (N div
    df), df-capped) — the classic all-pairs-similarity-search shape
    (Bayardo et al. 2007, "Scaling Up All Pairs Similarity Search" —
    public) that complements MinHash (set overlap) and embedding ANN
    (dense cosine) with exact weighted lexical matching.

    Scale shape: pairs are generated ONLY through shared terms (an
    inverted-index self-join keyed on term), and terms with df above a
    stopword cap are dropped first — the standard prefix/df-pruning
    that bounds every posting list, so candidate volume is
    sum_t df_t^2 over RARE terms only, never n^2. One hash-agg builds
    the index, one term-keyed join + pair hash-agg scores, top-k is
    TakeOrderedAndProject. All integer arithmetic.
    """
    docs = load_table(spark, sf_dir, "documents")
    term_doc = (
        docs.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = docs.agg(F.count("*").alias("n"))
    dfreq = term_doc.groupBy("t").agg(F.count("*").alias("df"))
    weighted = (
        term_doc.join(dfreq, "t")
        .crossJoin(F.broadcast(n_docs))
        # df cap: drop corpus-wide terms (df > N/4) BEFORE the
        # self-join — the pruning that keeps posting lists bounded
        .filter(4 * F.col("df") <= F.col("n"))
        .select("doc_id", "t", (F.col("tf") * F.expr("n div df")).alias("w"))
    )
    pairs = (
        weighted.alias("a")
        .join(weighted.alias("b"), "t")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(
            F.sum(F.col("a.w") * F.col("b.w")).cast("long").alias("dot"),
            F.count("*").cast("long").alias("shared_terms"),
        )
    )
    from pyspark.sql import Window

    top = pairs.orderBy(F.desc("dot"), "id_a", "id_b").limit(k)
    w = Window.orderBy(F.desc("dot"), "id_a", "id_b")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "id_a", "id_b", "dot", "shared_terms")
        .orderBy("rank")
    )


QUERIES["sparse_dot_topk_pairs"] = sparse_dot_topk_pairs
ORACLE["sparse_dot_topk_pairs"] = f"""
WITH term_doc AS (
  SELECT doc_id, x.t, COUNT(*) AS tf
  FROM documents,
       LATERAL unnest(list_filter(string_split(lower(text), ' '),
                                  s -> s <> '')) x(t)
  GROUP BY doc_id, x.t),
n_docs AS (SELECT COUNT(*) AS n FROM documents),
dfreq AS (SELECT t, COUNT(*) AS df FROM term_doc GROUP BY t),
weighted AS (
  SELECT doc_id, td.t, tf * (n // df) AS w
  FROM term_doc td JOIN dfreq USING (t), n_docs
  WHERE 4 * df <= n),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(a.w * b.w) AS BIGINT) AS dot,
         CAST(COUNT(*) AS BIGINT) AS shared_terms
  FROM weighted a JOIN weighted b
    ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
top AS (SELECT * FROM pairs ORDER BY dot DESC, id_a, id_b LIMIT 20)
SELECT CAST(row_number() OVER (ORDER BY dot DESC, id_a, id_b) AS BIGINT)
         AS rank,
       id_a, id_b, dot, shared_terms
FROM top ORDER BY rank
"""


def langid_confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation rollup for the language-id heuristic:
    per labeled class, the support, correct count, and integer-ppm
    precision/recall computed from the (labeled, predicted) confusion
    counts — the quality-report pattern for ANY cheap classifier run
    over the corpus (lang-id here; toxicity/quality classifiers ride
    the same shape).

    Two hash-aggs: confusion cells, then per-class margins joined back
    (both frames bounded by the label-domain squared). All ratios are
    integer ppm divisions.
    """
    from streaming_data_pipeline_spark.plans.base import (
        plan_cached,
        release_plan_caches,
    )

    release_plan_caches()
    # the per-doc lang_id heuristic is the heavy map work — spread the
    # narrow scan so it doesn't run single-task
    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    pred = docs.select(
        F.col("lang").alias("actual"),
        lang_id(F.col("text")).alias("predicted"),
    )
    # cells feeds three margins (support, predicted_n, diag) — cache the
    # label-domain-squared confusion table so the per-doc lang_id map
    # runs once, not three times (the plan carried 18 Exchanges).
    cells = plan_cached(
        pred.groupBy("actual", "predicted").agg(F.count("*").alias("c"))
    )
    support = cells.groupBy("actual").agg(F.sum("c").alias("support"))
    predicted_n = cells.groupBy("predicted").agg(F.sum("c").alias("pred_n"))
    diag = cells.filter(F.col("actual") == F.col("predicted")).select(
        "actual", F.col("c").alias("correct")
    )
    return (
        support.join(diag, "actual", "left")
        .join(
            predicted_n.withColumnRenamed("predicted", "actual"), "actual", "left"
        )
        .select(
            F.col("actual").alias("lang"),
            F.col("support").cast("long").alias("support"),
            F.coalesce("correct", F.lit(0)).cast("long").alias("correct"),
            F.expr(
                "coalesce(correct, 0) * 1000000 div support"
            ).cast("long").alias("recall_ppm"),
            F.expr(
                "case when coalesce(pred_n, 0) = 0 then null"
                " else coalesce(correct, 0) * 1000000 div pred_n end"
            ).cast("long").alias("precision_ppm"),
        )
        .orderBy("lang")
    )


QUERIES["langid_confusion_metrics"] = langid_confusion_metrics
ORACLE["langid_confusion_metrics"] = f"""
WITH base AS ({_sql_lang_id()}),
cells AS (SELECT labeled_lang AS actual, predicted_lang AS predicted,
                 COUNT(*) AS c
          FROM base GROUP BY 1, 2),
support AS (SELECT actual, SUM(c) AS support FROM cells GROUP BY 1),
pred_n AS (SELECT predicted, SUM(c) AS pred_n FROM cells GROUP BY 1),
diag AS (SELECT actual, c AS correct FROM cells WHERE actual = predicted)
SELECT s.actual AS lang,
       CAST(s.support AS BIGINT) AS support,
       CAST(COALESCE(d.correct, 0) AS BIGINT) AS correct,
       CAST(COALESCE(d.correct, 0) * 1000000 // s.support AS BIGINT)
         AS recall_ppm,
       CAST(CASE WHEN COALESCE(p.pred_n, 0) = 0 THEN NULL
            ELSE COALESCE(d.correct, 0) * 1000000 // p.pred_n END AS BIGINT)
         AS precision_ppm
FROM support s LEFT JOIN diag d ON d.actual = s.actual
LEFT JOIN pred_n p ON p.predicted = s.actual
ORDER BY lang
"""


def dataset_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-stop dataset datasheet (the "datasheets for datasets" card,
    Gebru et al. 2018 — public): corpus size, token and vocabulary
    counts, exact-duplicate rate, language and source mix, and length
    quantiles, emitted as tidy (stat, value) rows a release pipeline
    can publish alongside the data.

    Every line is a small independent aggregate unioned into one
    frame; the only non-trivial stats reuse the engine's own
    primitives (md5 exact-dup fingerprints, the distinct-value
    rank trick for exact medians — no global row sort).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("t"))

    def row(stat, col):
        return F.struct(F.lit(stat).alias("stat"), col.cast("long").alias("value"))

    base = docs.agg(
        F.array(
            row("n_docs", F.count("*")),
            row("n_sources", F.countDistinct("source")),
            row("n_langs", F.countDistinct("lang")),
            row("total_chars", F.sum(F.length("text"))),
            row("min_chars", F.min(F.length("text"))),
            row("max_chars", F.max(F.length("text"))),
        ).alias("rows")
    )
    toks = tok.agg(
        F.array(
            row("n_tokens", F.count("*")),
            row("vocab_size", F.countDistinct("t")),
        ).alias("rows")
    )
    dups = (
        docs.groupBy(F.md5("text").alias("fp"))
        .agg(F.count("*").alias("c"))
        .agg(
            F.array(
                row("exact_dup_docs", F.sum(F.col("c") - 1)),
                row("distinct_texts", F.count("*")),
            ).alias("rows")
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("len").rowsBetween(Window.unboundedPreceding, 0)
    # median over docs WITH text: a NULL length is not an observation
    # (and sorts to opposite ends of the rank window across engines)
    with_text = docs.filter(F.col("text").isNotNull())
    med = (
        with_text.groupBy(F.length("text").alias("len"))
        .agg(F.count("*").alias("c"))
        .withColumn("cum", F.sum("c").over(w))
        .crossJoin(
            F.broadcast(
                with_text.agg(F.expr("(count(*) + 1) div 2").alias("half"))
            )
        )
        .filter(F.col("cum") >= F.col("half"))
        .agg(F.array(row("median_chars", F.min("len"))).alias("rows"))
    )
    out = base.unionByName(toks).unionByName(dups).unionByName(med)
    return (
        out.select(F.explode("rows").alias("r"))
        .select("r.stat", "r.value")
        .orderBy("stat")
    )


QUERIES["dataset_datasheet"] = dataset_datasheet
ORACLE["dataset_datasheet"] = f"""
WITH tok AS (SELECT unnest({_TOKS}) AS t FROM documents),
base AS (
  SELECT 'n_docs' AS stat, CAST(COUNT(*) AS BIGINT) AS value FROM documents
  UNION ALL SELECT 'n_sources', CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents
  UNION ALL SELECT 'n_langs', CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents
  UNION ALL SELECT 'total_chars', CAST(SUM(length(text)) AS BIGINT) FROM documents
  UNION ALL SELECT 'min_chars', CAST(MIN(length(text)) AS BIGINT) FROM documents
  UNION ALL SELECT 'max_chars', CAST(MAX(length(text)) AS BIGINT) FROM documents
  UNION ALL SELECT 'n_tokens', CAST(COUNT(*) AS BIGINT) FROM tok
  UNION ALL SELECT 'vocab_size', CAST(COUNT(DISTINCT t) AS BIGINT) FROM tok
  UNION ALL SELECT 'exact_dup_docs', CAST(SUM(c - 1) AS BIGINT)
    FROM (SELECT md5(text) AS fp, COUNT(*) AS c FROM documents GROUP BY 1)
  UNION ALL SELECT 'distinct_texts', CAST(COUNT(*) AS BIGINT)
    FROM (SELECT md5(text) AS fp FROM documents GROUP BY 1)
  UNION ALL SELECT 'median_chars', CAST(MIN(len) AS BIGINT)
    FROM (SELECT len, SUM(c) OVER (ORDER BY len
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM (SELECT length(text) AS len, COUNT(*) AS c
                FROM documents WHERE text IS NOT NULL GROUP BY 1)),
         (SELECT (COUNT(*) + 1) // 2 AS half FROM documents
          WHERE text IS NOT NULL)
    WHERE cum >= half)
SELECT stat, value FROM base ORDER BY stat
"""


def bpe_apply_compression(spark: SparkSession, sf_dir: str, steps: int = 5) -> DataFrame:
    """Apply the 5 BPE merges learned by `bpe_train_merges` back to the
    corpus and report per-source token-stream compression: initial
    symbol count (= characters), symbol count after the merges, and
    the ppm saved — the train->apply round trip every tokenizer
    pipeline runs.

    Same declarative loop as training (argmax pair as a broadcast
    1-row frame, replace() merging), but the state carries `source` so
    the final fold is a per-source hash-agg. Merge learning aggregates
    over ALL sources (identical totals to the training query — parity
    is asserted in tests). State is vocabulary-sized per source.
    """
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("n"))
    )
    state = wf.select(
        "source",
        "n",
        F.concat(
            F.lit(" "), F.array_join(F.split("w", ""), " "), F.lit(" ")
        ).alias("s"),
    ).localCheckpoint(eager=True)
    for _ in range(steps):
        syms = F.expr("filter(split(trim(s), ' '), x -> x <> '')")
        pairs = (
            state.select("n", syms.alias("syms"))
            .filter(F.size("syms") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> syms[i - 1] || ' ' || syms[i])"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("n").alias("c"))
        )
        top = pairs.orderBy(F.desc("c"), F.asc("pair")).limit(1)
        ab = top.select(
            F.expr("split_part(pair, ' ', 1)").alias("a"),
            F.expr("split_part(pair, ' ', 2)").alias("b"),
        )
        state = (
            state.crossJoin(F.broadcast(ab))
            .select(
                "source",
                "n",
                F.expr(
                    "replace(s, ' ' || a || ' ' || b || ' ',"
                    " ' ' || a || b || ' ')"
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        state.select(
            "source",
            "n",
            F.expr("size(filter(split(trim(s), ' '), x -> x <> ''))").alias(
                "len_after"
            ),
            F.expr("length(replace(s, ' ', ''))").alias("chars"),
        )
        .groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_words"),
            F.sum(F.col("n") * F.col("chars")).cast("long").alias("symbols_initial"),
            F.sum(F.col("n") * F.col("len_after")).cast("long").alias(
                "symbols_final"
            ),
        )
        .withColumn(
            "saved_ppm",
            F.expr(
                "(symbols_initial - symbols_final) * 1000000 div symbols_initial"
            ).cast("long"),
        )
        # no total sort (r11): order-insensitive compare; the range
        # sampler re-ran this plan's tail once more just for bounds
    )


def _sql_bpe_apply_oracle(steps: int = 5) -> str:
    ctes = [
        f"wf AS MATERIALIZED (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS n FROM "
        f"(SELECT source, unnest({_TOKS}) AS w FROM documents) GROUP BY source, w)",
        "s0 AS MATERIALIZED (SELECT source, n, ' ' || array_to_string(string_split(w, ''), ' ')"
        " || ' ' AS s FROM wf)",
    ]
    for i in range(1, steps + 1):
        p = f"s{i - 1}"
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT syms[CAST(j.j AS INT)] || ' ' || "
            f"syms[CAST(j.j AS INT) + 1] AS pair, SUM(n) AS c "
            f"FROM (SELECT n, list_filter(string_split(trim(s), ' '), "
            f"x -> x <> '') AS syms FROM {p}) t, "
            f"UNNEST(range(1, len(syms))) AS j(j) GROUP BY 1)"
        )
        ctes.append(
            f"t{i} AS MATERIALIZED (SELECT pair FROM p{i} ORDER BY c DESC, pair LIMIT 1)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT source, n, replace(s, "
            f"' ' || split_part(pair, ' ', 1) || ' ' || split_part(pair, ' ', 2) || ' ', "
            f"' ' || split_part(pair, ' ', 1) || split_part(pair, ' ', 2) || ' ') AS s "
            f"FROM {p}, t{i})"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
, final AS (
  SELECT source, n,
         len(list_filter(string_split(trim(s), ' '), x -> x <> '')) AS len_after,
         length(replace(s, ' ', '')) AS chars
  FROM s{steps}),
agg AS (
  SELECT source,
         CAST(SUM(n) AS BIGINT) AS n_words,
         CAST(SUM(n * chars) AS BIGINT) AS symbols_initial,
         CAST(SUM(n * len_after) AS BIGINT) AS symbols_final
  FROM final GROUP BY source)
SELECT source, n_words, symbols_initial, symbols_final,
       CAST((symbols_initial - symbols_final) * 1000000 // symbols_initial
            AS BIGINT) AS saved_ppm
FROM agg ORDER BY source"""
    )


QUERIES["bpe_apply_compression"] = bpe_apply_compression
ORACLE["bpe_apply_compression"] = _sql_bpe_apply_oracle(5)


def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of exact-duplicate cluster sizes over token-set
    fingerprints: how many fingerprint groups have exactly k members,
    with the rows and removable-duplicate tally each size class
    contributes — the report that says whether duplication is a few
    huge clusters (boilerplate blast) or a long tail of pairs
    (mirrors/quotes), which decides the dedup strategy.

    Two stacked hash-aggs (fingerprint -> size, size -> group count);
    the histogram domain is bounded by the largest cluster, so the
    output is tiny at any corpus scale.
    """
    from streaming_data_pipeline_spark.functions.text import (
        token_set_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents")
    sizes = (
        docs.select(token_set_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("sz"))
    )
    return (
        sizes.groupBy("sz")
        .agg(F.count("*").alias("n_groups"))
        .select(
            F.col("sz").cast("long").alias("cluster_size"),
            F.col("n_groups").cast("long").alias("n_clusters"),
            (F.col("sz") * F.col("n_groups")).cast("long").alias("n_docs"),
            ((F.col("sz") - 1) * F.col("n_groups")).cast("long").alias(
                "removable_dups"
            ),
        )
        .orderBy("cluster_size")
    )


QUERIES["dup_cluster_size_histogram"] = dup_cluster_size_histogram
ORACLE["dup_cluster_size_histogram"] = f"""
WITH fp AS (
  SELECT md5(COALESCE(array_to_string(list_sort(list_distinct({_TOKS})), ' '), '')) AS fp
  FROM documents),
sizes AS (SELECT fp, COUNT(*) AS sz FROM fp GROUP BY fp)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(sz * COUNT(*) AS BIGINT) AS n_docs,
       CAST((sz - 1) * COUNT(*) AS BIGINT) AS removable_dups
FROM sizes GROUP BY sz ORDER BY cluster_size
"""


def pca_power_iteration(spark: SparkSession, sf_dir: str, iters: int = 2) -> DataFrame:
    """Top principal direction of the (uncentered) embedding Gram
    matrix by power iteration — the spectral sibling of
    `kmeans_lloyd_iterations` in the iterative-algorithm family, and
    the 1-component core of PCA whitening / spectral embedding
    compression.

    Each iteration is two matvecs that never materialize the 64x64
    Gram: (1) per row, s_r = <x_r, v> as an IN-ORDER zip_with fold
    (matches the oracle's explicit left-to-right sum chain); (2)
    y_j = sum_r x_rj * s_r as one posexplode hash-agg. Cross-engine
    determinism: per-position sums are rounded to 3 decimals (absolute
    error from double re-ordering is ~1e-9 of the magnitude, far
    below the quantum) BEFORE the norm, the norm folds the ROUNDED
    components in position order, and the normalized vector is rounded
    to 6 decimals — the same round-between-iterations contract kmeans
    uses. v carries between iterations as a broadcast 1-row frame
    (fully declarative, no driver state); init is the uniform unit
    vector. Output: (pos, component) with the sign fixed so the first
    component is non-negative.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    v = spark.range(1).select(
        F.expr(f"array_repeat(cast(0.125 as double), {DIM})").alias("v")
    )
    for _ in range(iters):
        scored = emb.crossJoin(F.broadcast(v)).select(
            "x",
            F.aggregate(
                F.zip_with("x", "v", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, e: acc + e,
            ).alias("s"),
        )
        y = (
            scored.select(F.posexplode("x").alias("pos", "xj"), "s")
            .groupBy("pos")
            .agg(
                (F.round(F.sum(F.col("xj") * F.col("s")), 3) + F.lit(0.0)).alias(
                    "yj"
                )
            )
        )
        v = y.groupBy().agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "yj"))),
                lambda st: st.yj,
            ).alias("y")
        ).select(
            F.expr(
                "transform(y, e -> round(e / sqrt(aggregate("
                "transform(y, q -> q * q), cast(0.0 as double),"
                " (acc, q) -> acc + q)), 6) + cast(0.0 as double))"
            ).alias("v")
        )
    return (
        v.select(
            F.posexplode(
                # get() (null on out-of-bounds), not v[0]: on a zero-row
                # corpus the collected eigenvector is the empty array and
                # ANSI v[0] throws INVALID_ARRAY_INDEX; NULL < 0 routes the
                # if() to the unchanged else branch (empty -> zero rows).
                F.expr("if(get(v, 0) < 0, transform(v, e -> -e + 0.0d), v)")
            ).alias("pos", "component")
        )
        .select(F.col("pos").cast("long").alias("pos"), "component")
        # no total sort (r11): order-insensitive compare; the range
        # sampler re-ran this plan's tail once more just for bounds
    )


def _sql_pca_oracle(iters: int = 2) -> str:
    vcols = lambda k: ", ".join(
        f"MAX(CASE WHEN pos = {j} THEN val END) AS c{j}" for j in range(DIM)
    )
    ctes = [
        "x AS MATERIALIZED (SELECT vec_id, embedding AS e FROM embeddings)",
        "v0 AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT {j} AS pos, 0.125 AS val" for j in range(DIM)
        )
        + ")",
    ]
    for it in range(1, iters + 1):
        prev = f"v{it - 1}"
        ctes.append(f"{prev}_row AS MATERIALIZED (SELECT {vcols(it)} FROM {prev})")
        dot = " + ".join(
            f"CAST(e[{j + 1}] AS DOUBLE) * c{j}" for j in range(DIM)
        )
        ctes.append(
            f"s{it} AS MATERIALIZED (SELECT vec_id, e, {dot} AS s FROM x, {prev}_row)"
        )
        ctes.append(
            f"y{it} AS MATERIALIZED ("
            f"SELECT u.j AS pos, round(SUM(CAST(e[CAST(u.j AS INT) + 1] AS DOUBLE) * s), 3) + 0.0 AS yj "
            f"FROM s{it}, UNNEST(range(CAST({DIM} AS BIGINT))) AS u(j) GROUP BY u.j)"
        )
        normchain = " + ".join(
            f"(SELECT yj FROM y{it} WHERE pos = {j}) * (SELECT yj FROM y{it} WHERE pos = {j})"
            for j in range(DIM)
        )
        ctes.append(
            f"v{it} AS MATERIALIZED (SELECT pos, round(yj / sqrt({normchain}), 6) + 0.0 AS val FROM y{it})"
        )
    last = f"v{iters}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
, sign AS (SELECT CASE WHEN (SELECT val FROM {last} WHERE pos = 0) < 0
                  THEN -1.0 ELSE 1.0 END AS sg)
SELECT CAST(pos AS BIGINT) AS pos, val * sg + 0.0 AS component
FROM {last}, sign ORDER BY pos"""
    )


QUERIES["pca_power_iteration"] = pca_power_iteration
ORACLE["pca_power_iteration"] = _sql_pca_oracle(2)


def cross_source_dup_matrix(spark: SparkSession, sf_dir: str, k: int = 15) -> DataFrame:
    """Provenance view of duplication: which SOURCE PAIRS share
    identical content (token-set fingerprints appearing in both),
    ranked by shared-fingerprint count — mirrors/syndication show up as
    hot pairs, steering which origins to crawl or drop.

    Distinct (fingerprint, source) collapse first, then a
    fingerprint-keyed self-join whose fan-out is bounded by each
    fingerprint's SOURCE count (<= source domain, never doc count),
    one pair hash-agg, top-k.
    """
    from streaming_data_pipeline_spark.functions.text import (
        token_set_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents")
    fs = (
        docs.select(
            token_set_fingerprint(F.col("text")).alias("fp"), "source"
        )
        .distinct()
    )
    pairs = (
        fs.alias("a")
        .join(fs.alias("b"), "fp")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("shared_fps"))
    )
    from pyspark.sql import Window

    top = pairs.orderBy(F.desc("shared_fps"), "source_a", "source_b").limit(k)
    w = Window.orderBy(F.desc("shared_fps"), "source_a", "source_b")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            "rank", "source_a", "source_b",
            F.col("shared_fps").cast("long").alias("shared_fps"),
        )
        .orderBy("rank")
    )


QUERIES["cross_source_dup_matrix"] = cross_source_dup_matrix
ORACLE["cross_source_dup_matrix"] = f"""
WITH fs AS (
  SELECT DISTINCT
         md5(COALESCE(array_to_string(list_sort(list_distinct({_TOKS})), ' '), '')) AS fp,
         source
  FROM documents),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS shared_fps
  FROM fs a JOIN fs b ON a.fp = b.fp AND a.source < b.source
  GROUP BY 1, 2),
top AS (SELECT * FROM pairs
        ORDER BY shared_fps DESC, source_a, source_b LIMIT 15)
SELECT CAST(row_number() OVER (ORDER BY shared_fps DESC, source_a, source_b)
            AS BIGINT) AS rank,
       source_a, source_b, CAST(shared_fps AS BIGINT) AS shared_fps
FROM top ORDER BY rank
"""
