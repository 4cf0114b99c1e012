"""Training-data preparation operators: split assignment, random
projection, chunk-level duplication stats, vocabulary richness.

These extend the LLM-curation surface (plans/llm_queries.py,
plans/curation_queries.py) with the remaining ops a 100 TB pretraining
pipeline runs between raw scrape and tokenizer:

- ``train_val_test_split`` — deterministic hash-bucket split (80/10/10)
  keyed on md5 of the document id. Bucketing by content-independent key
  hash is the standard reproducible split at corpus scale: no shuffle of
  the data itself, the split column is a pure projection and the
  per-split stats a single hash aggregate.
- ``embedding_random_projection`` — sign (Achlioptas) random projection
  of the embedding column onto 8 dims as a distributed matrix multiply:
  posexplode to (vec_id, pos, x), broadcast the 8 output dims, derive
  the +-1 weight from md5(pos:k) parity, one hash aggregate sums per
  (vec_id, k). Linear in rows x dim x k, no driver-side matrices; the
  same shape JL-sketches 100 TB of vectors for cheap coarse clustering.
- ``chunk_dup_stats`` — CCNet-style chunk-level duplication audit:
  non-overlapping 8-token chunks are md5'd, globally counted, and each
  document reports how many of its chunks also occur elsewhere in the
  corpus. Two hash aggregates + one equi-join on the chunk hash — the
  paragraph-dedup precursor that decides whether near-dup removal is
  worth running on a shard.
- ``vocab_richness_by_source`` — per-source type/token counts, hapax
  count, type-token ratio: the cheap lexical-diversity screen for
  template-generated or boilerplate-heavy sources. Pure integer
  arithmetic over two stacked hash aggregates, fully deterministic.

Reference anchor: the reference's enrichment+filter stage
(Streamingdag.py:206-231) computes per-record quality signals; these are
the corpus-level analogs the north star (SURVEY.md SS2.12) requires.
Float protocol: sums that feed cross-engine comparison run in
DECIMAL(18,9) (exact, order-independent); ratios of exact integers are
divided as doubles and rounded with the `+ 0.0` signed-zero normalizer
(same protocol as plans/tpch_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.functions.text import tokens
from streaming_data_pipeline_spark.sources.batch import load_table


def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split of ``documents`` by id-hash bucket.

    bucket = int(md5('split:' || doc_id)[:4], 16) % 100; < 80 -> train,
    < 90 -> val, else test. The assignment is a stateless projection
    (reproducible across runs, clusters, and engines); the output is the
    per-split audit aggregate a pipeline logs before writing manifests.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            (F.round(F.sum("n_chars") / F.count("*"), 4) + F.lit(0.0)).alias(
                "avg_chars"
            ),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split")
    )


def _rp_weight_matrix(dim: int, k: int = 8) -> list[list[int]]:
    """+-1 weight w[k][pos] = +1 iff the first md5 byte of 'rp:pos:k' is
    even — the same hash family the DuckDB oracle evaluates in SQL, here
    materialized once on the driver (k x dim ints, a few hundred bytes)
    and shipped as a plan literal."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"rp:{pos}:{kk}".encode()).hexdigest()[:2], 16) % 2
            == 0
            else -1
            for pos in range(dim)
        ]
        for kk in range(k)
    ]


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign random projection of ``embeddings.embedding`` onto 8 dims.

    The +-1 weight matrix (hash-derived, see _rp_weight_matrix) is tiny
    — k x dim ints — so it rides along as a literal in every task
    instead of being joined in: each vector computes all 8 dot products
    array-side with zip_with + a DECIMAL(38,9) aggregate fold (exact,
    order-independent), then one posexplode emits (vec_id, k) rows.
    Zero shuffles, zero sorts — the earlier shape (posexplode to
    rows x dim, broadcast-join 8 output dims, hash-agg rows x dim x 8
    intermediates, total orderBy) paid a full shuffle of a 100x-larger
    intermediate plus a 4M-row sort for the same arithmetic (measured
    3.6 s -> ~1.2 s at sf0.1; the compare is order-insensitive, so the
    sort bought nothing).
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()  # canonical NULL-vector rule (_emb)
    )
    # Plan-build-time dimension probe. Contract: the embedding column is
    # uniform-dimension (fixture schema guarantee) — a ragged shorter
    # row would NULL-pad zip_with and emit NULL projections rather than
    # erroring. On an EMPTY table the projection of no vectors is no
    # rows whatever the weights, so any placeholder dimension yields
    # the correct (empty, schema-stable) result — an empty backfill
    # window must flow through a scheduled pipeline, not crash it.
    first = emb.select(F.size("embedding").alias("d")).first()
    dim = 1 if first is None else first["d"]
    w_lit = F.array(
        *[
            F.array(*[F.lit(float(v)) for v in row])
            for row in _rp_weight_matrix(dim, 8)
        ]
    )
    e = F.col("embedding").cast("array<double>")
    projs = F.transform(
        w_lit,
        # accumulator stays at decimal(28,9): (28,9)+(18,9) -> (29,9)
        # fits under Spark's 38-precision cap, so every fold step is
        # exact. A (38,9) accumulator would make each addition overflow
        # the cap and silently drop the scale to 8 — a 1-ulp-per-element
        # error the oracle catches.
        lambda row: F.round(
            F.aggregate(
                F.zip_with(e, row, lambda x, w: (x * w).cast("decimal(18,9)")),
                F.lit(0).cast("decimal(28,9)"),
                lambda acc, v: (acc + v).cast("decimal(28,9)"),
            ).cast("double"),
            6,
        )
        + F.lit(0.0),
    )
    return emb.select("vec_id", F.posexplode(projs).alias("k", "proj")).select(
        "vec_id", F.col("k").cast("int").alias("k"), "proj"
    )


def chunk_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document chunk-duplication audit over 8-token chunks.

    Chunks are non-overlapping 8-token windows (last chunk may be
    short), hashed with md5. A global count per chunk hash feeds back
    via equi-join; each doc reports total chunks and how many have
    another occurrence anywhere in the corpus. At 100 TB this is two
    shuffles on a well-distributed hash key — the cheap screen run
    before committing to full near-dup removal on a shard.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    n_chunks = F.ceil(F.size("toks") / F.lit(8)).cast("int")
    chunks = F.when(F.size("toks") == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda c: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), c * 8 + 1, 8))),
        )
    )
    exploded = docs.select("doc_id", F.explode(chunks).alias("chunk"))
    counts = exploded.groupBy("chunk").agg(F.count("*").alias("n_occ"))
    return (
        exploded.join(counts, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0))
            .cast("long")
            .alias("dup_chunks"),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("dup_chunks") / F.col("n_chunks"), 4) + F.lit(0.0),
        )
        # no total sort (r11): driver compare is order-insensitive; the
        # range sampler re-ran this plan's tail once more just for bounds
    )


def vocab_richness_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type/token counts, hapax legomena, and TTR per source.

    Two stacked hash aggregates: (source, token) -> count, then source
    -> {sum(count), count(*), count(count==1)}. All integer arithmetic
    until the final ratio division — deterministic by construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("token")
    )
    per_token = tok.groupBy("source", "token").agg(F.count("*").alias("n"))
    return (
        per_token.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax"),
        )
        .withColumn(
            "ttr", F.round(F.col("n_types") / F.col("n_tokens"), 6) + F.lit(0.0)
        )
        .withColumn(
            "hapax_ratio",
            F.round(F.col("hapax") / F.col("n_types"), 6) + F.lit(0.0),
        )
        .orderBy("source")
    )


def unigram_surprisal_by_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram surprisal -ln p(token) under the
    corpus's own unigram distribution — the self-contained core of a
    perplexity quality filter (docs whose tokens are improbable under
    the corpus LM are boilerplate/garbled candidates; a real pipeline
    swaps in external LM scores, same plumbing).

    Shape: one token hash-agg builds the LM (t -> count), a single-row
    total broadcast turns counts into probabilities, one equi-join
    scores tokens, one hash-agg folds per doc. Everything stays
    JVM-side; the per-token ln is a double but feeds the sum as
    DECIMAL(18,9), so cross-engine 1-ulp libm differences (~1e-15)
    vanish at the cast and the sum is order-independent.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    probs = tok.groupBy("t").agg(F.count("*").alias("c"))
    total = probs.agg(F.sum("c").cast("double").alias("tot"))
    scored = probs.crossJoin(F.broadcast(total)).select(
        "t",
        F.log(F.col("c") / F.col("tot")).cast("decimal(18,9)").alias("lpd"),
    )
    return (
        tok.join(scored, "t")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.round(
                    -F.sum("lpd").cast("double") / F.count("*"), 6
                )
                + F.lit(0.0)
            ).alias("surprisal"),
        )
        .orderBy("doc_id")
    )


def udtf_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) splitting documents into fixed-size
    token chunks via a LATERAL join — the SURVEY SS2.9 UDTF surface.

    This is the sanctioned row-at-a-time escape hatch, NOT a hot-path
    pattern: the same chunking is expressible JVM-side (see
    ``chunk_dup_stats``), and a production run at 100 TB would use that
    form. The UDTF exists to prove the engine exposes the full Spark 4
    extension surface (scalar pandas UDF -> mapInPandas ->
    applyInPandasWithState -> UDTF) with an oracle-checked example; the
    per-doc fan-out shape (explode-like, no state) is the one place
    row-at-a-time cost stays proportional to output size.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, chunk string, n_tokens int")
    class ChunkSplit:
        def eval(self, text: str, size: int):
            toks = [t for t in (text or "").split(" ") if t]
            for i in range(0, len(toks), size):
                part = toks[i : i + size]
                yield (i // size, " ".join(part), len(part))

    spark.udtf.register("chunk_split", ChunkSplit)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "docs_for_udtf"
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_tokens, md5(c.chunk) AS chunk_fp
        FROM docs_for_udtf d, LATERAL chunk_split(d.text, 20) c
        ORDER BY d.doc_id, c.chunk_id
        """
    )


def shard_manifest_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 16-way output sharding with a verifiable manifest.

    A training-data writer's last step assigns every document to a shard
    by content-independent key hash (shard = md5('shard:'||doc_id) % 16
    — reproducible across engines, runs, and cluster sizes) and logs a
    per-shard manifest: document count, total characters, and an
    ORDER-INDEPENDENT membership checksum (sum of a second keyed hash of
    each doc id). A consumer re-derives the checksum after download to
    prove no document was lost, duplicated, or misrouted — without
    sorting or collecting ids anywhere. The whole thing is one stateless
    projection + one 16-group hash aggregate: at 100 TB the shard
    assignment rides along with the write (partitionBy("shard")) and the
    manifest is a free byproduct of the same single pass.
    """
    docs = load_table(spark, sf_dir, "documents")

    def _md5long(col, prefix):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, 12),
            16,
            10,
        ).cast("long")

    return (
        docs.select(
            (_md5long(F.col("doc_id"), "shard:") % 16).alias("shard"),
            "doc_id",
            "n_chars",
            _md5long(F.col("doc_id"), "ck:").alias("ck"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("ck").alias("id_checksum"),
        )
        .orderBy("shard")
    )


def heavy_hitter_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy-hitter bigrams via two-pass exact Misra-Gries
    (operators/sketches.py): a bounded-memory candidate pass (O(1/phi)
    counters per task, never a full vocabulary map) followed by an
    exact recount of the guaranteed-superset candidates — so the output
    is EXACTLY the bigrams with frequency >= phi*N, and the oracle is a
    plain GROUP BY + HAVING. The screen that feeds stopword/boilerplate
    lists at corpus scale, where the distinct n-gram universe cannot be
    shuffled whole."""
    from streaming_data_pipeline_spark.functions.text import all_word_ngrams
    from streaming_data_pipeline_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    # all_word_ngrams let-binds the token array (evaluated once per row);
    # an inline transform over element_at(tokens(text), i) re-runs the
    # tokenizer per gram position — measured 5x slower here.
    items = docs.select(
        F.explode(all_word_ngrams(F.col("text"), 2)).alias("bigram")
    )
    return (
        heavy_hitters(items, "bigram", phi=0.0012)
        .select(F.col("item").alias("bigram"), "n", "freq")
        # no total sort (r11): driver compare is order-insensitive; the
        # range sampler re-ran this plan's tail once more just for bounds
    )


def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (CDC) dedup audit: chunk boundaries
    fall AFTER any token whose keyed hash is 0 mod 8 (expected chunk
    ~8 tokens), so boundaries depend only on LOCAL content — an
    insertion near a document's head shifts fixed-size chunk frames for
    the whole document (defeating ``chunk_dup_stats``-style dedup) but
    moves CDC boundaries only within the edited neighborhood, letting
    every downstream chunk still hash-match its twin in the unedited
    copy. The rsync/LBFS trick, applied to corpus dedup.

    Plan shape: posexplode -> one per-doc window (running boundary
    count) -> chunk reassembly via sort_array(collect_list(struct)) ->
    two hash-aggs + one equi-join on the chunk hash. Per doc:
    (n_chunks, chunks also present in ANY other document).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "t")
    )
    bflag = (
        F.conv(F.substring(F.md5("t"), 1, 7), 16, 10).cast("long") % 8 == 0
    ).cast("int")
    w = Window.partitionBy("doc_id").orderBy("pos")
    chunked = tok.withColumn(
        "chunk_id",
        F.coalesce(
            F.sum(bflag).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    chunks = chunked.groupBy("doc_id", "chunk_id").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "t"))),
                    lambda s: s.t,
                ),
            )
        ).alias("ch")
    )
    counts = chunks.groupBy("ch").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    return (
        chunks.join(counts, "ch")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("shared_chunks"),
        )
        # no total sort (r11): driver compare is order-insensitive; the
        # range sampler re-ran this plan's tail once more just for bounds
    )


QUERIES = {
    "train_val_test_split": train_val_test_split,
    "shard_manifest_checksums": shard_manifest_checksums,
    "heavy_hitter_bigrams": heavy_hitter_bigrams,
    "cdc_chunk_dedup": cdc_chunk_dedup,
    "embedding_random_projection": embedding_random_projection,
    "chunk_dup_stats": chunk_dup_stats,
    "vocab_richness_by_source": vocab_richness_by_source,
    "unigram_surprisal_by_doc": unigram_surprisal_by_doc,
    "udtf_chunk_split": udtf_chunk_split,
}

# single-copy DuckDB tokenizer (plans/oracle_text.py)
from streaming_data_pipeline_spark.plans.oracle_text import DUCK_TOKS as _TOKS

ORACLE = {
    "cdc_chunk_dedup": f"""
    WITH toksets AS (
      SELECT doc_id, {_TOKS} AS ts
      FROM documents
    ),
    tok AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS pos, ts[CAST(u.i AS INT) + 1] AS t
      FROM toksets, UNNEST(range(len(ts))) AS u(i)
    ),
    flagged AS (
      SELECT doc_id, pos, t,
             CASE WHEN CAST('0x' || substring(md5(t), 1, 7) AS BIGINT) % 8 = 0
                  THEN 1 ELSE 0 END AS bflag
      FROM tok
    ),
    chunked AS (
      SELECT doc_id, pos, t,
             COALESCE(SUM(bflag) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
      FROM flagged
    ),
    chunks AS (
      SELECT doc_id, chunk_id, md5(string_agg(t, ' ' ORDER BY pos)) AS ch
      FROM chunked GROUP BY doc_id, chunk_id
    ),
    counts AS (SELECT ch, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY ch)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS shared_chunks
    FROM chunks JOIN counts USING (ch)
    GROUP BY doc_id ORDER BY doc_id
    """,
    "heavy_hitter_bigrams": f"""
    WITH toksets AS (
      SELECT {_TOKS} AS ts
      FROM documents
    ),
    bg AS (
      SELECT ts[CAST(u.i AS INT) + 1] || ' ' || ts[CAST(u.i AS INT) + 2] AS bigram
      FROM toksets, UNNEST(range(len(ts) - 1)) AS u(i)
    ),
    c AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM bg GROUP BY bigram),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT bigram, n, round(CAST(n AS DOUBLE) / total, 6) + 0.0 AS freq
    FROM c, t
    WHERE n >= 0.0012 * total
    ORDER BY bigram
    """,
    "shard_manifest_checksums": """
    WITH tagged AS (
      SELECT doc_id, n_chars,
             CAST('0x' || substring(
               md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 16
               AS shard,
             CAST('0x' || substring(
               md5('ck:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS ck
      FROM documents
    )
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(ck) AS BIGINT) AS id_checksum
    FROM tagged GROUP BY shard ORDER BY shard
    """,
    "train_val_test_split": """
    WITH tagged AS (
      SELECT *,
             CAST('0x' || substring(
               md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100
               AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(SUM(n_chars) / COUNT(*), 4) + 0.0 AS avg_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM tagged GROUP BY 1 ORDER BY 1
    """,
    "embedding_random_projection": """
    WITH parts AS (
      SELECT vec_id, CAST(u.i AS INT) AS pos,
             CAST(embedding[CAST(u.i AS INT) + 1] AS DOUBLE) AS x
      FROM embeddings, UNNEST(range(len(embedding))) AS u(i)
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(k.i AS INT) AS k,
           round(CAST(SUM(
             CAST(x AS DECIMAL(18,9)) *
             (CASE WHEN CAST('0x' || substring(
                md5('rp:' || CAST(pos AS VARCHAR) || ':' || CAST(k.i AS VARCHAR)),
                1, 2) AS INT) % 2 = 0 THEN 1 ELSE -1 END)
           ) AS DOUBLE), 6) + 0.0 AS proj
    FROM parts, UNNEST(range(8)) AS k(i)
    GROUP BY vec_id, k.i
    ORDER BY vec_id, k
    """,
    "chunk_dup_stats": f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    chunked AS (
      SELECT doc_id,
             md5(array_to_string(
               list_slice(toks, CAST(c.i AS INT) * 8 + 1,
                          CAST(c.i AS INT) * 8 + 8), ' ')) AS chunk
      FROM t, UNNEST(range(CAST(ceil(len(toks) / 8.0) AS BIGINT))) AS c(i)
    ),
    cnt AS (SELECT chunk, COUNT(*) AS n_occ FROM chunked GROUP BY chunk)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_chunks,
           round(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) / COUNT(*), 4)
             + 0.0 AS dup_ratio
    FROM chunked JOIN cnt USING (chunk)
    GROUP BY doc_id ORDER BY doc_id
    """,
    "vocab_richness_by_source": f"""
    WITH tok AS (
      SELECT source, t.token FROM (
        SELECT source, UNNEST({_TOKS}) AS token FROM documents
      ) AS t(source, token)
    ),
    per_token AS (
      SELECT source, token, COUNT(*) AS n FROM tok GROUP BY source, token
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           round(COUNT(*) / SUM(n), 6) + 0.0 AS ttr,
           round(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) / COUNT(*), 6) + 0.0
             AS hapax_ratio
    FROM per_token GROUP BY source ORDER BY source
    """,
    "unigram_surprisal_by_doc": f"""
    WITH tok AS (
      SELECT doc_id, t.token FROM (
        SELECT doc_id, UNNEST({_TOKS}) AS token FROM documents
      ) AS t(doc_id, token)
    ),
    probs AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS tot FROM probs),
    scored AS (
      SELECT token, CAST(ln(c / tot) AS DECIMAL(18,9)) AS lpd
      FROM probs, tot
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(-CAST(SUM(lpd) AS DOUBLE) / COUNT(*), 6) + 0.0 AS surprisal
    FROM tok JOIN scored USING (token)
    GROUP BY doc_id ORDER BY doc_id
    """,
    "udtf_chunk_split": f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    c AS (
      SELECT doc_id, CAST(u.i AS INT) AS chunk_id,
             list_slice(toks, CAST(u.i AS INT) * 20 + 1,
                        CAST(u.i AS INT) * 20 + 20) AS part
      FROM t, UNNEST(range(CAST(ceil(len(toks) / 20.0) AS BIGINT))) AS u(i)
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, chunk_id,
           CAST(len(part) AS INT) AS n_tokens,
           md5(array_to_string(part, ' ')) AS chunk_fp
    FROM c ORDER BY doc_id, chunk_id
    """,
}


def epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-EPOCH shuffle + shard assignment — the data-
    serving layout a training run reads: every epoch reorders the
    corpus by a salted hash (md5('ep<e>:' || doc_id) — reproducible
    across reruns and engines, no RNG state) and deals docs into
    shards by hash range, so (a) each epoch sees a different order,
    (b) any worker can locate its shard without coordination, and
    (c) the shuffle is a pure narrow projection — no actual shuffle of
    corpus bytes, just a computed (epoch, shard) key that the writer
    partitions by. Per (epoch, shard): doc count, token budget, doc_id
    checksum, and the serving head (first doc in shard order) — what a
    loader audits before a run. 3 epochs x 8 shards."""
    from pyspark.sql import Window

    from streaming_data_pipeline_spark.functions.text import token_count

    epochs, shards = 3, 8
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    dealt = docs.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(e).alias("epoch"),
                        F.md5(
                            F.concat(F.lit(f"ep{e}:"), F.col("doc_id").cast("string"))
                        ).alias("order_key"),
                    )
                    for e in range(epochs)
                ]
            )
        ).alias("a"),
    ).select(
        "doc_id",
        "n_tokens",
        "a.epoch",
        "a.order_key",
        (
            F.conv(F.substring("a.order_key", 1, 7), 16, 10).cast("long") % shards
        ).alias("shard"),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("order_key", "doc_id")
    return (
        dealt.withColumn("pos", F.row_number().over(w))
        .groupBy("epoch", "shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("doc_id").cast("long").alias("doc_id_checksum"),
            F.max(F.when(F.col("pos") == 1, F.col("doc_id")))
            .cast("long")
            .alias("head_doc"),
        )
        .select(
            F.col("epoch").cast("long").alias("epoch"),
            F.col("shard").cast("long").alias("shard"),
            "n_docs",
            "total_tokens",
            "doc_id_checksum",
            "head_doc",
        )
        .orderBy("epoch", "shard")
    )


QUERIES["epoch_shuffle_shards"] = epoch_shuffle_shards
ORACLE["epoch_shuffle_shards"] = """
WITH dealt AS (
  SELECT d.doc_id,
         CAST(len(list_filter(string_split(d.text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens,
         e.e AS epoch,
         md5('ep' || CAST(e.e AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR))
           AS order_key
  FROM documents d, (SELECT unnest(range(3)) AS e) e),
keyed AS (
  SELECT *,
         CAST(CAST('0x' || substring(order_key, 1, 7) AS BIGINT) % 8
              AS BIGINT) AS shard
  FROM dealt),
pos AS (
  SELECT *,
         row_number() OVER (PARTITION BY epoch, shard
                            ORDER BY order_key, doc_id) AS p
  FROM keyed)
SELECT CAST(epoch AS BIGINT) AS epoch, shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS doc_id_checksum,
       CAST(MAX(CASE WHEN p = 1 THEN doc_id END) AS BIGINT) AS head_doc
FROM pos GROUP BY epoch, shard ORDER BY epoch, shard
"""


def curriculum_mix_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data-mix SCHEDULE — the per-epoch re-weighting a
    staged training run applies: docs are tiered by length band
    (short < 200 chars, mid 200-349, long >= 350 — length as the
    classic easy->hard curriculum proxy), and each epoch samples tiers
    at scheduled rates (epoch 0 uniform 100%; epoch 1 throttles short
    to 25%; epoch 2 serves long at 100% + mid 50%, short retired) via
    salted deterministic hash gates (md5('mix<e>:'||doc_id) first byte
    < rate, rates out of 256 — reproducible, composable with the epoch
    shuffle, no RNG state). Output per (epoch, tier): scheduled rate in
    basis points, docs/tokens admitted, docs available — the mix audit
    table a training launch reviews. Scale shape: one length pass,
    one narrow hash-gate filter per epoch arm — no shuffle beyond the
    final tiny aggregate."""
    from streaming_data_pipeline_spark.functions.text import token_count

    schedule = {  # (epoch, tier) -> admission rate out of 256
        (0, "long"): 256, (0, "mid"): 256, (0, "short"): 256,
        (1, "long"): 256, (1, "mid"): 256, (1, "short"): 64,
        (2, "long"): 256, (2, "mid"): 128, (2, "short"): 0,
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.when(F.length("text") >= 350, F.lit("long"))
        .when(F.length("text") >= 200, F.lit("mid"))
        .otherwise(F.lit("short"))
        .alias("tier"),
    )
    arms = docs.select(
        "doc_id",
        "n_tokens",
        "tier",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(e).alias("epoch"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"mix{e}:"),
                                            F.col("doc_id").cast("string"),
                                        )
                                    ),
                                    1,
                                    2,
                                ),
                                16,
                                10,
                            ).cast("long")
                        ).alias("gate"),
                    )
                    for e in range(3)
                ]
            )
        ).alias("a"),
    ).select("doc_id", "n_tokens", "tier", "a.epoch", "a.gate")
    rate = F.lit(None).cast("long")
    for (e, t), r in schedule.items():
        rate = F.when((F.col("epoch") == e) & (F.col("tier") == t), F.lit(r)).otherwise(rate)
    gated = arms.withColumn("rate", rate)
    return (
        gated.groupBy("epoch", "tier", "rate")
        .agg(
            F.count("*").cast("long").alias("n_available"),
            F.sum(F.when(F.col("gate") < F.col("rate"), 1).otherwise(0))
            .cast("long")
            .alias("n_admitted"),
            F.sum(
                F.when(F.col("gate") < F.col("rate"), F.col("n_tokens")).otherwise(0)
            )
            .cast("long")
            .alias("tokens_admitted"),
        )
        .select(
            F.col("epoch").cast("long").alias("epoch"),
            "tier",
            (F.col("rate") * 10000 / 256).cast("long").alias("rate_bp"),
            "n_available",
            "n_admitted",
            "tokens_admitted",
        )
        .orderBy("epoch", "tier")
    )


QUERIES["curriculum_mix_schedule"] = curriculum_mix_schedule
ORACLE["curriculum_mix_schedule"] = f"""
WITH tiers AS (
  SELECT doc_id,
         CAST(len({_TOKS})
              AS BIGINT) AS n_tokens,
         CASE WHEN length(text) >= 350 THEN 'long'
              WHEN length(text) >= 200 THEN 'mid'
              ELSE 'short' END AS tier
  FROM documents),
sched(epoch, tier, rate) AS (VALUES
  (0, 'long', 256), (0, 'mid', 256), (0, 'short', 256),
  (1, 'long', 256), (1, 'mid', 256), (1, 'short', 64),
  (2, 'long', 256), (2, 'mid', 128), (2, 'short', 0)),
arms AS (
  SELECT t.doc_id, t.n_tokens, t.tier, s.epoch, s.rate,
         CAST('0x' || substring(md5('mix' || CAST(s.epoch AS VARCHAR) || ':'
                                    || CAST(t.doc_id AS VARCHAR)), 1, 2)
              AS BIGINT) AS gate
  FROM tiers t JOIN sched s ON s.tier = t.tier)
SELECT CAST(epoch AS BIGINT) AS epoch, tier,
       CAST(rate * 10000 / 256 AS BIGINT) AS rate_bp,
       CAST(COUNT(*) AS BIGINT) AS n_available,
       CAST(SUM(CASE WHEN gate < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       CAST(SUM(CASE WHEN gate < rate THEN n_tokens ELSE 0 END) AS BIGINT)
         AS tokens_admitted
FROM arms GROUP BY epoch, tier, rate ORDER BY epoch, tier
"""


def bigram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram surprisal -ln p(w2|w1) under the
    corpus's own bigram LM (MLE, no smoothing needed when scoring the
    training corpus on itself) — the conditional upgrade of
    ``unigram_surprisal_by_doc``; low-probability transition chains
    flag garbled or shuffled text that unigram stats miss.

    Shape: one explode builds the (doc, bigram) stream from the
    let-bound token array (scan-side); two hash-aggs build the LM
    (bigram counts + left-context counts, both map-side combined); one
    equi-join scores, one hash-agg folds per doc. Same cross-engine
    float contract as the unigram query: per-bigram ln is cast to
    DECIMAL(18,9) before the order-insensitive sum, killing 1-ulp libm
    drift. Docs with fewer than two tokens have no bigrams and are
    excluded by construction.
    """
    from streaming_data_pipeline_spark.functions.text import all_word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    big = docs.select(
        "doc_id", F.explode(all_word_ngrams(F.col("text"), 2)).alias("bg")
    )
    c12 = big.groupBy("bg").agg(F.count("*").alias("c12"))
    c1 = (
        big.withColumn("w1", F.substring_index("bg", " ", 1))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    scored = (
        c12.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(c1, "w1")
        .select(
            "bg",
            F.log(F.col("c12") / F.col("c1")).cast("decimal(18,9)").alias("lp"),
        )
    )
    return (
        big.join(scored, "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            (
                F.round(-F.sum("lp").cast("double") / F.count("*"), 6)
                + F.lit(0.0)
            ).alias("surprisal"),
        )
        # no total sort (r11): driver compare is order-insensitive; the
        # range sampler re-ran this plan's tail once more just for bounds
    )


QUERIES["bigram_lm_surprisal"] = bigram_lm_surprisal
ORACLE["bigram_lm_surprisal"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
big AS (
  SELECT doc_id, toks[CAST(i.i AS INT)] || ' ' ||
         toks[CAST(i.i AS INT) + 1] AS bg
  FROM t, UNNEST(range(1, len(toks))) AS i(i)
  WHERE len(toks) >= 2),
c12 AS (SELECT bg, COUNT(*) AS c12 FROM big GROUP BY bg),
c1 AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1
       FROM big GROUP BY 1),
scored AS (
  SELECT bg, CAST(ln(c12 / CAST(c1 AS DOUBLE)) AS DECIMAL(18,9)) AS lp
  FROM c12 JOIN c1 ON split_part(c12.bg, ' ', 1) = c1.w1)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       round(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) + 0.0 AS surprisal
FROM big JOIN scored USING (bg)
GROUP BY doc_id ORDER BY doc_id
"""


def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the best documents under a global token budget (60% of
    corpus tokens): rank docs by an integer quality score (type/token
    ratio in ppm), take whole quality levels from the top, and fill the
    boundary level doc-by-doc (doc_id order, take-while-fits). The
    "pick the best data you can afford" step every budgeted training
    run needs.

    Scalable two-phase selection — no global sort of the corpus:
    phase 1 aggregates tokens per QUALITY LEVEL (the window runs over
    the distinct-ppm frame, <= 1e6 rows by construction, exactly the
    equi-depth-histogram trick); phase 2 joins the level verdicts back
    (full / partial / none) and orders only WITHIN the single boundary
    level. Budget arithmetic is integer (tot*3 div 5); output is the
    per-source selection tally.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("t")
    )
    # NOTE(r11 optimization round): caching per_doc (it fans out to four
    # branches) was tried and REVERTED — the four re-derived branches
    # are cheap relative to the cache materialization barrier (measured
    # 1.52 s -> 2.43 s at sf0.1); exchange reuse already shares the
    # token-explode shuffle between them.
    per_doc = (
        tok.groupBy("doc_id", "source", "t")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id", "source")
        .agg(F.sum("c").alias("w"), F.count("*").alias("types"))
        .filter(F.col("w") > 0)
        .select(
            "doc_id",
            "source",
            "w",
            F.expr("types * 1000000 div w").alias("q"),
        )
    )
    levels = per_doc.groupBy("q").agg(F.sum("w").alias("lw"))
    wlev = Window.orderBy(F.desc("q")).rowsBetween(Window.unboundedPreceding, 0)
    lev = levels.withColumn("cum", F.sum("lw").over(wlev))
    budget = per_doc.agg(F.expr("sum(w) * 3 div 5").alias("b"))
    marked = lev.crossJoin(F.broadcast(budget)).select(
        "q",
        "lw",
        "cum",
        F.when(F.col("cum") <= F.col("b"), F.lit("full"))
        .when(F.col("cum") - F.col("lw") < F.col("b"), F.lit("partial"))
        .otherwise(F.lit("none"))
        .alias("status"),
        (F.col("b") - (F.col("cum") - F.col("lw"))).alias("remaining"),
    )
    sel_full = per_doc.join(
        marked.filter(F.col("status") == "full").select("q"), "q"
    ).select("source", "w")
    wb = Window.partitionBy("q").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sel_part = (
        per_doc.join(
            marked.filter(F.col("status") == "partial").select("q", "remaining"),
            "q",
        )
        .withColumn("cw", F.sum("w").over(wb))
        .filter(F.col("cw") <= F.col("remaining"))
        .select("source", "w")
    )
    return (
        sel_full.unionByName(sel_part)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_selected"),
            F.sum("w").cast("long").alias("tokens_selected"),
        )
        .orderBy("source")
    )


QUERIES["token_budget_selection"] = token_budget_selection
ORACLE["token_budget_selection"] = f"""
WITH tok AS (
  SELECT doc_id, source, x.t
  FROM documents, LATERAL unnest({_TOKS}) x(t)),
per_doc AS (
  SELECT doc_id, source, SUM(c) AS w,
         COUNT(*) * 1000000 // SUM(c) AS q
  FROM (SELECT doc_id, source, t, COUNT(*) AS c FROM tok GROUP BY 1,2,3)
  GROUP BY doc_id, source HAVING SUM(c) > 0),
levels AS (SELECT q, SUM(w) AS lw FROM per_doc GROUP BY q),
lev AS (
  SELECT q, lw, SUM(lw) OVER (ORDER BY q DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM levels),
budget AS (SELECT SUM(w) * 3 // 5 AS b FROM per_doc),
marked AS (
  SELECT q, lw, cum,
         CASE WHEN cum <= b THEN 'full'
              WHEN cum - lw < b THEN 'partial'
              ELSE 'none' END AS status,
         b - (cum - lw) AS remaining
  FROM lev, budget),
sel_full AS (
  SELECT p.source, p.w FROM per_doc p
  JOIN marked m ON p.q = m.q AND m.status = 'full'),
sel_part AS (
  SELECT source, w FROM (
    SELECT p.source, p.w, m.remaining,
           SUM(p.w) OVER (PARTITION BY p.q ORDER BY p.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
    FROM per_doc p JOIN marked m ON p.q = m.q AND m.status = 'partial')
  WHERE cw <= remaining),
sel AS (SELECT * FROM sel_full UNION ALL SELECT * FROM sel_part)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_selected,
       CAST(SUM(w) AS BIGINT) AS tokens_selected
FROM sel GROUP BY source ORDER BY source
"""


def grouped_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware 80/10/10 split: the hash bucket is computed on the
    SOURCE (the leakage unit), not the document, so near-identical
    documents from one origin can never land on both sides of a
    train/eval boundary — the fix for the evaluation-leakage failure
    mode that doc-level splitting (`train_val_test_split`) permits.

    Same stateless md5-bucket projection, keyed one level up; the
    audit emits per-split document/source/token tallies plus a
    leakage certificate: sources_in_multiple_splits MUST be 0 by
    construction, and the query proves it from the data rather than
    asserting it.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("gsplit:"), F.col("source"))), 1, 4),
            16,
            10,
        ).cast("long")
        % 100
    )
    tagged = docs.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
    )
    per_split = tagged.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    leak = (
        tagged.select("source", "split")
        .distinct()
        .groupBy("source")
        .agg(F.count("*").alias("n_splits"))
        .agg(
            F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
            .cast("long")
            .alias("sources_in_multiple_splits")
        )
    )
    return (
        per_split.crossJoin(F.broadcast(leak))
        .select(
            "split", "n_docs", "n_sources", "n_chars",
            "sources_in_multiple_splits",
        )
        .orderBy("split")
    )


QUERIES["grouped_leakage_free_split"] = grouped_leakage_free_split
ORACLE["grouped_leakage_free_split"] = """
WITH tagged AS (
  SELECT *,
         CASE WHEN CAST('0x' || substring(md5('gsplit:' || source), 1, 4)
                   AS BIGINT) % 100 < 80 THEN 'train'
              WHEN CAST('0x' || substring(md5('gsplit:' || source), 1, 4)
                   AS BIGINT) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents),
per_split AS (
  SELECT split,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM tagged GROUP BY split),
leak AS (
  SELECT CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS sources_in_multiple_splits
  FROM (SELECT source, COUNT(DISTINCT split) AS n_splits
        FROM tagged GROUP BY source))
SELECT split, n_docs, n_sources, n_chars, sources_in_multiple_splits
FROM per_split, leak ORDER BY split
"""
