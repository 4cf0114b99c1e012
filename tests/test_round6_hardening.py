"""Round-6 hardening (second pass): fixes from the self-review —
conflicting pushed equality predicates, simhash chunk-divisor guard,
NULL-skipping UDAF medians, crash-safe partition compaction, zero-norm
embedding exclusion under ANSI mode, and tombstone-ledger leniency."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

# ------------------------------------------------------- pushFilters --


def test_pushdown_conflicting_equalities_yield_second_back():
    """Two different event_type equalities: the reader scans on the
    FIRST and must hand the second back to Spark (it re-applies it
    post-scan -> correctly empty), instead of silently scanning on the
    last one while Spark trusts both as fully applied."""
    from pyspark.sql.datasource import EqualTo

    from streaming_data_pipeline_spark.sources.pysource import _SynthReader

    r = _SynthReader({"num_rows": "700", "num_partitions": "2"})
    leftover = list(
        r.pushFilters([EqualTo(("event_type",), "login"), EqualTo(("event_type",), "click")])
    )
    assert len(leftover) == 1 and leftover[0].value == "click"
    assert r.event_type == "login"
    # a DUPLICATE of the consumed predicate is absorbed, not yielded
    r2 = _SynthReader({"num_rows": "700", "num_partitions": "2"})
    leftover2 = list(
        r2.pushFilters([EqualTo(("event_type",), "login"), EqualTo(("event_type",), "login")])
    )
    assert leftover2 == [] and r2.event_type == "login"


# ---------------------------------------------------- simhash chunks --


def test_simhash_rejects_non_divisor_chunks(spark):
    """chunks=3 would leave the trailing bit out of both the candidate
    join and the Hamming verify (silent undercount) — must raise."""
    from streaming_data_pipeline_spark.operators.dedup import simhash_near_dup_pairs

    df = spark.createDataFrame([(1, "alpha beta"), (2, "alpha beta")], "doc_id long, text string")
    with pytest.raises(ValueError, match="does not divide"):
        simhash_near_dup_pairs(df, chunks=3, max_hamming=2)


# ------------------------------------------------------------- UDAFs --


def test_median_mad_udafs_skip_nulls(spark):
    """SQL aggregate semantics: NULLs are skipped, not propagated as
    NaN over the whole group; an all-NULL group returns NULL."""
    from streaming_data_pipeline_spark.functions.udafs import mad_udaf, median_udaf

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)],
        "k string, v double",
    )
    rows = {
        r["k"]: (r["med"], r["mad"])
        for r in df.groupBy("k")
        .agg(median_udaf("v").alias("med"), mad_udaf("v").alias("mad"))
        .collect()
    }
    assert rows["a"] == (2.0, 1.0)
    assert rows["b"] == (None, None)


# -------------------------------------------------------- compaction --


def _write_partition(spark, base: str, day: str, n_files: int) -> None:
    (
        spark.range(100)
        .withColumn("date", F.lit(day))
        .repartition(n_files)
        .write.mode("append")
        .parquet(os.path.join(base, f"date={day}"))
    )


def test_compaction_scratch_dirs_are_invisible_and_recovered(spark, tmp_path):
    """Crash-window recovery: a leftover old-copy dir must (a) never be
    discovered as a bogus partition by Spark or the next compaction
    (dot-prefix), (b) restore the partition if the crash happened
    mid-swap, (c) be dropped if the partition survived the swap."""
    from streaming_data_pipeline_spark.operators.maintenance import (
        compact_partitioned_sink,
    )

    base = str(tmp_path / "sink")
    _write_partition(spark, base, "2020-01-01", 6)

    # crash MID-SWAP: partition dir gone, data parked in the hidden old
    pdir = os.path.join(base, "date=2020-01-01")
    old = os.path.join(base, ".date=2020-01-01.compact_old")
    os.rename(pdir, old)
    # the dot-dir is invisible to Spark: the base now has NO readable
    # files at all (schema inference fails), not a bogus partition
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException, match="UNABLE_TO_INFER_SCHEMA"):
        spark.read.parquet(base).count()
    report = compact_partitioned_sink(spark, base, "date", target_bytes=1)
    assert os.path.isdir(pdir) and not os.path.exists(old)  # restored
    assert spark.read.parquet(base).count() == 100
    assert [r["partition"] for r in report] == ["date=2020-01-01"]

    # crash AFTER the swap: stale old copy alongside the live partition
    os.makedirs(old)
    with open(os.path.join(old, "junk.parquet"), "w") as f:
        f.write("not parquet")
    compact_partitioned_sink(spark, base, "date", target_bytes=1)
    assert not os.path.exists(old)  # swept, never read as a partition
    assert spark.read.parquet(base).count() == 100

    # a real compaction run (6 files -> 1) leaves no scratch dirs behind
    report = compact_partitioned_sink(spark, base, "date", target_bytes=1 << 40)
    assert report[0]["files_before"] == 6
    hidden = [d for d in os.listdir(base) if d.startswith(".date=")]
    assert hidden == []
    assert spark.read.parquet(base).count() == 100


# --------------------------------------------------------- zero norm --


def test_zero_norm_embeddings_excluded_not_fatal(spark):
    """Under Spark 4 ANSI mode a zero-norm vector used to make the
    cosine division throw DIVIDE_BY_ZERO and kill the query; the tiers
    now exclude zero vectors at their projection points: a zero probe
    returns no rows, a zero candidate is never scored."""
    from streaming_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
        near_dup_pairs,
    )

    dim = 64
    rows = [
        (i, [float((i * 7 + j * 3) % 5 - 2) for j in range(dim)]) for i in range(6)
    ] + [(97, [0.0] * dim)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = emb.filter(F.col("vec_id").isin(0, 97))

    out = brute_force_topk(emb, probes, k=3).collect()
    probe_ids = {r["probe_id"] for r in out}
    cand_ids = {r["cand_id"] for r in out}
    assert 97 not in probe_ids and 97 not in cand_ids
    assert 0 in probe_ids and all(r["cosine"] is not None for r in out)

    # bucketed tiers run the same contract (no DIVIDE_BY_ZERO)
    lsh_topk(emb, probes, k=3, dim=dim).collect()
    near_dup_pairs(emb, dim=dim).collect()


def test_topk_tiers_share_one_tail(spark):
    """The rank/rounding/schema tail is one helper — assert every tier
    emits the identical output schema through it."""
    from streaming_data_pipeline_spark.operators import similarity as sim

    dim = 64
    rows = [
        (i, [float((i * 5 + j) % 7 - 3) for j in range(dim)]) for i in range(20)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = emb.filter(F.col("vec_id") < 2)
    expected = ["probe_id", "cand_id", "cosine", "rank"]
    for fn in (
        sim.brute_force_topk,
        sim.lsh_topk,
        sim.multiprobe_lsh_topk,
        sim.multitable_lsh_topk,
        sim.ivf_topk,
        sim.int8_rerank_topk,
        sim.pq_adc_topk,
    ):
        assert fn(emb, probes, k=3).columns == expected, fn.__name__


# -------------------------------------------------------- tombstones --


def test_vacuum_tolerates_corrupt_tombstone_ledger(tmp_path):
    """A truncated/corrupt _tombstones sidecar resets first-seen clocks
    (retaining longer — the safe direction) instead of failing every
    subsequent vacuum."""
    from streaming_data_pipeline_spark.sources import wire_sink

    path = str(tmp_path / "sink")
    os.makedirs(os.path.join(path, "_staging"), exist_ok=True)
    with open(os.path.join(path, "_staging", "part-x.jsonl"), "w") as f:
        f.write(json.dumps({"k": 1}) + "\n")
    wire_sink._promote(
        path, [wire_sink._Staged(filename="part-x.jsonl", rows=1)], ledger_key="batch-x"
    )
    with open(os.path.join(path, "_tombstones"), "w") as f:
        f.write('{"part-old.jsonl": 123')  # truncated JSON
    res = wire_sink.vacuum(path, min_age_seconds=3600)
    assert res["manifest_lines_after"] == 1
    # the rewritten ledger is valid JSON again
    json.load(open(os.path.join(path, "_tombstones")))


# ------------------------------------------------------ heavy hitters --


def test_heavy_hitters_null_items_excluded_from_n(spark):
    """NULL items must not inflate the threshold: 6x'a' + 10xNULL +
    4x'b' at phi=0.5 -> 'a' qualifies against the 10 NON-NULL rows
    (6 >= 5); the old total-including-NULLs (20) returned nothing."""
    from streaming_data_pipeline_spark.operators.sketches import heavy_hitters

    rows = [("a",)] * 6 + [(None,)] * 10 + [("b",)] * 4
    df = spark.createDataFrame(rows, "item string")
    got = {r["item"]: r["n"] for r in heavy_hitters(df, "item", phi=0.5).collect()}
    assert got == {"a": 6}


def test_heavy_hitters_single_summary_pass(spark):
    """The MG summary pass emits per-partition row-count sentinels, so
    N comes from the (tiny) summary frame — the expensive input is
    scanned twice (summaries + recount), never a third time."""
    from streaming_data_pipeline_spark.operators.sketches import _mg_summaries

    df = spark.createDataFrame([("x",)] * 7 + [("y",)] * 3, "item string")
    summ = _mg_summaries(df, k=4).toPandas()
    assert int(summ["rows"].dropna().sum()) == 10
    assert "x" in set(summ["item"].dropna())


# -------------------------------------------------- streaming windows --


def test_streaming_dedup_returns_ntz_timestamp(spark):
    """streaming_dedup returns the INPUT columns, so the watermark's
    NTZ->TIMESTAMP re-type must be cast back — otherwise unioning with
    a batch NTZ frame or appending to an NTZ sink drifts schemas."""
    from streaming_data_pipeline_spark.streaming.windows import streaming_dedup

    df = spark.createDataFrame(
        [("a", "2024-01-15T10:00:00")], "id string, timestamp string"
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp_ntz"))
    rs = spark.readStream.format("rate-micro-batch").option("rowsPerBatch", 1).load()
    stream = rs.selectExpr(
        "cast(value as string) AS id",
        "cast(timestamp as timestamp_ntz) AS timestamp",
    )
    out = streaming_dedup(stream, id_cols=("id",))
    assert dict(out.dtypes)["timestamp"] == "timestamp_ntz"
    assert dict(df.dtypes)["timestamp"] == dict(out.dtypes)["timestamp"]
