"""Full-surface exchange-volume audit (r8): measures per-query shuffle
WRITE bytes at sf0.01 vs sf0.1 (a 10x fixture step) for EVERY
`queries()` entry and reports the growth exponent of each — the
whole-surface version of SCALING_AUDIT's "shuffle bytes track
candidates" row.

Why this exists: SCALING.md proves the near-dup candidate stages
exchange linearly, but the other ~230 queries' shuffle volume was
argued from plan shape (`.explain` audits), never measured. At 100 TB
the exchange IS the cost model — a query whose shuffle bytes grow
super-linearly in the input is the one that dies at 1000 executors, no
matter how clean its plan looks. This audit turns "no hidden all-pairs
exchange anywhere" into a number per query.

Method:
- One Spark session (UI REST enabled), each query run once per sf dir.
- Bytes are the completed-stage `shuffleWriteBytes` delta around the
  query, sampled BEFORE the plan-building call so streaming entries'
  micro-batch jobs are included, and settled (two equal consecutive
  REST reads) so the status store's async update can't undercount.
- Execution is `df.write.format("noop")` — unlike `.count()`, the noop
  sink keeps every output column alive, so projection-heavy plans
  can't shed their expensive expressions under the audit.
- Exponent e: bytes_sf0.1 = bytes_sf0.01 * 10^e, i.e. e = 1.0 exactly
  linear, 2.0 quadratic, computed only when the sf0.01 side exceeds a
  noise floor (64 KiB) — below it, fixed per-stage framing dominates
  and two-point exponents are meaningless.

Reading the exponents — the fixture-ladder caveat (same as
SCALING.md): along sf0.01 -> sf0.1 the documents fixture grows
dup-GROUP sizes with N, so the dedup pair families' true output grows
~quadratically along the ladder BY CONSTRUCTION of the data (measured
e(out)=1.99 on the ladder). Their linear-truth instrument is the
rotation-copy corpus in tools/scaling_audit.py; here they are listed
under `known_superlinear_truth` with a pointer instead of being
flagged. Everything else is flagged when e > FLAG_E.

Classes in the report:
- zero-exchange: no shuffle at either sf (broadcast/scan-only plans;
  partition-local at any scale).
- bounded-exchange: sf0.1 bytes still under the noise floor — the
  exchange volume is INDEPENDENT of input size (map-side combine
  collapses to the group count, or only broadcast-sized sides move).
  The best growth class: 10x more data, same bytes on the wire.
- small-base: sf0.01 under the floor but sf0.1 above it — the
  exchange appeared with scale; exponent is untrustworthy (tiny
  base), so the raw bytes are reported and the row is flagged when
  the sf0.1 side is already large (> GROWN_FLAG bytes).
- measured: exponent computed; flagged if e > FLAG_E and not in the
  known-superlinear-truth list.

Usage: python tools/exchange_audit.py [out_json] [name ...]
(default EXCHANGE_AUDIT.json in the repo root; names filter the
query set for iteration).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = 10.0  # sf0.01 -> sf0.1
NOISE_FLOOR = 64 * 1024  # bytes below which exponents are framing noise
GROWN_FLAG = 8 * 1024 * 1024  # small-base rows flagged above this at sf0.1
FLAG_E = 1.35

# Queries whose OUTPUT is super-linear along the fixture ladder by
# construction of the data (dup-group sizes grow with N), not by
# algorithm: their linear-truth instrument is the rotation-copy corpus
# (tools/scaling_audit.py, SCALING.md). Listed, reported, not flagged.
KNOWN_SUPERLINEAR_TRUTH = {
    "dedup_near_minhash_lsh",
    "dedup_minhash_estimate_error",
    "dedup_ngram_jaccard",
    "simhash_near_dup",
    "simhash128_near_dup",
    "image_phash_near_dup",
    "embedding_near_dup_pairs",
    "dedup_containment_pairs",
    "dedup_edit_distance_pairs",
    "semantic_dedup_keep_canonical",
    "dedup_cluster_components",
    "dedup_keep_canonical",
    "dup_cluster_size_histogram",
    "cross_source_dup_matrix",
    "contamination_ngram_overlap",
    "repeated_passage_coverage",
}


def _shuffle_bytes_raw(spark) -> int | None:
    sc = spark.sparkContext
    base = sc.uiWebUrl
    if not base:
        return None
    try:
        url = f"{base}/api/v1/applications/{sc.applicationId}/stages?status=COMPLETE"
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.loads(r.read())
        # One entry per stage ATTEMPT: a retried stage would double-count
        # its write bytes. Keep only the highest attemptId per stageId.
        last: dict[int, tuple[int, int]] = {}
        for s in stages:
            sid = int(s.get("stageId", -1))
            att = int(s.get("attemptId", 0))
            if sid not in last or att >= last[sid][0]:
                last[sid] = (att, int(s.get("shuffleWriteBytes", 0)))
        return sum(b for _, b in last.values())
    except Exception:
        return None


def _shuffle_bytes(spark) -> int | None:
    """Settled read: the UI status store updates asynchronously after an
    action returns; poll until two consecutive reads agree.

    Caveat (documented misattribution risk): "two equal consecutive
    reads" proves the store was QUIET for one poll interval, not that it
    has fully drained. If the store lags longer than the window after a
    heavy query, the carried s0 silently shifts bytes from that query's
    delta into the NEXT query's (negative deltas are caught downstream;
    positive misattribution between adjacent rows is not detectable from
    the cumulative sum alone). Mitigation: require TWO consecutive
    agreeing intervals (three equal reads) and allow up to ~6 s — in
    practice the store settles in <1 s once the last task event is
    processed, and the audit's per-query deltas are cross-checkable
    against the job-level totals in the committed artifact."""
    prev = _shuffle_bytes_raw(spark)
    stable = 0
    for _ in range(30):
        time.sleep(0.2)
        cur = _shuffle_bytes_raw(spark)
        if cur == prev:
            stable += 1
            if stable >= 2:
                return cur
        else:
            stable = 0
        prev = cur
    return prev


def run_one(spark, fn, sf_dir: str, s0: int | None) -> dict:
    """``s0`` is the settled cumulative sum from the PREVIOUS
    measurement point (no jobs run between queries, so the previous
    query's s1 IS this query's s0) — halves the REST fetches, which
    grow with retained-stage count over the audit."""
    if s0 is None:
        s0 = _shuffle_bytes(spark)
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 3)
    s1 = _shuffle_bytes(spark)
    out = {
        "shuffle_bytes": (s1 - s0) if (s0 is not None and s1 is not None) else None,
        "wall_sec": wall,
        "_s1": s1,
    }
    if s0 is None or s1 is None:
        # a REST read failed mid-run: the row must surface as an error,
        # never default into zero/bounded-exchange (the best classes)
        out["err"] = "shuffle-bytes REST read failed"
    return out


def growth(a, b, scale=SCALE):
    if not a or not b or a <= 0 or b <= 0:
        return None
    return round(math.log(b / a) / math.log(scale), 2)


def main() -> int:
    out_path = os.path.join(REPO, "EXCHANGE_AUDIT.json")
    names: list[str] = []
    for arg in sys.argv[1:]:
        if arg.endswith(".json"):
            out_path = arg
        else:
            names.append(arg)

    import __spark_entry__ as entrymod
    from streaming_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="exchange-audit",
        extra_confs={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4051",
            # The audit diffs a CUMULATIVE completed-stage sum; the UI
            # status store evicts stages past this cap, which made the
            # sum DECREASE mid-audit (negative per-query deltas) on the
            # first full run. 488 query executions produce ~20k stages.
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not spark.sparkContext.uiWebUrl:
        print("Spark UI REST unavailable — cannot measure shuffle bytes", file=sys.stderr)
        return 2

    qs = entrymod.queries()
    unknown = set(names) - set(qs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        return 2
    dead_exemptions = KNOWN_SUPERLINEAR_TRUTH - set(qs)
    if dead_exemptions:
        # mirror the unknown-names check: an exemption that attaches to
        # no registered query is a typo'd allowlist entry, not a no-op
        print(
            f"WARNING: KNOWN_SUPERLINEAR_TRUTH names not in queries(): "
            f"{sorted(dead_exemptions)}",
            file=sys.stderr,
        )
    if names and out_path == os.path.join(REPO, "EXCHANGE_AUDIT.json"):
        # a subset run must never overwrite the committed whole-surface
        # artifact SCALING.md cites — demand an explicit out path
        print(
            "subset run: pass an explicit out.json (refusing to overwrite "
            "the committed EXCHANGE_AUDIT.json with a partial audit)",
            file=sys.stderr,
        )
        return 2
    todo = {n: qs[n] for n in names} if names else qs

    results: dict[str, dict] = {}
    carry_s1: int | None = None  # previous measurement point, reused as s0
    for i, (name, fn) in enumerate(todo.items(), 1):
        row: dict = {}
        for key, sf_dir in (("sf001", SF_SMALL), ("sf01", SF_BIG)):
            try:
                m = run_one(spark, fn, sf_dir, carry_s1)
                carry_s1 = m.pop("_s1", None)
            except Exception as exc:  # keep auditing; a broken query is a finding
                m = {"shuffle_bytes": None, "wall_sec": None, "err": f"{type(exc).__name__}: {exc}"}
                carry_s1 = None  # jobs may have half-run; re-read next time
            b = m["shuffle_bytes"]
            if b is not None and b < 0:
                # cumulative sum went backwards: stage eviction raced the
                # diff despite the raised cap — measurement invalid
                m["err"] = f"stage-eviction (delta {b})"
                b = None
            row[f"bytes_{key}"] = b
            row[f"wall_{key}"] = m["wall_sec"]
            if "err" in m:
                row["err"] = m["err"]
        b0, b1 = row.get("bytes_sf001"), row.get("bytes_sf01")
        if row.get("err") or b0 is None or b1 is None:
            row["class"] = "error"
        elif (b0 or 0) == 0 and (b1 or 0) == 0:
            row["class"] = "zero-exchange"
        elif (b1 or 0) < NOISE_FLOOR:
            row["class"] = "bounded-exchange"
        elif (b0 or 0) < NOISE_FLOOR:
            row["class"] = "small-base"
            if (b1 or 0) > GROWN_FLAG and name not in KNOWN_SUPERLINEAR_TRUTH:
                row["flag"] = True
        else:
            row["class"] = "measured"
            row["e_bytes"] = growth(b0, b1)
            row["e_wall"] = growth(row.get("wall_sf001"), row.get("wall_sf01"))
            if name in KNOWN_SUPERLINEAR_TRUTH:
                row["truth"] = "fixture-ladder super-linear by construction; see SCALING_AUDIT"
            elif row["e_bytes"] is not None and row["e_bytes"] > FLAG_E:
                row["flag"] = True
        results[name] = row
        tag = row.get("class")
        e = row.get("e_bytes")
        print(f"[{i}/{len(todo)}] {name}: {tag}" + (f" e={e}" if e is not None else ""), flush=True)

    measured = {n: r for n, r in results.items() if r.get("class") == "measured"}
    flagged = sorted(n for n, r in results.items() if r.get("flag"))
    errors = sorted(n for n, r in results.items() if r.get("class") == "error")
    exps = sorted(r["e_bytes"] for r in measured.values() if r.get("e_bytes") is not None)
    summary = {
        "n": len(results),
        "zero_exchange": sum(1 for r in results.values() if r.get("class") == "zero-exchange"),
        "bounded_exchange": sum(1 for r in results.values() if r.get("class") == "bounded-exchange"),
        "small_base": sum(1 for r in results.values() if r.get("class") == "small-base"),
        "measured": len(measured),
        "errors": errors,
        "known_superlinear_truth": sorted(
            n for n in results if n in KNOWN_SUPERLINEAR_TRUTH and results[n].get("class") == "measured"
        ),
        "flagged": flagged,
        "e_bytes_median": exps[len(exps) // 2] if exps else None,
        "e_bytes_max_unflagged": max(
            (r["e_bytes"] for n, r in measured.items()
             if r.get("e_bytes") is not None and n not in KNOWN_SUPERLINEAR_TRUTH),
            default=None,
        ),
        "noise_floor_bytes": NOISE_FLOOR,
        "flag_threshold_e": FLAG_E,
        "scale": SCALE,
        "sf_dirs": [SF_SMALL, SF_BIG],
    }
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "queries": results}, f, indent=1, sort_keys=True)
    print(json.dumps(summary))
    return 1 if flagged or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
