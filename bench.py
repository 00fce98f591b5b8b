#!/usr/bin/env python
"""Benchmark harness: times the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is fully materialized via a count() action (results are small
aggregates; the work measured is the scan/shuffle/compute, not driver
transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mmlspark_spark.core.cache import release_intermediates
from mmlspark_spark.core.session import DEFAULT_SF_DIR, get_spark
from mmlspark_spark.plans.catalog import CATALOG


def _serving_latency(spark, n_requests: int = 20) -> dict | None:
    """Serving bench (BASELINE.md bench plan item 4): sequential p50
    round-trip plus concurrent-client throughput (req/s) and p99
    through the HTTP serving source. Micro-batch mode; the reference's
    continuous-mode sub-ms claim is out of scope for the python source
    API — these are the achieved micro-batch numbers."""
    import statistics
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    import requests as rq
    from pyspark.sql import functions as F

    from mmlspark_spark.streaming import (
        make_reply,
        register_serving_source,
        serving_sink,
    )
    from mmlspark_spark.streaming.serving import (
        start_serving_server,
        stop_server,
    )

    try:
        register_serving_source(spark)
        from mmlspark_spark.streaming.serving import get_server_token

        port = start_serving_server("bench_serve")
        req = (spark.readStream.format("http_serving")
               .option("port", str(port))
               .option("drainToken", get_server_token("bench_serve"))
               .load())
        logic = req.select(
            "id",
            make_reply(F.upper(F.get_json_object(
                F.col("body").cast("string"), "$.text"))).alias("reply"))
        with tempfile.TemporaryDirectory() as ck:
            query = serving_sink(logic, "bench_serve", trigger="20 milliseconds",
                                 checkpoint=f"{ck}/ck")
            try:
                url = f"http://127.0.0.1:{port}/score"
                rq.post(url, json={"text": "warm"}, timeout=30)  # warm the plan
                # r17: best-of-3 BLOCKS of sequential requests. Every
                # request is its own micro-batch job, so the p50 is
                # job-launch-bound and rode host contention across a
                # 0.16-0.35 s band on byte-identical code (r16 verdict
                # item 7); a single contended window contaminated the
                # whole lane where the per-query lanes discard it via
                # best-of-N. Same methodology as those lanes now: the
                # block median is the unit, the best block is the
                # claim, and the FIRST block's median (the old
                # definition) rides along as
                # serving_roundtrip_p50_single for cross-round
                # comparability.
                block_p50s = []
                for _b in range(3):
                    lat = []
                    for i in range(n_requests):
                        t0 = time.time()
                        rq.post(url, json={"text": f"b{_b}r{i}"},
                                timeout=30)
                        lat.append(time.time() - t0)
                    block_p50s.append(statistics.median(lat))
                p50 = round(min(block_p50s), 4)
                p50_single = round(block_p50s[0], 4)

                # Concurrent throughput: 8 clients, 10 requests each,
                # sessions reused so TCP setup isn't what's measured.
                n_clients, per_client = 8, 10

                def client(cid: int) -> list[float]:
                    times = []
                    with rq.Session() as s:
                        for i in range(per_client):
                            t0 = time.time()
                            s.post(url, json={"text": f"c{cid}r{i}"},
                                   timeout=30)
                            times.append(time.time() - t0)
                    return times

                # Steady-state: the first CONCURRENT batch pays one-off
                # costs the sequential warm-up can't reach (bigger
                # micro-batch plan shape) — burst once unmeasured, same
                # methodology as the per-query best-of-2.
                with ThreadPoolExecutor(max_workers=n_clients) as ex:
                    list(ex.map(
                        lambda c: rq.post(url, json={"text": f"w{c}"},
                                          timeout=30),
                        range(n_clients)))
                t_all = time.time()
                with ThreadPoolExecutor(max_workers=n_clients) as ex:
                    all_lat = [t for ts in ex.map(client, range(n_clients))
                               for t in ts]
                wall = time.time() - t_all
                all_lat.sort()
                p99 = all_lat[min(len(all_lat) - 1,
                                  int(len(all_lat) * 0.99))]
                return {
                    "serving_roundtrip_p50": p50,
                    "serving_roundtrip_p50_single": p50_single,
                    "serving_roundtrip_p99": round(p99, 4),
                    "serving_rps": round(len(all_lat) / wall, 1),
                }
            finally:
                query.stop()
                stop_server("bench_serve")
    except Exception as e:  # pragma: no cover - bench must always emit JSON
        print(f"# serving latency skipped: {e}", file=sys.stderr)
        return None


def _distributed_serving_latency(spark, n_requests: int = 50) -> dict | None:
    """Per-executor fleet bench (streaming/distributed_serving.py):
    requests answered in the server thread, no micro-batch boundary —
    this is the path that recovers the reference's continuous-mode
    latency class. Reported beside (not inside) the headline total."""
    import json as js
    import statistics
    import urllib.request

    from mmlspark_spark.streaming.distributed_serving import (
        DistributedHTTPServer)

    try:
        fleet = DistributedHTTPServer(
            spark, lambda r: {"echo": r.get("text", "").upper()},
            numServers=2, name="bench_dserving")
        try:
            addrs = fleet.start(timeout=60)
            lat = []
            for i in range(n_requests):
                url = f"http://{addrs[i % len(addrs)]}/score"
                t0 = time.time()
                urllib.request.urlopen(urllib.request.Request(
                    url, data=js.dumps({"text": f"r{i}"}).encode(),
                    method="POST"), timeout=10).read()
                lat.append(time.time() - t0)
            lat.sort()
            # latency metrics are banked before the throughput probe:
            # a single timeout under concurrent load must not discard
            # already-measured numbers
            result = {
                "distributed_serving_p50": round(statistics.median(lat), 5),
                "distributed_serving_p99": round(
                    lat[min(len(lat) - 1, int(len(lat) * 0.99))], 5),
            }

            # Concurrent throughput: 8 clients round-robin over the
            # fleet, keep-alive connections (same client shape as the
            # micro-batch rps probe).
            try:
                from concurrent.futures import ThreadPoolExecutor

                import requests as rq

                n_clients, per_client = 8, 25

                def client(cid: int) -> int:
                    with rq.Session() as s:
                        for i in range(per_client):
                            s.post(
                                f"http://{addrs[(cid + i) % len(addrs)]}"
                                "/score",
                                json={"text": f"c{cid}r{i}"}, timeout=10)
                    return per_client

                t_all = time.time()
                with ThreadPoolExecutor(max_workers=n_clients) as ex:
                    done = sum(ex.map(client, range(n_clients)))
                wall = time.time() - t_all
                result["distributed_serving_rps"] = round(done / wall, 1)
            except Exception as e:
                print(f"# distributed serving rps skipped: {e}",
                      file=sys.stderr)
            return result
        finally:
            fleet.stop()
    except Exception as e:  # pragma: no cover - bench must always emit JSON
        print(f"# distributed serving skipped: {e}", file=sys.stderr)
        return None


def _pyworker_probe_once(spark) -> float:
    """One timed run of the PYTHON-WORKER calibration workload: a
    fixed Arrow-batched pandas-UDF bit-mix fold (64 LCG+xorshift
    rounds over 1M longs, 32 partitions) whose cost lives almost
    entirely in the python worker path — Arrow transfer, numpy
    dispatch, worker scheduling. Exists because the round-14 host
    A/B proved the tpch_q6 scan-agg ratio does NOT transfer to
    pandas-UDF lanes (q6 1.05x while simhash ran ~1.7x on the same
    host): JVM scan throughput and python-worker throughput move
    independently across host classes, so the bench emits BOTH
    ratios. Data-independent (spark.range), so the probe is
    byte-stable across corpora and engine refactors."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    def _fold(v):
        x = v.to_numpy(np.int64).astype(np.uint64)
        acc = x.copy()
        for _ in range(64):
            x = (x * np.uint64(6364136223846793005)
                 + np.uint64(1442695040888963407))
            acc ^= x >> np.uint64(33)
        return pd.Series(acc.view(np.int64))

    # non-decorator form: `from __future__ import annotations` turns
    # hints into strings pyspark's hint inference can't resolve here
    fold = F.pandas_udf(_fold, "long")

    t0 = time.time()
    (spark.range(0, 1_000_000, 1, 32)
     .select(fold("id").alias("h"))
     .agg({"h": "sum"}).collect())
    return time.time() - t0


def _arrow_transfer_probe_once(spark) -> float:
    """One timed run of the ARROW-TRANSFER calibration workload: an
    ``array<bigint>`` column (100k rows × 32 longs, built JVM-side)
    round-trips into a pandas UDF that only takes each list's length —
    near-zero python compute, so the time is dominated by Arrow
    list-column serialization plus the arrow→pandas object-array
    conversion. Exists because the r15 pyworker probe (a flat-long
    LCG fold) does not exercise list-of-longs transfer, which is what
    the fingerprint/signature lanes actually pay — the r15
    simhash_match_indexed drift (+13% against a −15% tide) was
    unattributable without this leg (round-15 verdict item 4).
    Data-independent (spark.range), byte-stable across corpora."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _lens(v):
        return pd.Series([len(x) for x in v])

    lens = F.pandas_udf(_lens, "long")
    t0 = time.time()
    (spark.range(0, 100_000, 1, 32)
     .select(F.array([(F.col("id") * (i + 1))
                      for i in range(32)]).alias("a"))
     .select(lens("a").alias("n"))
     .agg({"n": "sum"}).collect())
    return time.time() - t0


def _time_once(spec, spark, sf_dir: str) -> tuple[float, int]:
    """One timed materialization of a catalog query via count();
    persisted intermediates released even when count() throws."""
    t0 = time.time()
    df = spec.fn(spark, sf_dir)
    try:
        n = df.count()
        return time.time() - t0, n
    finally:
        # even when count() throws (curation metrics catch and
        # continue), persisted intermediates must not leak into
        # the rest of the bench
        release_intermediates(df)


def _best_of(spec, spark, sf_dir: str, runs: int) -> tuple[float, float, int]:
    """(best, median, rows) of N timings, runs back-to-back. The
    median rides along so a slow round is attributable without a
    rerun: best≈median on a quiet host means the best is steady
    state; best≪median means contention ate the other passes (the
    round-9 +7% ambiguity this field exists to kill)."""
    import statistics

    samples, n = [], 0
    for _ in range(runs):
        elapsed, n = _time_once(spec, spark, sf_dir)
        samples.append(elapsed)
    return min(samples), statistics.median(samples), n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    load_start = os.getloadavg()[0]
    spark = get_spark("mmlspark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [s for s in CATALOG.values() if s.headline]
    # Warm the JVM + parquet footers with one cheap action.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # Host-load calibration (round-12): three rounds of driver-run
    # numbers drifted up purely with host load (r11: +24% uniform
    # inflation at load 9.4 on byte-identical plans; re-measured
    # 8.74 s at load <3 this round vs the 12.02 driver number). The
    # bench cannot refuse to run on a busy host, so it ANNOTATES
    # instead: tpch_q6 — a tiny pure scan-agg whose quiet-host steady
    # state is pinned below — is timed best-of-3 in-session, and the
    # ratio against the pinned reference scales the headline total
    # for cross-round comparison. load_inflated flags a start load
    # ≥ 3 (1-min average) so a contaminated run is machine-readable,
    # not narrative.
    # Round-14 re-pin: the fleet's hosts moved a class — rounds 12-13
    # measured 1.4-1.6x the ORIGINAL 0.30 s pin even at start load
    # < 0.3, and a fresh idle probe this round read a 0.43-0.52 s
    # steady state (best-of-6 after warm-up) — so the ratio had
    # stopped meaning "contention" and started meaning "host class".
    # Pinned to the middle of the measured idle band; ratio_old_pin
    # rides along against the retired 0.30 s reference so rounds ≤ 13
    # stay directly comparable during the transition.
    # Round-15: a SECOND probe for the python-worker path. The r14
    # host A/B (BASELINE.md round-14) proved the q6 scan-agg ratio
    # does not transfer to pandas-UDF lanes (1.05x vs ~1.7x on the
    # same host) — so the calibration block now carries BOTH a
    # scan_ratio and a pyworker_ratio, each against its own
    # quiet-host pin (BASELINE.md round-15).
    CAL_QUIET_REF = 0.48      # tpch_q6 steady-state sec, idle, sf0.1
    CAL_QUIET_REF_OLD = 0.30  # rounds 1-13 pin (faster host class)
    CAL_PYWORKER_REF = 0.55   # _pyworker_probe_once steady sec, idle
    # round-16: confirmed on a quiet host (scan_ratio 0.91 run read
    # arrow_best 0.601; BASELINE.md round-16)
    CAL_ARROW_REF = 0.60      # _arrow_transfer_probe_once steady sec
    cal_samples = []
    pyw_samples: list[float] = []
    arrow_samples: list[float] = []
    cal_spec = CATALOG.get("tpch_q6")
    if cal_spec is not None and abs(sf - 0.1) < 1e-9:
        # one untimed warm-up: the FIRST pandas-UDF action of a
        # session pays python worker daemon startup (~6 s measured
        # idle vs a 0.5-0.6 s steady state) — without it, best-of-3
        # would still carry warm-up, not worker throughput
        _pyworker_probe_once(spark)
        for _ in range(3):
            elapsed, _n = _time_once(cal_spec, spark, sf_dir)
            cal_samples.append(elapsed)
            pyw_samples.append(_pyworker_probe_once(spark))
            arrow_samples.append(_arrow_transfer_probe_once(spark))
    calibration = None
    if cal_samples:
        cal_best = min(cal_samples)
        pyw_best = min(pyw_samples)
        arrow_best = min(arrow_samples)
        calibration = {
            "query": "tpch_q6",
            "best": round(cal_best, 3),
            "quiet_ref": CAL_QUIET_REF,
            "ratio": round(cal_best / CAL_QUIET_REF, 2),
            "quiet_ref_old": CAL_QUIET_REF_OLD,
            "ratio_old_pin": round(cal_best / CAL_QUIET_REF_OLD, 2),
            "pyworker_best": round(pyw_best, 3),
            "pyworker_quiet_ref": CAL_PYWORKER_REF,
            "arrow_best": round(arrow_best, 3),
            "arrow_quiet_ref": CAL_ARROW_REF,
            # the three headline ratios, named for cross-round tooling
            "scan_ratio": round(cal_best / CAL_QUIET_REF, 2),
            "pyworker_ratio": round(pyw_best / CAL_PYWORKER_REF, 2),
            "arrow_ratio": round(arrow_best / CAL_ARROW_REF, 2),
        }
        print(f"# calibration tpch_q6: {calibration['best']}s "
              f"(quiet ref {CAL_QUIET_REF}s, scan_ratio "
              f"{calibration['scan_ratio']}; old pin {CAL_QUIET_REF_OLD}s, "
              f"ratio {calibration['ratio_old_pin']}) | pyworker: "
              f"{calibration['pyworker_best']}s (quiet ref "
              f"{CAL_PYWORKER_REF}s, pyworker_ratio "
              f"{calibration['pyworker_ratio']}) | arrow: "
              f"{calibration['arrow_best']}s (quiet ref "
              f"{CAL_ARROW_REF}s, arrow_ratio "
              f"{calibration['arrow_ratio']})", file=sys.stderr)

    # Steady-state methodology: each query reports its best-of-N — the
    # first execution of a plan shape pays one-off JIT /
    # codegen-compile / broadcast-thread costs that are not properties
    # of the plan (round-1 bench showed tpch_q1 at 2.2 s cold vs 1.6 s
    # steady on identical code). Three runs, not two: the heavy
    # shuffle queries (ngram_jaccard) showed run-2 still paying
    # residual warm-up under memory pressure (3.76 s run-2 vs 2.1-2.4 s
    # steady measured over 3 isolated runs), so best-of-2 occasionally
    # reported a number ~70% above steady state.
    #
    # Contention robustness (round-6 driver run: ngram_jaccard 7.57 s
    # vs 1.95 s quiet-host on byte-identical code, most queries +12-45%
    # in the same run): the passes are INTERLEAVED across queries —
    # pass 1 of every query, then pass 2, then pass 3 — so a transient
    # host-load window (tens of seconds) contaminates at most ONE pass
    # per query instead of all of a single query's back-to-back runs;
    # best-of-N then discards it. The heavy shuffle queries get a 4th
    # pass (largest observed contention sensitivity). Load averages are
    # emitted in the JSON so a contaminated run is self-documenting.
    HEAVY = {"ngram_jaccard", "minhash_dedup"}
    base_passes, heavy_passes = 3, 4
    import statistics

    samples: dict[str, list[float]] = {}
    row_counts: dict[str, int] = {}
    for p in range(heavy_passes):
        for spec in headline:
            if p >= (heavy_passes if spec.name in HEAVY else base_passes):
                continue
            elapsed, n = _time_once(spec, spark, sf_dir)
            row_counts[spec.name] = n
            samples.setdefault(spec.name, []).append(elapsed)
            print(f"# pass{p + 1} {spec.name}: {round(elapsed, 3)}s",
                  file=sys.stderr)
    times = {name: round(min(ts), 3) for name, ts in samples.items()}
    # Median-of-N alongside best-of-N: best is the steady-state claim
    # (JIT/codegen warm-up discarded), the median says whether the
    # other passes agreed — a regression moves BOTH, contention moves
    # only the median.
    medians = {name: round(statistics.median(ts), 3)
               for name, ts in samples.items()}
    for name, t in times.items():
        print(f"# {name}: {t}s ({row_counts[name]} rows)", file=sys.stderr)

    serving = _serving_latency(spark)
    if serving is not None:
        # only latencies join the headline total; rps is a rate
        times["serving_roundtrip_p50"] = serving["serving_roundtrip_p50"]
        for k, v in serving.items():
            print(f"# {k}: {v}", file=sys.stderr)
    dserving = _distributed_serving_latency(spark)
    if dserving is not None:
        # side metric: the fleet path has no micro-batch in it, so it
        # does not join the headline total (comparability across rounds)
        serving = {**(serving or {}), **dserving}
        for k, v in dserving.items():
            print(f"# {k}: {v}", file=sys.stderr)

    # Side metrics: round-6 curation/warehouse operators, best-of-2.
    # NOT part of the headline total (its membership is frozen for
    # cross-round comparability) — reported so throughput regressions
    # in the newer surface are visible round over round.
    curation: dict[str, float] = {}
    curation_median: dict[str, float] = {}
    for name in ("markup_strip", "line_dedup", "incremental_dedup",
                 "bpe_tokenize", "scd2_merge", "pagerank"):
        spec = CATALOG.get(name)
        if spec is None:
            continue
        try:
            best, med, _ = _best_of(spec, spark, sf_dir, runs=2)
        except Exception as e:  # advisory metrics never block the JSON
            print(f"# {name}: FAILED {type(e).__name__}", file=sys.stderr)
            continue
        curation[name] = round(best, 3)
        curation_median[name] = round(med, 3)
        print(f"# {name}: {curation[name]}s", file=sys.stderr)

    # Side metrics: round-8 retrieval / quantized-ANN family, best-of-2.
    # Same contract as `curation`: advisory, never in the headline total.
    ann: dict[str, float] = {}
    ann_median: dict[str, float] = {}
    # round-11 additions: the persisted-artifact lifecycle lanes
    # (save+load+search in one timing — the index-once/search-many
    # shape) and filtered IVF. round-12: the dedup families' stored
    # match lanes (minhash/simhash/video _match_indexed) — the
    # incremental-screening cost, i.e. the actual daily-ingest number
    # for a near-dup pipeline, tracked per round alongside ANN
    # round-13: the two driver-gated COMPACTION lanes (save + delete
    # + physical rewrite + search in one timing — the full takedown
    # lifecycle cost for the flat-store and cell-partitioned
    # geometries), tracked per round alongside the match lanes, and
    # exact_match_indexed (the content-hash registry screen — the
    # cheapest family's incremental-ingest number, bloom + prefix
    # pruning instead of signatures)
    for name in ("knn_pq_adc", "knn_ivfpq", "knn_sq8", "knn_matryoshka",
                 "knn_matryoshka_sq8", "knn_ivf", "bm25_search",
                 "dsir_select", "knn_ivfpq_indexed", "bm25_phrase_indexed",
                 "knn_ivf_filtered", "minhash_match_indexed",
                 "simhash_match_indexed", "video_match_indexed",
                 "knn_lsh_indexed", "bm25_search_compacted",
                 "knn_ivf_compacted", "exact_match_indexed"):
        spec = CATALOG.get(name)
        if spec is None:
            continue
        try:
            best, med, _ = _best_of(spec, spark, sf_dir, runs=2)
        except Exception as e:  # advisory metrics never block the JSON
            print(f"# {name}: FAILED {type(e).__name__}", file=sys.stderr)
            continue
        ann[name] = round(best, 3)
        ann_median[name] = round(med, 3)
        print(f"# {name}: {ann[name]}s", file=sys.stderr)

    payload = build_payload(
        times, medians, sf,
        load_avg=[round(load_start, 2), round(os.getloadavg()[0], 2)],
        calibration=calibration, serving=serving,
        curation=curation, curation_median=curation_median,
        ann=ann, ann_median=ann_median, load_start_raw=load_start)
    print(json.dumps(payload))
    spark.stop()


def build_payload(times: dict, medians: dict, sf: float,
                  load_avg: list, calibration: dict | None = None,
                  serving: dict | None = None,
                  curation: dict | None = None,
                  curation_median: dict | None = None,
                  ann: dict | None = None,
                  ann_median: dict | None = None,
                  load_start_raw: float | None = None) -> dict:
    """Assemble the single-line JSON payload with the HEADLINE FIELDS
    LAST. The grading driver keeps only the final ~2000 characters of
    bench output, and round 13 proved the failure mode: with
    metric/value first, the (large) per-query maps pushed the totals
    and the calibration block off the front of the captured tail —
    BENCH_r13.json had no headline number at all. Python dicts are
    insertion-ordered and json.dumps preserves that order, so the big
    advisory maps go first and everything a truncated tail must still
    carry — load flags, calibration, metric/value/value_median/unit/sf
    — goes at the very end (≲500 chars together)."""
    total = round(sum(times.values()), 3)
    # serving p50 has one sample — it joins both totals unchanged so
    # value/value_median stay directly comparable
    total_median = round(sum(medians.values())
                         + times.get("serving_roundtrip_p50", 0.0), 3)
    payload: dict = {
        "queries": times,
        "queries_median": medians,
    }
    if serving is not None:
        payload["serving"] = serving
    if curation:
        payload["curation"] = curation
        payload["curation_median"] = curation_median
    if ann:
        payload["ann"] = ann
        payload["ann_median"] = ann_median
    # ---- tail-critical fields from here down ----
    # 1-min load average at start/end: external (non-bench) load
    # inflates timings 30-45% — a contaminated run documents itself
    payload["load_avg"] = load_avg
    # start load ≥ 3 means another workload was already running when
    # the bench began: timings are inflated, compare via the
    # calibration ratio, not raw seconds. Flag from the RAW
    # measurement, not the 2dp display value (a start load in
    # [2.995, 3.0) must not flag)
    raw = load_start_raw if load_start_raw is not None else load_avg[0]
    payload["load_inflated"] = raw >= 3.0
    if calibration is not None:
        payload["calibration"] = calibration
    payload["metric"] = "headline_queries_total"
    payload["value"] = total
    payload["value_median"] = total_median
    payload["unit"] = "sec"
    payload["sf"] = sf
    return payload


if __name__ == "__main__":
    main()
