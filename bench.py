"""Per-round benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.  Corpus synthesis (S18) is cached on disk and excluded from
the timed value (SURVEY.md section 6 bench discipline)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH", "corpus_cache")

# fixture-corpus size per driver scale factor (FIXTURES.md section 5)
_SF_DOCS = {"sf0.001": 200, "sf0.01": 2000, "sf0.1": 20000}


def main() -> None:
    from ocr_proofreader_spark.jobs.proofread_job import build_session
    from ocr_proofreader_spark.config import RunConfig
    from ocr_proofreader_spark.lexicon import (broadcast_lexicon,
                                               load_base_lexicon)
    from ocr_proofreader_spark.operators import training_ops as ops
    from ocr_proofreader_spark.operators.proofread import proofread
    from ocr_proofreader_spark.operators.word_freq import word_freq
    from ocr_proofreader_spark.sources.synthetic import ensure_corpus_parquet
    import __spark_entry__ as entrymod

    sf_name = os.path.basename(os.path.normpath(SF_DIR))
    sf = float(sf_name[2:]) if sf_name.startswith("sf") else 0.1
    n_docs = _SF_DOCS.get(sf_name, max(200, int(200_000 * sf)))

    spark = build_session("bench", master=f"local[{CPUS}]",
                          shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = ensure_corpus_parquet(spark, CACHE, n_docs)
    synth = spark.read.parquet(corpus_path)
    flat = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

    cfg = RunConfig(rebalance_partitions=CPUS * 2)
    lex_bc = broadcast_lexicon(spark, load_base_lexicon(cfg.lexicon_path))

    # warm-up: JVM + Python worker spin-up and codegen compilation for
    # both the Arrow pipeline and the JVM tokenizer, excluded from timings
    proofread(spark, synth.limit(64), cfg, lex_bc).count()
    word_freq(synth.limit(64)).count()

    jobs = [
        ("proofread_synth",
         lambda: proofread(spark, synth, cfg, lex_bc).count()),
        ("word_freq_agg", lambda: word_freq(synth).count()),
        ("proofread_flat",
         lambda: entrymod.queries()["proofread_spans"](spark, SF_DIR)
         .count()),
        ("dedup_exact", lambda: ops.dedup_exact(flat).count()),
        ("dedup_minhash", lambda: ops.minhash_candidates(flat).count()),
        ("simhash", lambda: ops.simhash(flat).count()),
        ("ann_topk", lambda: ops.ann_topk_brute(emb).count()),
    ]
    # best-of-N with the repeat passes INTERLEAVED across queries
    # (A B C.. A B C..): this host's wall clock swings ~2-5x under
    # external noise (BENCH/BASELINE.md), and interleaving keeps one
    # noise burst from hitting every repeat of the same query
    all_times: dict[str, list[float]] = {}
    outs: dict[str, int] = {}

    def run_pass(job_list):
        for name, thunk in job_list:
            t0 = time.time()
            outs[name] = thunk()
            dt = round(time.time() - t0, 3)
            all_times.setdefault(name, []).append(dt)

    for _ in range(3):
        run_pass(jobs)
    prev = _prev_round_queries()
    # noise guard (VERDICT r02 item 7): the r02 record's 15.99s vs the
    # same code's 11.9s re-run showed 3 interleaved repeats can land
    # entirely inside one noise burst.  If ANY query is >25% slower
    # than the previous round, the WHOLE job list gets 2 extra
    # interleaved passes (5 total) — re-running everything, not just
    # the slow queries, keeps repeat counts equal across queries so
    # per-query deltas compare mins over the same N (ADVICE r03: a
    # slow-only re-run hides regressions relative to improvements).
    noisy = any(n in prev and prev[n] > 0
                and min(all_times[n]) > 1.25 * prev[n]
                for n, _ in jobs)
    if noisy:
        for _ in range(2):
            run_pass(jobs)
    n_out = outs["proofread_synth"]

    # min is the headline (least-noise estimate on this host — see
    # BENCH/BASELINE.md), median is recorded alongside so cross-round
    # deltas can be judged without a re-run (VERDICT r04 item 7: the
    # min-vs-recorded gap IS the host noise band, now visible per round)
    from statistics import median
    timings = {n: min(ts) for n, ts in all_times.items()}
    medians = {n: round(median(ts), 3) for n, ts in all_times.items()}
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "value_median": round(sum(medians.values()), 3),
        "sf": sf,
        "synth_docs": n_docs,
        "synth_docs_out": n_out,
        "docs_per_sec": round(n_docs / timings["proofread_synth"], 1),
        "cpus": CPUS,
        "repeats_used": {n: len(ts) for n, ts in all_times.items()},
    }
    if prev:
        # per-query delta vs the latest recorded round so regressions are
        # visible per query, not only in the headline wall (VERDICT r01)
        result["delta_vs_prev"] = {
            q: round(t - prev[q], 3) for q, t in timings.items()
            if q in prev}
    print(json.dumps(result))
    spark.stop()


def _prev_round_queries() -> dict[str, float]:
    """Per-query timings from the newest BENCH_r*.json, if any.

    The driver wraps the bench JSON under a 'parsed' key (BENCH_r01.json
    shape); a raw bench line has 'queries' at the top level — accept
    both.  Round number is parsed from the BASENAME (a path component
    like /home/user2/ must not win the sort) and non-conforming names
    are skipped."""
    import glob
    import re
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p))
        if m:
            rounds.append((int(m.group(1)), p))
    if not rounds:
        return {}
    try:
        with open(max(rounds)[1]) as fh:
            d = json.load(fh)
        return (d.get("queries")
                or d.get("parsed", {}).get("queries", {}) or {})
    except (OSError, ValueError, AttributeError):
        return {}


if __name__ == "__main__":
    main()
