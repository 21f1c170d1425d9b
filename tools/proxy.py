#!/usr/bin/env python3
"""DuckDB in-process proxy baseline (dev-only): times the oracle SQL of
the headline queries in DuckDB against the same parquet, n reps, minima.
No pandas-reference numbers exist for TPC-H-shaped queries, so this is
the "fast single-node engine" yardstick for BENCH comparisons; note
local-mode Spark carries ~0.3-1s fixed scheduling/codegen overhead per
query that a real cluster amortizes.

Usage: python3 tools/proxy.py [sfdir] [reps] [--count-wrap] [--only=q1,q2]

--count-wrap runs each oracle under SELECT count(*) FROM (...), which
lets DuckDB skip the final ORDER BY materialization (the methodology
of BASELINE_PROXY.md's round-5 table; slightly flatters DuckDB).
--only restricts to the named queries (they need not be headliners) —
used by the sf1 scale run to drive each query under an external
timeout (some oracles are all-pairs and infeasible at sf1).
"""
import json, sys, time

import duckdb

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
WRAP = "--count-wrap" in sys.argv
ONLY = None
for a in sys.argv[1:]:
    if a.startswith("--only="):
        ONLY = [q.strip() for q in a.split("=", 1)[1].split(",") if q.strip()]
SF = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.1"
REPS = int(ARGS[1]) if len(ARGS) > 1 else 5

HEADLINERS = ["q1_agg", "q3_join", "q5_multijoin", "q_window_topn",
              "q_topk_agg", "q_skew_agg", "q_dedup_exact", "q_lang_id",
              "q_token_count", "q_fingerprint_winnow",
              "q_sample_split", "q_pii_scrub", "q_decontaminate",
              "q_distinct_kmv", "q_pack_chunks",
              "q_asof_join", "q_range_join", "q_line_dedup",
              "q_gopher_filter", "q_dedup_semantic",
              "q_bloom_join", "q_salted_join", "q_postings",
              "q_token_budget", "q_ccnet_buckets", "q_dedup_minhash_e2e",
              "q_substr_dedup", "q_substr_scrub", "q_dsir_weights",
              "q_c4_filter", "q_curation_e2e", "q_ann_pq",
              "q_ann_ivfpq", "q_kmeans_iter", "q_tokenize"]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    import os
    # oracle_sql.json from the last Verify run
    path = "/tmp/graft_verify/oracle_sql.json"
    if not os.path.exists(path):
        sys.exit("run graft.Verify first (oracle_sql.json missing)")
    oracle = json.load(open(path))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    out = {}
    for q in (ONLY if ONLY is not None else HEADLINERS):
        if q not in oracle:
            continue
        sql = f"SELECT count(*) FROM ({oracle[q]})" if WRAP else oracle[q]
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[q] = round(best, 3)
    print(json.dumps({"metric": "duckdb_proxy", "unit": "sec", "sf": SF,
                      "reps": REPS, "stat": "min", "count_wrap": WRAP,
                      "queries": out}))


if __name__ == "__main__":
    main()
