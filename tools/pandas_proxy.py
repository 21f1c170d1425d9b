#!/usr/bin/env python3
"""Pandas proxy baseline (dev-only): times REPRESENTATIVE operations on
the reference's own substrate (pandas — what openpolicedata actually
executes on) over the same sf parquet, n reps, minima. This is the
"reference single-node throughput" yardstick the DuckDB proxy cannot
give: the reference has no benchmark suite, so we time the pandas
idioms its operators reduce to.

Usage: python3 tools/pandas_proxy.py [sfdir] [reps]
"""
import sys, time

import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def bench(name, fn):
    best = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:24s} {best:8.3f} s")
    return best


def main():
    # Reads happen INSIDE the timed functions: the Spark numbers include
    # the parquet scan, so the pandas ones must too (column-pruned, the
    # same projection the Spark plan pushes down).
    def q1():
        li = pd.read_parquet(f"{SF}/lineitem.parquet",
            columns=["l_shipdate", "l_returnflag", "l_linestatus",
                     "l_quantity", "l_extendedprice", "l_discount", "l_tax"])
        d = li[li.l_shipdate <= "2000-12-01"]
        disc = d.l_extendedprice * (1 - d.l_discount)
        return d.assign(disc_price=disc, charge=disc * (1 + d.l_tax)) \
            .groupby(["l_returnflag", "l_linestatus"]) \
            .agg(sum_qty=("l_quantity", "sum"),
                 sum_base_price=("l_extendedprice", "sum"),
                 sum_disc_price=("disc_price", "sum"),
                 sum_charge=("charge", "sum"),
                 avg_qty=("l_quantity", "mean"),
                 avg_price=("l_extendedprice", "mean"),
                 avg_disc=("l_discount", "mean"),
                 count_order=("l_quantity", "size"))

    def dedup_exact():
        docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        norm = docs.text.str.lower().str.strip()
        return docs.assign(n=norm).drop_duplicates("n")

    def token_count():
        docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        return docs.text.str.split().map(len)

    def skew_agg():
        li = pd.read_parquet(f"{SF}/lineitem.parquet",
            columns=["l_orderkey", "l_quantity", "l_extendedprice"])
        g = li.groupby("l_orderkey").agg(
            n_lines=("l_quantity", "size"), sum_qty=("l_quantity", "sum"),
            max_price=("l_extendedprice", "max"))
        return g[g.n_lines >= 4]

    def window_sessions():
        ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
        e = ev.sort_values(["user_id", "ts"])
        gap = e.groupby("user_id").ts.diff() > pd.Timedelta(minutes=30)
        return e.assign(sid=gap.groupby(e.user_id).cumsum()) \
            .groupby(["user_id", "sid"]).ts.agg(["min", "max", "size"])

    def asof():
        ev = pd.read_parquet(f"{SF}/events.parquet",
            columns=["event_id", "user_id", "event_type", "ts"])
        e = ev.sort_values("ts")
        p = e[e.event_type == "purchase"][["user_id", "ts", "event_id"]] \
            .rename(columns={"event_id": "pid"}).sort_values("ts")
        return pd.merge_asof(e, p, on="ts", by="user_id")

    out = {}
    out["q1_agg"] = bench("q1_agg", q1)
    out["dedup_exact"] = bench("dedup_exact", dedup_exact)
    out["token_count"] = bench("token_count", token_count)
    out["skew_agg"] = bench("skew_agg", skew_agg)
    out["sessions"] = bench("sessions(batch)", window_sessions)
    out["asof_join"] = bench("asof_join", asof)
    print({"metric": "pandas_proxy", "sf": SF, "reps": REPS, "queries": out})


if __name__ == "__main__":
    main()
