#!/usr/bin/env python3
"""Dev-only bench-data generator: scales the driver's sf0.1 parquet to a
larger synthetic scale factor (default 10x ~= sf1) for the scale bench.

Replicates each table N times with a consistent +1e9*i key offset on
every key/foreign-key column, so per-copy join selectivity and group
cardinality match the source exactly while table volume grows Nx.
Fixed dimensions (region, nation) are copied 1x, as in TPC-H scaling.

Documents and embeddings are PERTURBED per copy, not duplicated:
  - copy i>0 of a document gets a copy-specific token injected every
    5 words, so cross-copy 3-gram Jaccard lands far below every dedup
    threshold (within-copy dup clusters are preserved verbatim);
  - copy i>0 of an embedding is coordinate-rotated by (i*17) mod 64,
    which preserves the norm/distribution but decorrelates cosine.
Without this, Nx replication would grow dup-cluster sizes Nx and pair
counts quadratically — unlike real sf1 data, where cluster count grows
and cluster size stays constant.

Usage: python3 tools/genscale.py [srcdir] [outdir] [N]
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/benchdata/sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 1_000_000_000  # per-copy key offset; max source key ~2.4e6

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def rp(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def gen(table, select_for_copy, row_group_size=122880):
    # Small row groups for the small-but-heavy tables (documents,
    # embeddings): parquet is only splittable at row-group boundaries,
    # so a single-row-group file pins the whole scan to ONE Spark task
    # no matter how many cores the host has.
    parts = " UNION ALL ".join(select_for_copy(i) for i in range(N))
    con.sql(f"COPY ({parts}) TO '{OUT}/{table}.parquet' "
            f"(FORMAT parquet, ROW_GROUP_SIZE {row_group_size})")
    n = con.sql(
        f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows")


# Fixed dims: 1x verbatim copies (TPC-H dims do not scale).
for t in ("region", "nation"):
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    print(f"{t}: copied 1x")

gen("customer", lambda i: f"""
  SELECT c_custkey + {i * OFF} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment FROM {rp('customer')}""")

gen("supplier", lambda i: f"""
  SELECT s_suppkey + {i * OFF} AS s_suppkey, s_name, s_nationkey,
         s_acctbal FROM {rp('supplier')}""")

gen("part", lambda i: f"""
  SELECT p_partkey + {i * OFF} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice FROM {rp('part')}""")

gen("orders", lambda i: f"""
  SELECT o_orderkey + {i * OFF} AS o_orderkey,
         o_custkey + {i * OFF} AS o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority FROM {rp('orders')}""")

gen("lineitem", lambda i: f"""
  SELECT l_orderkey + {i * OFF} AS l_orderkey,
         l_partkey + {i * OFF} AS l_partkey,
         l_suppkey + {i * OFF} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate FROM {rp('lineitem')}""")

gen("events", lambda i: f"""
  SELECT event_id + {i * OFF} AS event_id, ts,
         user_id + {i * OFF} AS user_id, event_type, value, props
  FROM {rp('events')}""")


def doc_text(i):
    if i == 0:
        return "text"
    # Inject a copy-specific token every 5 words: ~3/5 of the word
    # 3-gram shingles differ, pushing cross-copy Jaccard well below
    # the 0.6/0.8 dedup thresholds.
    return (r"regexp_replace(text, '((\w+ ){5})', "
            rf"'\1zzq{i} ', 'g')")


gen("documents", lambda i: f"""
  SELECT doc_id + {i * OFF} AS doc_id, {doc_text(i)} AS text, lang,
         source, length({doc_text(i)})::BIGINT AS n_chars
  FROM {rp('documents')}""", row_group_size=2000)


def emb_expr(i):
    r = (i * 17) % 64
    if r == 0:
        return "embedding"
    return f"embedding[{r + 1}:] || embedding[1:{r}]"


gen("embeddings", lambda i: f"""
  SELECT vec_id + {i * OFF} AS vec_id, {emb_expr(i)} AS embedding,
         label FROM {rp('embeddings')}""", row_group_size=1000)

print(f"done -> {OUT}")
