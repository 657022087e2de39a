#!/usr/bin/env python3
"""Deterministic sf1 extrapolation of the driver's sf0.1 tables, for the
THIRD scaling point only (never correctness: the oracle gate stays on
driver data). 10 key-shifted copies preserve every distribution shape a
plan cost depends on (rows per key, group counts, value histograms)
while avoiding the clone artifacts that would distort self-join queries:

- documents: copy c>0 renames every word w -> w~c, a BIJECTIVE per-copy
  token substitution. Set similarity is invariant under a bijective
  rename, so every within-copy shingle/Jaccard/band relation is
  preserved EXACTLY (each copy contributes precisely the organic sf0.1
  pair and candidate volume -> the 10x total is exact, measured
  11,231 -> 112,310 band candidates) while cross-copy shingle sets are
  disjoint (Jaccard 0, no clone blowup). Token counts and word-length
  shape are preserved (no insertions; +2 chars per word); minhash and
  simhash values re-roll per copy but their similarity structure is the
  organic one. Two rejected designs, measured: positional filler
  injection deriving from one word lifted candidates 94x/10x (every
  shared bigram became a shared shingle); window-derived filler
  injection dropped them to 4.2x/10x (fillers amplified the small
  differences between organic near-dups past the threshold). n_chars
  is recomputed from the renamed text.
- embeddings: copy c applies a per-(copy, dim) deterministic +-1 sign
  flip — an orthogonal transform, so norms and all WITHIN-copy cosines
  are preserved bit-for-bit while cross-copy cosines decorrelate (no
  cross-copy pairs at the 0.45 dedup threshold).
- facts/dims: key shift by a stride divisible by 1000 (modular id rules
  like `doc_id % 10` keep their selectivity); foreign keys shift with
  their parents so join fan-outs replicate per copy; timestamps keep
  the sf0.1 range (10x daily density = the bigger-business shape).

The same construction composes: --src /tmp/sf1 re-applies it to the
sf1 output for a FOURTH decade (sf10) — the word rename is bijective
again (w~c -> w~c~c2) and the per-(copy, dim) sign flip is orthogonal
again, so every invariance argument above holds level-by-level.

Usage: python3 tools/gen_sf1.py [/tmp/sf1] [--src DIR] [--copies N]
                                [--tables a,b,...]

--tables restricts generation to the named tables (e.g.
`--tables embeddings` for the fifth-decade q_dedup_embed point, where
replanting the full 17 GB table set would be waste).
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
TABLES = None  # None = all


def stride_for(con, table, key):
    m = con.sql(f"SELECT max({key}) FROM '{SRC}/{table}.parquet'").fetchone()[0]
    return ((int(m) // 1000) + 1) * 1000


def main(dst):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW cp AS SELECT unnest(range(0, {COPIES})) AS c")

    def copy_out(name, sql):
        if TABLES is not None and name not in TABLES:
            return
        con.sql(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    for t in ("region", "nation"):
        copy_out(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    cust_s = stride_for(con, "customer", "c_custkey")
    supp_s = stride_for(con, "supplier", "s_suppkey")
    part_s = stride_for(con, "part", "p_partkey")
    ord_s = stride_for(con, "orders", "o_orderkey")
    ev_s = stride_for(con, "events", "event_id")
    usr_s = stride_for(con, "events", "user_id")
    doc_s = stride_for(con, "documents", "doc_id")
    vec_s = stride_for(con, "embeddings", "vec_id")

    copy_out("customer", f"""
        SELECT c_custkey + c*{cust_s} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', cp""")
    copy_out("supplier", f"""
        SELECT s_suppkey + c*{supp_s} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet', cp""")
    copy_out("part", f"""
        SELECT p_partkey + c*{part_s} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM '{SRC}/part.parquet', cp""")
    copy_out("orders", f"""
        SELECT o_orderkey + c*{ord_s} AS o_orderkey,
               o_custkey + c*{cust_s} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', cp""")
    copy_out("lineitem", f"""
        SELECT l_orderkey + c*{ord_s} AS l_orderkey,
               l_partkey + c*{part_s} AS l_partkey,
               l_suppkey + c*{supp_s} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', cp""")
    copy_out("events", f"""
        SELECT event_id + c*{ev_s} AS event_id, ts,
               user_id + c*{usr_s} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet', cp""")
    copy_out("documents", f"""
        WITH w AS (
          SELECT doc_id, lang, source, c,
                 list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
          FROM '{SRC}/documents.parquet', cp),
        m AS (
          SELECT doc_id + c*{doc_s} AS doc_id,
                 CASE WHEN c = 0 THEN array_to_string(ws, ' ')
                      ELSE array_to_string(
                        list_transform(ws, w -> w || '~' || c), ' ')
                 END AS text,
                 lang, source
          FROM w)
        SELECT doc_id, text, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM m""")
    copy_out("embeddings", f"""
        SELECT vec_id + c*{vec_s} AS vec_id,
               CAST(list_transform(range(1, len(embedding) + 1), j ->
                 embedding[j] * (CASE WHEN c = 0 OR hash(c * 1000 + j) % 2 = 0
                                      THEN 1 ELSE -1 END)) AS FLOAT[]) AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', cp""")


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--src" in args:
        i = args.index("--src")
        SRC = args[i + 1]
        del args[i:i + 2]
    if "--copies" in args:
        i = args.index("--copies")
        COPIES = int(args[i + 1])
        del args[i:i + 2]
    if "--tables" in args:
        i = args.index("--tables")
        TABLES = set(args[i + 1].split(","))
        del args[i:i + 2]
    main(args[0] if args else "/tmp/sf1")
