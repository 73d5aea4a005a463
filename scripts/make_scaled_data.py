#!/usr/bin/env python
"""Build a scaled copy of the driver's sf0.1 testdata for builder-side
perf measurement (the driver generates its own large SF for the official
round-end bench; this mirrors its shape so optimizations can be validated
at the escalated size before the driver runs).

Method: replicate sf0.1 K times with per-replica key offsets so every
foreign-key relationship is preserved inside each replica and cardinalities
scale linearly.  Replica 0 is byte-identical to the source; replicas 1..K-1
are transformed so they do NOT read as near-duplicates of each other:

* documents: every word's characters are rotated by a replica-dependent
  offset.  Within a replica all texts get the SAME transformation, so the
  intra-replica near-dup pair structure (shingle-set Jaccard, winnowing
  overlap) is preserved; across replicas the word vocabularies are disjoint
  for almost all words, so pair counts scale linearly with K instead of
  quadratically.  Character distribution (Amharic ratio, lengths, token
  counts) is unchanged, keeping the language-id / quality / curation
  selectivities intact.
* embeddings: a per-replica signed permutation of the 64 dimensions —
  pairwise cosines within a replica are EXACTLY preserved, cross-replica
  copies decorrelate to noise, so cosine>=tau pair counts scale linearly.

region/nation are dimension tables and stay as-is.

Usage: python scripts/make_scaled_data.py [--k 10] [--src /root/testdata/sf0.1]
       [--dst /root/sf_scaled/sf1.0]
"""

from __future__ import annotations

import argparse
import os

import duckdb

OFFSETS = {
    "customer": ("c_custkey", 100_000),
    "supplier": ("s_suppkey", 10_000),
    "part": ("p_partkey", 100_000),
    "orders": ("o_orderkey", 10_000_000),
    "documents": ("doc_id", 1_000_000),
    "embeddings": ("vec_id", 1_000_000),
    "events": ("event_id", 10_000_000),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/sf_scaled/sf1.0")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    con = duckdb.connect()
    con.execute(f"set threads to {os.cpu_count()}")

    def src(t: str) -> str:
        return f"read_parquet('{args.src}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        out = f"{args.dst}/{t}.parquet"
        con.execute(f"copy ({sql}) to '{out}' (format parquet, compression zstd)")
        n = con.execute(f"select count(*) from read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows")

    for t in ("region", "nation"):
        write(t, f"select * from {src(t)}")

    reps = f"(select unnest(range({args.k})) as _r)"

    write("customer", f"""
        select c_custkey + _r*{OFFSETS['customer'][1]} as c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        from {src('customer')} cross join {reps}""")

    write("supplier", f"""
        select s_suppkey + _r*{OFFSETS['supplier'][1]} as s_suppkey,
               s_name, s_nationkey, s_acctbal
        from {src('supplier')} cross join {reps}""")

    write("part", f"""
        select p_partkey + _r*{OFFSETS['part'][1]} as p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        from {src('part')} cross join {reps}""")

    write("orders", f"""
        select o_orderkey + _r*{OFFSETS['orders'][1]} as o_orderkey,
               o_custkey + _r*{OFFSETS['customer'][1]} as o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        from {src('orders')} cross join {reps}""")

    write("lineitem", f"""
        select l_orderkey + _r*{OFFSETS['orders'][1]} as l_orderkey,
               l_partkey + _r*{OFFSETS['part'][1]} as l_partkey,
               l_suppkey + _r*{OFFSETS['supplier'][1]} as l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        from {src('lineitem')} cross join {reps}""")

    write("events", f"""
        select event_id + _r*{OFFSETS['events'][1]} as event_id,
               ts, user_id + _r*1_000_000 as user_id, event_type, value, props
        from {src('events')} cross join {reps}""")

    # per-word char rotation by (1 + (_r + len) % (len - 1)) for len >= 2:
    # same transformation for every text in a replica (structure-preserving),
    # replica-dependent (cross-replica words disjoint for most lengths)
    write("documents", f"""
        select doc_id + _r*{OFFSETS['documents'][1]} as doc_id,
               case when _r = 0 then text
                    else list_aggregate(list_transform(
                        string_split(text, ' '),
                        w -> case when length(w) < 2 then w
                             else substr(w, 2 + (_r + length(w)) % (length(w) - 1))
                                  || substr(w, 1, 1 + (_r + length(w)) % (length(w) - 1))
                             end), 'string_agg', ' ')
               end as text,
               lang, source, n_chars
        from {src('documents')} cross join {reps}""")

    # per-replica signed permutation of the embedding dims: rotate the
    # coordinate list by 7*_r and flip the sign of coordinates whose
    # (rotated index + _r) is congruent 0 mod 3
    write("embeddings", f"""
        select vec_id + _r*{OFFSETS['embeddings'][1]} as vec_id,
               case when _r = 0 then embedding
                    else list_transform(range(1, len(embedding)+1),
                        i -> cast(embedding[1 + (i - 1 + 7*_r) % len(embedding)]
                             * (case when (i + _r) % 3 = 0 then -1 else 1 end)
                             as float))
               end as embedding,
               label
        from {src('embeddings')} cross join {reps}""")

    open(os.path.join(args.dst, "_DONE"), "w").close()
    print("done:", args.dst)


if __name__ == "__main__":
    main()
