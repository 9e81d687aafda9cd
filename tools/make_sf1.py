#!/usr/bin/env python3
"""Deterministic 10x scale-up of an sf0.1 fixture dir into an sf1 dir.

Harness-side tooling (like check_oracle.py): generates the one-scale-up
data point the sf0.1 gate cannot provide. The scaled corpus preserves the
properties the operators' scale posture depends on:

  - referential integrity: every copy k offsets ALL keys consistently
    (custkey/orderkey/partkey/suppkey/user_id/doc_id/vec_id), so joins
    match within a copy and never across copies; dims (region, nation)
    stay fixed.
  - linear near-dup structure: document copies k>0 prefix every word
    with `c<k>`, giving each copy a disjoint token space. Per-shingle
    document frequency is therefore IDENTICAL in every copy and total
    near-dup pair volume scales linearly with the corpus - the way a
    truly larger corpus behaves - instead of quadratically in the copy
    count (what verbatim duplication would do).
  - constant embedding block sizes: vector copies get fresh labels
    (label + 1000k), matching how a finer coarse quantizer keeps cell
    sizes bounded as the corpus grows; vectors get a tiny deterministic
    per-(id, dim) perturbation so no cross-copy exact ties exist.
  - events keep their TIMESTAMP(NANOS) at-rest shape (pyarrow copy;
    DuckDB would truncate to microseconds) with event_id/user_id offsets
    per copy - per-user history length, session structure and key skew
    are preserved, the user population grows 10x.

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [copies]
"""
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def main():
    import os

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    def src(t):
        return f"'{SRC}/{t}.parquet'"

    def off(t, key):
        # key offset stride: pow10 above the current max, so copies never collide
        mx = con.sql(f"SELECT max({key}) FROM {src(t)}").fetchone()[0]
        stride = 10 ** len(str(int(mx)))
        return stride

    def copy_union(t, select_k):
        """UNION ALL of select_k(k) for k in range(COPIES) -> DST/t.parquet."""
        union = "\nUNION ALL\n".join(select_k(k) for k in range(COPIES))
        con.sql(f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n0 = con.sql(f"SELECT count(*) FROM {src(t)}").fetchone()[0]
        n1 = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        assert n1 == COPIES * n0, (t, n0, n1)
        print(f"{t}: {n0} -> {n1}")

    # dims stay fixed
    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM {src(t)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied verbatim")

    cust = off("customer", "c_custkey")
    supp = off("supplier", "s_suppkey")
    part = off("part", "p_partkey")
    okey = off("orders", "o_orderkey")

    copy_union("customer", lambda k: f"""
        SELECT c_custkey + {k * cust} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment FROM {src('customer')}""")
    copy_union("supplier", lambda k: f"""
        SELECT s_suppkey + {k * supp} AS s_suppkey, s_name, s_nationkey,
               s_acctbal FROM {src('supplier')}""")
    copy_union("part", lambda k: f"""
        SELECT p_partkey + {k * part} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice FROM {src('part')}""")
    copy_union("orders", lambda k: f"""
        SELECT o_orderkey + {k * okey} AS o_orderkey,
               o_custkey + {k * cust} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}""")
    copy_union("lineitem", lambda k: f"""
        SELECT l_orderkey + {k * okey} AS l_orderkey,
               l_partkey + {k * part} AS l_partkey,
               l_suppkey + {k * supp} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}""")

    doc = off("documents", "doc_id")
    bs = "\\"

    def doc_text(k):
        # every word gets a copy-marker prefix -> disjoint token spaces
        return f"regexp_replace(text, '({bs}S+)', 'c{k}{bs}1', 'g')"

    copy_union("documents", lambda k: f"""
        SELECT doc_id + {k * doc} AS doc_id,
               {"text" if k == 0 else doc_text(k)} AS text,
               lang, source,
               {"n_chars" if k == 0 else f"CAST(length({doc_text(k)}) AS BIGINT)"} AS n_chars
        FROM {src('documents')}""")

    vec = off("embeddings", "vec_id")
    copy_union("embeddings", lambda k: f"""
        SELECT vec_id + {k * vec} AS vec_id,
               {"embedding" if k == 0 else
                "CAST(list_transform(embedding, x -> x + CAST(0.001 * sin(vec_id + "
                f"{k}) AS FLOAT)) AS FLOAT[])"} AS embedding,
               label + {k * 1000} AS label
        FROM {src('embeddings')}""")

    # events via pyarrow: preserves TIMESTAMP(NANOS) at-rest bit-exactly
    t = pq.read_table(f"{SRC}/events.parquet")
    emax = pc.max(t.column("event_id")).as_py()
    umax = pc.max(t.column("user_id")).as_py()
    estride = 10 ** len(str(int(emax)))
    ustride = 10 ** len(str(int(umax)))
    parts = []
    for k in range(COPIES):
        tk = t.set_column(
            t.schema.get_field_index("event_id"), "event_id",
            pc.add(t.column("event_id"), k * estride))
        tk = tk.set_column(
            tk.schema.get_field_index("user_id"), "user_id",
            pc.add(tk.column("user_id"), k * ustride))
        parts.append(tk)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/events.parquet")
    assert out.num_rows == COPIES * t.num_rows
    assert out.schema.field("ts").type == t.schema.field("ts").type
    print(f"events: {t.num_rows} -> {out.num_rows} (ts type {out.schema.field('ts').type})")


if __name__ == "__main__":
    main()
