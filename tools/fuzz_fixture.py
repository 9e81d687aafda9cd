#!/usr/bin/env python3
"""Adversarial oracle-gate fixture generator.

Usage: python3 tools/fuzz_fixture.py <outDir> [seed]

Writes a tiny fixture with the exact driver schemas but concentrated
edge cases — trailing-zero cents, negative balances, duplicate
(user, microsecond) event ties, window/bucket boundary timestamps,
zero-length and boundary texts, zero/identical embedding vectors —
while honoring the documented corpus contracts (ASCII, single-space
separated, 2-decimal money). Run `graft.Verify <outDir> <dump>` +
check_oracle.py over it: every red line is either a real cross-engine
divergence or an undocumented contract. Dev tooling only.
"""
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def write(out, name, data, schema):
    pq.write_table(pa.table(data, schema=schema), f"{out}/{name}.parquet")


def main(out, seed=1337):
    rng = random.Random(seed)
    import os
    os.makedirs(out, exist_ok=True)

    write(out, "region",
          {"r_regionkey": [0, 1], "r_name": ["R_A", "R_B"]},
          pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))
    write(out, "nation",
          {"n_nationkey": [0, 1, 2], "n_name": ["N_0", "N_1", "N_2"],
           "n_regionkey": [0, 0, 1]},
          pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                     ("n_regionkey", pa.int32())]))

    # customers: negative / zero / trailing-zero-cent balances; customer 9
    # places no orders (anti-join), customer 1 is the hot key
    ckeys = list(range(1, 10))
    write(out, "customer",
          {"c_custkey": ckeys,
           "c_name": [f"cust{k}" for k in ckeys],
           "c_nationkey": [k % 3 for k in ckeys],
           "c_acctbal": [-999.99, -0.01, 0.0, 0.10, 100.00, 4999.50,
                         123.45, 0.05, 7777.70],
           "c_mktsegment": ["SEG_A", "SEG_B"][:1] * 5 + ["SEG_B"] * 4},
          pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                     ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                     ("c_mktsegment", pa.string())]))
    write(out, "supplier",
          {"s_suppkey": [1, 2, 3], "s_name": ["s1", "s2", "s3"],
           "s_nationkey": [0, 1, 2], "s_acctbal": [0.0, -5.50, 10.10]},
          pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                     ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))
    write(out, "part",
          {"p_partkey": [1, 2, 3, 4], "p_name": ["pa", "pb", "pc", "pd"],
           "p_brand": ["B1", "B1", "B2", "B2"],
           "p_type": ["t1", "t2", "t1", "t2"], "p_size": [1, 2, 3, 4],
           "p_retailprice": [0.01, 10.00, 99999.99, 50.50]},
          pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                     ("p_brand", pa.string()), ("p_type", pa.string()),
                     ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

    # orders: money with trailing-zero cents and magnitudes; dates straddle
    # the q1/q2/q6 cutoffs; duplicate order dates per customer (q7 ties
    # broken by orderkey); hot customer 1
    n_orders = 120
    okeys = list(range(1, n_orders + 1))
    prices = []
    for k in okeys:
        prices.append(rng.choice(
            [0.01, 0.10, 1.00, 99.90, 100.00, 12345.60, 99999.99,
             50000.50, round(rng.uniform(1, 500000), 2)]))
    dates = []
    for k in okeys:
        y = rng.choice([1995, 1998, 1999, 2000, 2001])
        dates.append((y - 1970) * 31536000000 + (k % 360) * 86400000)
    write(out, "orders",
          {"o_orderkey": okeys,
           "o_custkey": [1 if k % 3 == 0 else (k % 8) + 1 for k in okeys],
           "o_orderstatus": [rng.choice(["F", "O", "P"]) for _ in okeys],
           "o_totalprice": prices,
           "o_orderdate": pa.array(dates, pa.timestamp("ms")),
           "o_orderpriority": [rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM",
                                           "4-NOT SPECIFIED"]) for _ in okeys]},
          pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                     ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                     ("o_orderdate", pa.timestamp("ms")),
                     ("o_orderpriority", pa.string())]))

    # lineitem: every discount/tax step; quantity extremes incl. the q4
    # threshold; prices that make disc/charge land on .xx50 half-points
    rows = []
    ln = 0
    for ok in okeys:
        for i in range(1, rng.choice([1, 2, 3, 4]) + 1):
            ln += 1
            price = rng.choice(
                [100.00, 0.02, 12.50, 45000.00, 99999.99,
                 round(rng.uniform(1, 100000), 2)])
            rows.append((ok, (ln % 4) + 1, (ln % 3) + 1, i,
                         float(rng.choice([1, 44, 45, 49, 50])),
                         price,
                         round((ln % 11) * 0.01, 2),
                         round((ln % 9) * 0.01, 2),
                         rng.choice(["A", "N", "R"]),
                         rng.choice(["F", "O"]),
                         (28 + (ln % 5)) * 31536000000 + (ln % 300) * 86400000))
    cols = list(zip(*rows))
    write(out, "lineitem",
          {"l_orderkey": list(cols[0]), "l_partkey": list(cols[1]),
           "l_suppkey": list(cols[2]), "l_linenumber": list(cols[3]),
           "l_quantity": list(cols[4]), "l_extendedprice": list(cols[5]),
           "l_discount": list(cols[6]), "l_tax": list(cols[7]),
           "l_returnflag": list(cols[8]), "l_linestatus": list(cols[9]),
           "l_shipdate": pa.array(list(cols[10]), pa.timestamp("ms"))},
          pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                     ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                     ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
                     ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                     ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                     ("l_shipdate", pa.timestamp("ms"))]))

    # events: nanos timestamps with (a) exact duplicate (user, ns),
    # (b) same-microsecond distinct nanos (the q36 tie class),
    # (c) exact 300 s bucket boundaries (q52), (d) exact 30-min gaps
    # (q46 boundary), (e) exact 1-hour range edges (q44); 2-decimal values
    # including trailing zeros; negative and large json k
    ev = []
    base = 1704067200_000_000_000  # 2024-01-01 in ns
    eid = 0
    for u in range(1, 6):
        t = base + u * 1_000_000_000
        for (dns, typ) in [
            (0, "signup"), (0, "click"),          # same instant as signup
            (500, "signup"),                      # same µs, different ns
            (999, "click"),
            (300 * 1_000_000_000, "click"),       # exact 5-min bucket edge
            (1800 * 1_000_000_000, "click"),      # exact 30-min gap
            (1800 * 1_000_000_000 + 1000, "view"),
            (3600 * 1_000_000_000, "click"),      # exact 1-hour range edge
            (7200 * 1_000_000_000, "purchase"),
        ]:
            eid += 1
            ev.append((eid, t + dns, u, typ,
                       rng.choice([0.10, 1.00, 29.90, 100.00, 55.55,
                                   round(rng.uniform(0, 500), 2)]),
                       '{"k": %d}' % rng.choice([-17, -1, 0, 5, 123456789])))
    ecols = list(zip(*ev))
    write(out, "events",
          {"event_id": list(ecols[0]),
           "ts": pa.array(list(ecols[1]), pa.timestamp("ns")),
           "user_id": list(ecols[2]), "event_type": list(ecols[3]),
           "value": list(ecols[4]), "props": list(ecols[5])},
          pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("ns")),
                     ("user_id", pa.int64()), ("event_type", pa.string()),
                     ("value", pa.float64()), ("props", pa.string())]))

    # documents: ASCII, single-space contract; empty / 1-2-3-word
    # boundaries; exact duplicates; heavy repetition; shared shingles;
    # punctuation and contraction tokens for the pre-tokenizer
    docs = [
        "",                                        # empty (0 tokens)
        "x",                                       # 1 word
        "two words",                               # 2 words
        "a b c",                                   # exactly 3
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",   # exact dup
        "x y x y x y x y x y",                     # heavy repetition
        "don't stop 42 now!! it's a fine day",
        "a a a a a a a a",                         # single-token repetition
        "numbers 123 456 789 0 mixed a1b2 c3d4",
        # PII-shaped tokens (q191): email, phone, SSN-like, IPv4-like,
        # plus near-misses (bad TLD-less email, 3-3-3 number) that must
        # NOT count in either regex engine
        "reach j.doe+spam@ex-ample.org or 555-123-4567 id 123-45-6789 "
        "host 10.0.0.255 bad@nodot num 123-456-789",
    ]
    while len(docs) < 40:
        docs.append(" ".join(rng.choice(
            ["alpha", "beta", "gamma", "delta", "the", "a", "it's",
             "42", "x", "done."]) for _ in range(rng.randint(3, 30))))
    write(out, "documents",
          {"doc_id": list(range(len(docs))), "text": docs,
           "lang": [rng.choice(["en", "de", "fr"]) for _ in docs],
           "source": [rng.choice(["web", "book"]) for _ in docs],
           "n_chars": [len(t) for t in docs]},
          pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                     ("lang", pa.string()), ("source", pa.string()),
                     ("n_chars", pa.int64())]))

    # embeddings: identical vectors (cosine ties at 1.0), near-identical,
    # orthogonal; labels spread so blocks stay small. vec 0 is the ANN
    # query vector and must have a nonzero norm (documented engine
    # contract: cosine against a zero-norm query is undefined in ANY
    # engine); a zero vector elsewhere exercises the NaN/NULL edge.
    # 64-dim to match the engine's fixed PQ (8x8) and SRP (64-plane)
    # geometry — an 8-dim fixture would route q59/q60 through a degenerate
    # empty-slice path the dimension guard now rejects outright
    dim = 64
    vecs, labels = [], []
    unit = [1.0] + [0.0] * (dim - 1)
    vecs.append(unit); labels.append(0)                   # query vector
    vecs.append(list(unit)); labels.append(0)             # identical → cos 1
    vecs.append([0.999] + [0.01] * (dim - 1)); labels.append(0)
    vecs.append([0.0] * (dim - 1) + [1.0]); labels.append(1)  # orthogonal
    for i in range(28):
        v = [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
        vecs.append(v); labels.append(i % 4)
    write(out, "embeddings",
          {"vec_id": list(range(len(vecs))),
           "embedding": pa.array([[float(x) for x in v] for v in vecs],
                                 pa.list_(pa.float32())),
           "label": pa.array(labels, pa.int32())},
          pa.schema([("vec_id", pa.int64()),
                     ("embedding", pa.list_(pa.float32())),
                     ("label", pa.int32())]))
    print(f"wrote fuzz fixture to {out}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1337)
