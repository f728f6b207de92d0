#!/usr/bin/env python3
"""Independent sf1 fixture generator (driver-side tooling, not engine code).

Round-9 verdict item 4: the previous third-scale fixture was 10
key-shifted COPIES of sf0.1 — adversarial for dedup truths (every doc a
10-way near-dup; closure/ER oracles explode combinatorially). This
script synthesizes a GENUINELY independent sf1 in /tmp/sf1fresh: fresh
keys, fresh FK wiring, fresh hash-drawn text with a SPARSE planted
duplicate rate (0.2% exact dups — 100 pairs at 50k docs, the same order
as sf0.1's 8 groups at 5k), and embeddings with the same weak 10-label
cluster geometry (unit-norm, within-label cosine ~0.06). Value DOMAINS
are inherited from sf0.1 by hash-sampling source attribute tuples, so
literal-filtering queries (ship-date ranges, event types, market
segments) stay non-degenerate; the engine and the DuckDB oracle read
the same parquet either way, so the sweep checks engine-vs-oracle at
10x volume on a corpus whose dedup/graph truths are tractable.

Deterministic: duckdb hash() + a fixed numpy seed. One parquet FILE per
table (compare.py's DuckDB views want files, not directories).

Usage: python3 tools/make_sf1.py [outDir=/tmp/sf1fresh]
"""
import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1fresh"

N_CUST, N_SUPP, N_PART = 150_000, 10_000, 200_000
N_ORDERS, N_EVENTS = 1_500_000, 1_000_000
N_DOCS, N_EMB = 50_000, 20_000


def main():
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    con = duckdb.connect()
    con.execute(f"PRAGMA threads=16; PRAGMA temp_directory='{OUT}/.duck_tmp'")

    def copy(sql, name):
        con.execute(
            f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n}")

    # tiny dimensions: the domain IS the table
    copy(f"SELECT * FROM '{SRC}/region.parquet'", "region")
    copy(f"SELECT * FROM '{SRC}/nation.parquet'", "nation")

    # source tables with a stable row number for hash-sampling
    for t in ["customer", "supplier", "part", "orders", "lineitem",
              "events"]:
        con.execute(
            f"CREATE VIEW src_{t} AS SELECT *, row_number() OVER () - 1 "
            f"AS rn FROM '{SRC}/{t}.parquet'")
    n_src = {t: con.execute(f"SELECT count(*) FROM src_{t}").fetchone()[0]
             for t in ["customer", "supplier", "part", "orders",
                       "lineitem", "events"]}

    # fresh keys 0..N-1, attributes hash-sampled from source tuples
    copy(f"""
      SELECT i AS c_custkey,
             'Customer#' || lpad(i::VARCHAR, 9, '0') AS c_name,
             s.c_nationkey, s.c_acctbal, s.c_mktsegment
      FROM range({N_CUST}) t(i)
      JOIN src_customer s ON s.rn = hash(i * 31 + 7) % {n_src['customer']}
    """, "customer")
    copy(f"""
      SELECT i AS s_suppkey,
             'Supplier#' || lpad(i::VARCHAR, 9, '0') AS s_name,
             s.s_nationkey, s.s_acctbal
      FROM range({N_SUPP}) t(i)
      JOIN src_supplier s ON s.rn = hash(i * 37 + 11) % {n_src['supplier']}
    """, "supplier")
    copy(f"""
      SELECT i AS p_partkey, s.p_name, s.p_brand, s.p_type, s.p_size,
             s.p_retailprice
      FROM range({N_PART}) t(i)
      JOIN src_part s ON s.rn = hash(i * 41 + 13) % {n_src['part']}
    """, "part")

    # orders: fresh keys + fresh FK wiring; each new order REMEMBERS its
    # source order so lineitem can inherit the per-order line structure
    con.execute(f"""
      CREATE TABLE orders_gen AS
      SELECT i AS o_orderkey,
             (hash(i * 43 + 17) % {N_CUST})::BIGINT AS o_custkey,
             s.o_orderstatus, s.o_totalprice, s.o_orderdate,
             s.o_orderpriority, s.o_orderkey AS src_orderkey
      FROM range({N_ORDERS}) t(i)
      JOIN src_orders s ON s.rn = hash(i * 47 + 19) % {n_src['orders']}
    """)
    copy("SELECT * EXCLUDE (src_orderkey) FROM orders_gen", "orders")
    # lineitem: the source order's lines (same count, same measures/
    # dates/flags), re-keyed to the new order with fresh part/supp FKs
    copy(f"""
      SELECT o.o_orderkey AS l_orderkey,
             (hash(o.o_orderkey * 53 + sl.l_linenumber * 59 + 23)
               % {N_PART})::BIGINT AS l_partkey,
             (hash(o.o_orderkey * 61 + sl.l_linenumber * 67 + 29)
               % {N_SUPP})::BIGINT AS l_suppkey,
             sl.l_linenumber, sl.l_quantity, sl.l_extendedprice,
             sl.l_discount, sl.l_tax, sl.l_returnflag, sl.l_linestatus,
             sl.l_shipdate
      FROM orders_gen o
      JOIN src_lineitem sl ON sl.l_orderkey = o.src_orderkey
    """, "lineitem")

    # events: fresh ids/users/timestamps, source-sampled types/values
    copy(f"""
      SELECT i AS event_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + to_microseconds((hash(i * 71 + 31)
                 % 2592000000000::BIGINT)::BIGINT) AS ts,
             (hash(i * 73 + 37) % 15000)::BIGINT AS user_id,
             s.event_type, s.value,
             '{{"k": ' || (hash(i * 79 + 41) % 100)::VARCHAR || '}}'
               AS props
      FROM range({N_EVENTS}) t(i)
      JOIN src_events s ON s.rn = hash(i * 83 + 43) % {n_src['events']}
    """, "events")

    # documents: sf0.1's 31-word vocabulary EXTENDED to 64 words so the
    # trigram-shingle document frequency stays at sf0.1's density (~10
    # docs/shingle) at 10x the corpus — with the original 31 words the
    # uniform draw packed ~90 docs onto every shingle and the
    # near-dup-candidate space exploded 78x (99.7M pairs vs the natural
    # 10x scale of ~13M; measured). Real literal-keyword queries still
    # hit: all 31 source words remain. Docs are 10-100 hash-drawn words;
    # id % 500 == 1 duplicates its predecessor (sparse planted truth —
    # ~100 pairs, closure oracles stay tractable).
    vocab = [r[0] for r in con.execute(f"""
      SELECT DISTINCT unnest(string_split(text, ' ')) w
      FROM '{SRC}/documents.parquet' ORDER BY 1""").fetchall()]
    vocab = vocab + [f"term{i}" for i in range(64 - len(vocab))]
    vocab_lit = "[" + ",".join(f"'{w}'" for w in vocab) + "]"
    copy(f"""
      WITH seeded AS (
        SELECT i AS doc_id,
               CASE WHEN i % 500 = 1 THEN i - 1 ELSE i END AS seed
        FROM range({N_DOCS}) t(i)),
      texted AS (
        SELECT doc_id,
               array_to_string(list_transform(
                 range(1, 11 + (hash(seed * 89 + 47) % 91)::INT),
                 j -> {vocab_lit}[1 + (hash(seed * 1000003 + j * 97 + 53)
                               % {len(vocab)})::INT]), ' ') AS text,
               seed
        FROM seeded)
      SELECT doc_id, text,
             CASE (hash(seed * 101 + 59) % 20)
               WHEN 8 THEN 'de' WHEN 9 THEN 'de' WHEN 10 THEN 'de'
               WHEN 11 THEN 'es' WHEN 12 THEN 'es' WHEN 13 THEN 'es'
               WHEN 14 THEN 'fr' WHEN 15 THEN 'fr' WHEN 16 THEN 'fr'
               WHEN 17 THEN 'zh' WHEN 18 THEN 'zh' WHEN 19 THEN 'zh'
               ELSE 'en' END AS lang,
             'src' || (hash(seed * 103 + 61) % 20)::VARCHAR AS source,
             length(text) AS n_chars
      FROM texted
    """, "documents")

    # embeddings: unit-norm float32, 10 weak label clusters (within-label
    # cosine ~0.06 like sf0.1 — enough structure for IVF cells to skew)
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = (rng.integers(0, 10, size=N_EMB)).astype(np.int32)
    emb = 0.25 * centers[labels] + rng.normal(size=(N_EMB, 64))
    emb = (emb / np.linalg.norm(emb, axis=1, keepdims=True)).astype(
        np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(N_EMB, dtype=np.int64)),
        "embedding": pa.array(list(emb),
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    })
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")
    print(f"embeddings: {N_EMB}")
    if os.path.exists(f"{OUT}/.duck_tmp"):
        shutil.rmtree(f"{OUT}/.duck_tmp")
    print(f"DONE {OUT}")


if __name__ == "__main__":
    main()
