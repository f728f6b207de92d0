#!/usr/bin/env python3
"""Local pre-verification harness (driver-side tooling, not engine code).

Mimics the driver's correctness gate: run graft.Verify first (writes each
SparkEntry query result as parquet + oracle_sql.json), then this script runs
every oracle SQL in DuckDB over the same tables and compares.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(tbl: pa.Table) -> pa.Table:
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    # Driver-like value normalization (round-1 lesson): the driver's hash
    # sees decimals as floats (Decimal('38.50') vs 38.5 stringify apart)
    # and timestamps as tz-naive — normalize here so this local gate
    # predicts the driver's verdict instead of silently passing exact
    # arrow forms the driver would flag.
    fields = []
    for f in tbl.schema:
        t = f.type
        if pa.types.is_decimal(t):
            t = pa.float64()
        elif pa.types.is_timestamp(t) and t.tz is not None:
            t = pa.timestamp(t.unit)
        fields.append(pa.field(f.name, t))
    return tbl.cast(pa.schema(fields))


def cells(tbl: pa.Table):
    return [tuple(str(tbl.column(c)[i].as_py()) for c in tbl.column_names)
            for i in range(tbl.num_rows)]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # Large-fixture sweeps (10x sf0.1): the unrolled graph-replay CTEs
    # (q75/q83) spill; without an explicit temp dir + memory budget the
    # round-8 sweep exhausted the default temp mount mid-oracle. Both are
    # oracle-side resource knobs, invisible to results.
    tmp = os.environ.get("GRAFT_DUCK_TMP", "/tmp/graft_duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"PRAGMA temp_directory='{tmp}'")
    con.execute(
        f"PRAGMA memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '24GB')}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck = canon(con.sql(sql).arrow().combine_chunks())
            spark = canon(pq.read_table(f"{out_dir}/{name}"))
            problems = []
            if duck.column_names != spark.column_names:
                problems.append(
                    f"columns differ: duck={duck.column_names} spark={spark.column_names}")
            else:
                diffs = [f"{f.name}: duck={f.type} spark={spark.schema.field(f.name).type}"
                         for f in duck.schema
                         if spark.schema.field(f.name).type != f.type]
                if diffs:
                    problems.append("types differ: " + "; ".join(diffs))
                if duck.num_rows != spark.num_rows:
                    problems.append(
                        f"rows differ: duck={duck.num_rows} spark={spark.num_rows}")
                elif cells(duck) != cells(spark):
                    dc, sc = cells(duck), cells(spark)
                    bad = [(i, a, b) for i, (a, b) in enumerate(zip(dc, sc)) if a != b][:3]
                    problems.append(f"values differ, first diffs: {bad}")
            if problems:
                n_fail += 1
                print(f"FAIL {name}")
                for p in problems:
                    print(f"     {p}")
            else:
                n_ok += 1
                print(f"ok   {name} ({duck.num_rows} rows)")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    print(f"\n{n_ok} ok, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
