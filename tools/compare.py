#!/usr/bin/env python3
"""Local pre-verification harness (driver-side tooling, not engine code).

Mimics the driver's correctness gate: run graft.Verify first (writes each
SparkEntry query result as parquet + oracle_sql.json), then this script runs
every oracle SQL in DuckDB over the same tables and compares.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import os
import re
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


# The dedup-cluster oracles close over the match graph with a recursive
# CTE (reach = every (node, reachable-node) pair). Correct, and fine at
# sf0.01/sf0.1 — but reach is QUADRATIC per component, so a large-fixture
# sweep grinds for >17 min on a graph the engine labels in seconds
# (round-8 exempted d08+ for exactly this). When the oracle matches the
# shared reach/lab idiom, replay the closure ITERATIVELY instead:
# materialize the edge list once, then min-label propagation via temp
# tables — one bounded join per round, converging in O(component
# diameter) rounds. Same truth (component minimum per node), bounded
# cost. Anything not matching the idiom runs verbatim.
#
# The idiom may appear PREFIXED and MORE THAN ONCE (d25 composes a
# prior-slice closure `p…` with a full-corpus closure `f…` in one
# query): every occurrence is rewritten — each chain's edge CTEs
# materialize once, its reach/lab pair is REPLACED in the SQL by a lab
# CTE reading the iterated temp table, and the search repeats until no
# chain remains.
_REACH_LAB = re.compile(
    r"(?P<p>[A-Za-z_]*)reach AS \(SELECT s AS id, d AS r FROM (?P=p)e\s+"
    r"UNION SELECT (?P=p)reach\.id, (?P=p)e\.d"
    r" FROM (?P=p)reach JOIN (?P=p)e ON (?P=p)reach\.r = (?P=p)e\.s\),"
    r"\s*(?P=p)lab AS \(SELECT id, min\(r\) AS m FROM (?P=p)reach"
    r" GROUP BY id\),?\s*",
    re.S)


def _iterate_closure(con, edges_tbl: str, lab_tbl: str):
    con.execute(f"CREATE TEMP TABLE {lab_tbl} AS "
                f"SELECT s AS id, min(d) AS m FROM {edges_tbl} GROUP BY s")
    for _ in range(64):  # >= any real component diameter here
        con.execute(f"""
          CREATE TEMP TABLE {lab_tbl}2 AS
          SELECT l.id, least(l.m, coalesce(min(r.m), l.m)) AS m
          FROM {lab_tbl} l
          LEFT JOIN {edges_tbl} e2 ON e2.s = l.id
          LEFT JOIN {lab_tbl} r ON r.id = e2.d
          GROUP BY l.id, l.m""")
        changed = con.execute(
            f"SELECT count(*) FROM {lab_tbl}2 j JOIN {lab_tbl} o "
            "ON j.id = o.id AND j.m <> o.m").fetchone()[0]
        con.execute(f"DROP TABLE {lab_tbl}")
        con.execute(f"ALTER TABLE {lab_tbl}2 RENAME TO {lab_tbl}")
        if changed == 0:
            return
    raise RuntimeError("iterative closure did not converge")


def run_oracle(con, sql: str):
    temps = []
    try:
        while True:
            m = _REACH_LAB.search(sql)
            if m is None:
                return con.sql(sql).arrow().combine_chunks()
            p = m.group("p")
            prefix, suffix = sql[: m.start()].rstrip(), sql[m.end():]
            if prefix.endswith(","):
                prefix = prefix[:-1]
            e_tbl, lab_tbl = f"_graft_e_{p}x", f"_graft_lab_{p}x"
            for t in (e_tbl, lab_tbl):
                con.execute(f"DROP TABLE IF EXISTS {t}")
            # the first match's prefix contains no reach/lab idiom (any
            # earlier chain was already replaced by a table-backed lab
            # CTE), so it is runnable as-is to materialize this chain's
            # edge list; unused CTEs in it cost nothing (lazy)
            con.execute(
                f"CREATE TEMP TABLE {e_tbl} AS {prefix}"
                f" SELECT s, d FROM {p}e")
            _iterate_closure(con, e_tbl, lab_tbl)
            temps += [e_tbl, lab_tbl]
            sql = (prefix +
                   f", {p}lab AS (SELECT id, m FROM {lab_tbl}),\n" + suffix)
    finally:
        for t in temps:
            con.execute(f"DROP TABLE IF EXISTS {t}")


def fresh_con(sf_dir: str):
    """One connection per query: DuckDB's spill files live for the
    CONNECTION, so a long sweep accumulates every prior query's temp
    blocks — round-9's sf1 sweep hit 53 GB of residual spill by q75 and
    the graph replays ran out of disk. A per-query connection resets the
    pool; view creation costs microseconds. Explicit temp dir + memory
    budget stay (oracle-side resource knobs, invisible to results)."""
    con = duckdb.connect()
    tmp = os.environ.get("GRAFT_DUCK_TMP", "/tmp/graft_duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"PRAGMA temp_directory='{tmp}'")
    con.execute(
        f"PRAGMA memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '24GB')}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main(sf_dir: str, out_dir: str) -> int:
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            con = fresh_con(sf_dir)
            duck = canon(run_oracle(con, sql))
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
        finally:
            try:
                con.close()
            except Exception:  # noqa: BLE001
                pass
    print(f"\n{n_ok} ok, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
