#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's DuckDB-oracle compare.

NOT part of the shipped library (the engine is pure Scala/Spark); this
script exists so every SparkEntry query can be validated locally before
the round gate. Usage:

    python3 tools/check.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name> parquet dir with an entry in
oracle_sql.json: run the SQL in DuckDB against <sfDir>/<table>.parquet
views, sort columns by name and rows by value, and compare cell-wise.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    ordered = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in ordered))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in ordered], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def type_lint(con, name, sql, out_dir):
    """The driver's hash compare is TYPE-sensitive even when norm()
    below would equate the values (round-4 lesson: a bare list_sum
    types as HUGEINT and every row goes red driver-side while this
    harness stays green). Describe both sides and fail on HUGEINT or
    any spark-vs-oracle type divergence, so the class dies locally.
    """
    errs = []
    g = dict(
        (r[0], r[1]) for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetchall())
    e = dict((r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall())
    for col, typ in sorted(e.items()):
        if "HUGEINT" in typ.upper():
            errs.append(f"oracle col {col} is {typ} (cast it in the SQL)")
        elif col in g and g[col] != typ:
            errs.append(f"col {col}: spark {g[col]} != oracle {typ}")
    return errs


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            lint = type_lint(con, name, sql, out_dir)
            if lint:
                print(f"FAIL {name}: type lint: {'; '.join(lint)}")
                n_fail += 1
                continue
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
            exp = con.execute(sql)
            e_cols = [d[0] for d in exp.description]
            e_rows = exp.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: exec error: {ex}")
            n_fail += 1
            continue
        gc, gr = canon(g_rows, g_cols)
        ec, er = canon(e_rows, e_cols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            n_fail += 1
        elif gr != er:
            diffs = [(a, b) for a, b in zip(gr, er) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: "
                  f"{diffs[0][0]} != {diffs[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
