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
import glob
import json
import math
import os
import re
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


INT64_MAX = 9223372036854775807
EXACT_DOUBLE = 9007199254740992  # 2^53


def rep_lint(con, name, out_dir):
    """Shape/range lint on the SPARK OUTPUT itself (round-5 lessons).
    The driver's typed hash fails on VALUES outside int64 even when
    both engines agree on type and value (c28: DECIMAL(38,0)
    checksums ~2.6e19 went red while the cells compared identical),
    and its pandas row canonicalization crashes outright on array
    cells, recording nothing at all for the query (q46). Both classes
    are invisible to the oracle compare below, so lint every dumped
    query dir — including rows-only queries with no oracle entry.
    """
    errs = []
    path = f"{out_dir}/{name}/*.parquet"
    desc = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{path}')").fetchall()
    for row in desc:
        col, typ = row[0], row[1]
        t = typ.upper()
        if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST", "UNION")):
            errs.append(
                f"col {col} is {typ}: array/nested output crashes the "
                "driver's row sort (emit scalars or array_join)")
            continue
        m = re.match(r"DECIMAL\((\d+)", t)
        if m and int(m.group(1)) > 18:
            errs.append(f"col {col} is {typ}: wider than int64-safe "
                        "DECIMAL(18) — reduce the range (mod 2^60 / "
                        "bit_xor) or cast")
        if (("INT" in t and "INTERVAL" not in t) or "DECIMAL" in t
                or "DOUBLE" in t or "FLOAT" in t):
            mx = con.execute(
                f'SELECT max(abs("{col}")) FROM read_parquet(\'{path}\') '
                f'WHERE "{col}" IS NOT NULL').fetchone()[0]
            if mx is None:
                continue
            if float(mx) > float(INT64_MAX):
                errs.append(f"col {col}: max |value| {mx} exceeds int64")
            elif "DOUBLE" in t or "FLOAT" in t:
                all_int = con.execute(
                    f'SELECT bool_and("{col}" = trunc("{col}")) FROM '
                    f"read_parquet('{path}') "
                    f'WHERE "{col}" IS NOT NULL AND NOT isnan("{col}")'
                ).fetchone()[0]
                if all_int and float(mx) > float(EXACT_DOUBLE):
                    errs.append(
                        f"col {col}: integer-valued double with max "
                        f"|value| {mx} beyond exact-double 2^53")
    return errs


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Representation lint over EVERY dumped query (oracle'd or not):
    # the two round-5 driver failures (c28 range, q46 array) were both
    # invisible to the oracle compare. Only directories that actually
    # hold a parquet dump are query results — a _temporary leftover or
    # other non-query dir is a skip-with-warning, not a FAIL (a lint
    # whose own sweep can fail the run on a non-result is a false
    # gate).
    dumped = sorted(d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d)))
    lint_failed = set()
    for name in dumped:
        if not glob.glob(os.path.join(out_dir, name, "*.parquet")):
            print(f"WARN {name}: no parquet parts, not a query dump "
                  "— skipping rep lint")
            continue
        try:
            errs = rep_lint(con, name, out_dir)
        except Exception as ex:
            errs = [f"rep lint exec error: {ex}"]
        if errs:
            print(f"FAIL {name}: rep lint: {'; '.join(errs)}")
            lint_failed.add(name)
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        if name in lint_failed:
            continue
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
