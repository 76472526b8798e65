#!/usr/bin/env python3
"""Dev-only oracle cross-check (mimics the driver's t2 gate; NOT part of the
shipped Scala library). Usage:

    python3 tools/xcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet written by graft.Verify, runs the
matching DuckDB SQL from oracle_sql.json against the sf parquet tables, and
compares: schema (column names sorted), row count, and exact values
(column-name-sorted, row order as produced).
"""
import sys, json, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(r[i] for i in order) for r in rows], [cols[i] for i in order]


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got_cols = list(got_rel.columns)
            got = got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols = list(exp_rel.columns)
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got, gc = canon(got, got_cols)
        exp, ec = canon(exp, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        # Type-FAMILY check, mirroring the driver's typed-value hash: the
        # driver converts both sides to native values before hashing, so
        # INTEGER vs BIGINT is fine (both plain ints) but HUGEINT is not
        # (no native 128-bit int -> it converts to Decimal/float and the
        # hash diverges even when the Python values compare equal). The
        # classic trap is DuckDB sum(int) widening to HUGEINT: CAST those
        # oracle columns to BIGINT. Same for DECIMAL vs DOUBLE.
        def fam(t):
            t = str(t)
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                     "UTINYINT", "USMALLINT", "UINTEGER"):
                return "int"
            if t.startswith("DECIMAL"):
                return "decimal"
            return t
        order_g = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        order_e = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        gt = [fam(got_rel.types[i]) for i in order_g]
        et = [fam(exp_rel.types[i]) for i in order_e]
        if gt != et:
            print(f"FAIL {name}: types {list(zip(gc, gt))} != {list(zip(ec, et))}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got, exp)):
            if not all(values_equal(x, y) for x, y in zip(g, e)):
                bad = (i, g, e)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark:  {bad[1]}\n  duckdb: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
