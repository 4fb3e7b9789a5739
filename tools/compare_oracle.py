#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
and compares: schema (column names), row count, and values (rows sorted by all
columns, columns sorted by name, floats rounded to 6 significant-ish digits).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        crow = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    crow.append("NaN")
                else:
                    crow.append(f"{v:.6g}")
            else:
                crow.append(repr(v))
        out.append(tuple(crow))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(d[0] for d in got.description)
            got_rows = con.execute(
                f"SELECT {', '.join(got_cols)} FROM '{out_dir}/{name}/*.parquet'"
            ).fetchall()
            exp = con.execute(sql)
            exp_cols = sorted(d[0] for d in exp.description)
            exp_rows = con.execute(
                f"SELECT {', '.join(exp_cols)} FROM ({sql}) oq").fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: schema {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        # Numeric-class parity check: the driver's bridge coerces DuckDB
        # HUGEINT (integral sum results) to float64, so an int64 Spark
        # column vs a HUGEINT oracle column hash-mismatches even when the
        # values are equal ("113537" vs "113537.0"). Flag any int/float
        # class split between the two sides (r2 lesson).
        tg = con.execute(
            f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
        te = con.execute(f"DESCRIBE SELECT * FROM ({sql}) oq").fetchall()
        FLOATY = {"FLOAT", "DOUBLE", "HUGEINT", "UHUGEINT"}
        cls = {r[0]: (r[1].upper() in FLOATY) for r in tg}
        clash = [r[0] for r in te
                 if r[0] in cls and cls[r[0]] != (r[1].upper() in FLOATY)]
        if clash:
            print(f"FAIL {name}: int/float class mismatch on {clash} "
                  f"(HUGEINT oracle sums coerce to float driver-side)")
            n_fail += 1
            continue
        cg, ce = canon(got_rows), canon(exp_rows)
        if cg != ce:
            bad = [i for i, (a, b) in enumerate(zip(cg, ce)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {bad}")
            for i in bad:
                print(f"   got {cg[i]}")
                print(f"   exp {ce[i]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    # queries without oracle → rows-only existence check
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                print(f"INFO {d}: no oracle, {n} rows")
            except Exception as e:
                print(f"WARN {d}: no oracle, unreadable: {e}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
