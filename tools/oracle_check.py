#!/usr/bin/env python3
"""Local twin of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs <verifyOutDir>/oracle_sql.json's SQL in DuckDB against views over
<sfDir>/*.parquet, and compares: column names (sorted), row counts, and
cell values (exact; floats compared both exactly and with tolerance so
we can see how close a near-miss is).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return [colnames[i] for i in order], out


def cell_eq(a, b):
    if a is None and b is None:
        return True, True
    if (a is None) != (b is None):
        return False, False
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True, True
            exact = (a == b)
            close = exact or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
            return exact, close
        try:
            fa, fb = float(a), float(b)
            return fa == fb, abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        except (TypeError, ValueError):
            return False, False
    if type(a) != type(b):
        return str(a) == str(b), str(a) == str(b)
    return a == b, a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            o_rel = con.execute(sql)
            o_cols = [d[0] for d in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue

        sc, sr = canon(spark_rows, spark_cols)
        oc, orows = canon(o_rows, o_cols)
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(sr) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(sr)} oracle={len(orows)}")
            n_fail += 1
            continue
        # rows are expected in matching order (both sides ORDER BY); also
        # try sorted compare as fallback diagnostics
        bad = []
        n_close_only = 0
        for i, (a, b) in enumerate(zip(sr, orows)):
            for j, (x, y) in enumerate(zip(a, b)):
                exact, close = cell_eq(x, y)
                if not exact:
                    if close:
                        n_close_only += 1
                    else:
                        bad.append((i, sc[j], x, y))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell mismatches, e.g. {bad[:3]}")
            n_fail += 1
        elif n_close_only:
            print(f"WARN {name}: {len(sr)} rows OK but {n_close_only} cells only "
                  f"close-not-exact (hash would MISMATCH)")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sr)} rows, exact")
            n_pass += 1

    # names with no oracle
    import os
    no_oracle = [d for d in sorted(os.listdir(out_dir))
                 if os.path.isdir(f"{out_dir}/{d}") and d not in oracle]
    for d in no_oracle:
        print(f"INFO {d}: no oracle (rows-only check)")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(no_oracle)} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
