#!/usr/bin/env python3
"""Dev-only local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the parquet
tables in <sfDir>, sorts columns by name and rows by all columns, and
compares cell-by-cell (exact for non-floats, 1e-9 relative for floats).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return (a is None) == (b is None)
            if math.isnan(a) and math.isnan(b):
                return True
            return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    except TypeError:
        pass
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: load/run error: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        # Driver-hash hazard detector (round 12): the driver hashes the
        # stringified frames, so a column that is int64 on one side and
        # float64 on the other ("123" vs "123.0") hash-fails at the
        # driver even when every value compares equal here under the
        # float tolerance. Classic cause: a bare sum(BIGINT) oracle —
        # DuckDB types it HUGEINT, pandas surfaces float64. Wrap in an
        # outer CAST(... AS BIGINT).
        for c in set(g.columns) & set(w.columns):
            gk = g[c].dtype.kind
            wk = w[c].dtype.kind
            if {gk, wk} == {"i", "f"}:
                print(f"WARN {name}: col {c} dtype asymmetry "
                      f"spark={g[c].dtype} oracle={w[c].dtype} — "
                      f"driver hash WILL diverge; cast the integer side")
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        bad = None
        gv, wv = g.to_numpy(), w.to_numpy()
        exact = True
        for i in range(len(g)):
            for j in range(len(g.columns)):
                a, b = gv[i][j], wv[i][j]
                if hasattr(a, "item"):
                    a = a.item()
                if hasattr(b, "item"):
                    b = b.item()
                if not cmp_cell(a, b):
                    bad = (i, g.columns[j], a, b)
                    break
                if a != b and not (a is None or b is None or
                                   (isinstance(a, float) and math.isnan(a))):
                    exact = False
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} "
                  f"oracle={bad[3]!r}")
            n_fail += 1
        else:
            tag = "" if exact else "  (tolerance-only match — tighten!)"
            print(f"PASS {name} ({len(g)} rows){tag}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
