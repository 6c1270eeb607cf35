#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL (from outDir/oracle_sql.json) in DuckDB with views over
the sf parquet tables, loads the Spark result parquet, sorts columns by name
and rows by all columns, and compares values cell-by-cell (floats to 1e-9
relative). Usage: compare.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Contain a runaway oracle: an inlined-CTE re-evaluation once spilled
    # past this box's 78 GB of free disk (r11, graph_bfs_levels at sf~10)
    # and the full root filesystem took every concurrent process down with
    # it. A capped temp dir fails THAT query; an uncapped one fails the box.
    # PER-PROCESS temp dir (r11 ADVICE): a fixed shared path made two
    # concurrent compares share one 40GB budget, so one heavy oracle could
    # starve the other's spills in a way that looked like a query failure.
    import tempfile, shutil, atexit
    tmp = tempfile.mkdtemp(prefix="duckdb_cmp_", dir="/tmp")
    atexit.register(shutil.rmtree, tmp, True)
    con.execute("SET memory_limit='48GB'")
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET max_temp_directory_size='40GB'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. ScaleSmoke output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_path = f"{out_dir}/{name}"
        if not glob.glob(f"{spark_path}/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            oracle = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
        o, g = canon(oracle), canon(got)
        if list(o.columns) != list(g.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(g.columns)}")
            n_fail += 1; continue
        if len(o) != len(g):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(g)}"); n_fail += 1; continue
        bad = None
        for c in o.columns:
            oc, gc = o[c], g[c]
            if oc.dtype.kind == "f" or gc.dtype.kind == "f":
                import numpy as np
                ocv = oc.astype(float).to_numpy(); gcv = gc.astype(float).to_numpy()
                exact = (ocv == gcv) | (pd.isna(ocv) & pd.isna(gcv))
                # Only the documented irrational 'cos' columns get a
                # tolerance; everything else must be bit-exact — the driver's
                # gate hashes exact values, and a 1e-9 rtol here once hid a
                # last-cent DECIMAL divergence that failed the driver.
                if "cos" in c.lower():
                    ok = np.isclose(ocv, gcv, rtol=1e-9, atol=1e-12, equal_nan=True)
                    if not ok.all():
                        bad = (c, ocv[~ok][:3], gcv[~ok][:3]); break
                    if not exact.all():
                        i = (~exact).nonzero()[0][:3]
                        print(f"WARN {name}.{c}: float close-but-not-exact e.g. "
                              f"{ocv[i]} vs {gcv[i]}")
                elif not exact.all():
                    i = (~exact).nonzero()[0][:3]
                    bad = (c, ocv[i], gcv[i]); break
            else:
                ocs = oc.astype(str); gcs = gc.astype(str)
                neq = ocs != gcs
                if neq.any():
                    i = neq[neq].index[:3]
                    bad = (c, list(ocs[i]), list(gcs[i])); break
        if bad:
            print(f"FAIL {name}: col {bad[0]} oracle={bad[1]} spark={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
