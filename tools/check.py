#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracles on the same parquet tables, compare sorted rows.

Usage: python3 tools/check.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, math, os
import duckdb
import pandas as pd

# STRICT=1 → floats must match bit-exactly (mirrors the driver's hash
# compare); default allows 1e-9 relative drift (row/schema-level check).
STRICT = os.environ.get("STRICT", "0") == "1"
# DRIVER=1 → reproduce the driver's normalization asymmetry: the driver
# renders ORACLE-side decimals as floats ("…314.0") but Spark-side
# decimal128 as exact decimals ("…314.00"), then string-hashes both.
# A decimal-typed FINAL column therefore hash-mismatches on any value
# with trailing zeros even when numerically identical (the round-6
# tf_export_roundtrip / tf_nested_roundtrip reds). DRIVER implies STRICT.
DRIVER = os.environ.get("DRIVER", "0") == "1"
if DRIVER:
    STRICT = True

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def normval(v, oracle_side=False):
    """Engine-neutral value form: int widths, decimal/float split,
    date vs midnight-timestamp, and numpy scalars all collapse.
    In DRIVER mode, oracle-side decimals are floated (str '…314.0')
    while Spark-side decimals keep exact scale (str '…314.00') —
    mirroring the driver's hash inputs."""
    import decimal, datetime
    import numpy as np
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        if DRIVER and oracle_side:
            return float(v)
        return str(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, (np.floating, float)):
        return float(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    return str(v)

def canon(df: pd.DataFrame, oracle_side=False) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [[normval(v, oracle_side) for v in row]
            for row in df.itertuples(index=False)]
    rows.sort(key=lambda r: tuple(str(x) for x in r))
    return pd.DataFrame(rows, columns=list(df.columns), dtype=object)

def values_close(a, b):
    if DRIVER:
        # driver hash-compare: stringified normalized values, no
        # numeric tolerance and no cross-type reconciliation
        return str(a) == str(b)
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if STRICT:
            return a == b
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; ScaleUp fixtures are
        # Spark output dirs — glob the parts in that case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            # .arrow() keeps DECIMAL columns as decimals (like the
            # driver's bit-exact compare); .df() would float them
            exp = con.sql(sql).arrow().to_pandas()
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            exp, got = canon(exp, oracle_side=True), canon(got)
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
                n_fail += 1
                continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
                n_fail += 1
                continue
            bad = None
            for c in exp.columns:
                ev, gv = exp[c].tolist(), got[c].tolist()
                for i, (a, b) in enumerate(zip(ev, gv)):
                    if not values_close(a, b):
                        bad = (c, i, a, b)
                        break
                if bad:
                    break
            if bad:
                c, i, a, b = bad
                print(f"FAIL {name}: col {c} row {i}: exp={a!r} got={b!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(exp)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
