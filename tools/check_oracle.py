#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each query's Spark parquet result from <verifyOutDir>/<name>/,
runs the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with
the parquet tables registered as views, sorts columns by name and rows by
all values, and compares cell-by-cell (floats to 1e-9 rel tolerance).
"""
import sys, json, glob, math

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b):
    """Mimic the driver's exact hash-compare: numeric cells are canonicalized
    to float64 and must be bit-equal; everything else compares as str().
    (The old 1e-9 tolerance let borderline decimal-vs-double rows pass
    locally and then hash-mismatch in the driver.)"""
    import decimal, numbers
    if a is None and b is None:
        return True
    num = (numbers.Number, decimal.Decimal)  # includes numpy scalar types
    if isinstance(a, num) and isinstance(b, num) and not (
            isinstance(a, bool) or isinstance(b, bool)):
        af, bf = float(a), float(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        if af == bf:
            return True
        if abs(af - bf) <= 1e-9 * max(abs(af), abs(bf), 1.0):
            print(f"  NEAR-MISS (would fail driver hash): {a!r} vs {b!r}")
        return False
    return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} != {list(duck_df.columns)}")
            n_fail += 1
            continue
        for c in spark_df.columns:
            if str(spark_df[c].dtype) != str(duck_df[c].dtype):
                print(f"  DTYPE-WARN {name}.{c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}"
                      " (values compared as numbers here; the driver's hash may be dtype-sensitive)")
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} != {len(duck_df)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(spark_df)):
            for c in spark_df.columns:
                x, y = spark_df[c].iloc[i], duck_df[c].iloc[i]
                x = None if (x is None or (isinstance(x, float) and math.isnan(x)) or x is pd.NaT or str(x) == 'NaT') else x
                y = None if (y is None or (isinstance(y, float) and math.isnan(y)) or y is pd.NaT or str(y) == 'NaT') else y
                if not cells_equal(x, y):
                    bad = (i, c, x, y)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
