#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (SURVEY.md §5.4).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), replays
<verifyOutDir>/oracle_sql.json in DuckDB with each test table registered as
a view named by its bare table name (the contract's example oracle uses
`FROM lineitem`), sorts columns by name, and compares values row-by-row.

Exit 0 iff every oracled query matches. Queries without an oracle are
reported as SKIP (rows-only on the driver side).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    """Canonical string per cell. Numerics go through Decimal.normalize()
    so DECIMAL(18,2) from Spark parquet and float64 from duckdb.df() agree
    when (and only when) they are numerically equal; floats use repr()
    (shortest round-trip) so only bit-identical doubles agree."""
    import decimal
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(decimal.Decimal(int(v)).normalize())
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return str(decimal.Decimal(repr(f)).normalize())
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)) or isinstance(v, np.ndarray):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_sig(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append("\x1f".join(norm_cell(v) for v in tup))
    return sorted(df.columns), rows


def main(sf_dir: str, out_dir: str) -> int:
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_skip = 0
    result_dirs = sorted(p.name for p in out.iterdir() if p.is_dir())
    for name in result_dirs:
        files = list((out / name).glob("*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output written")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(spark_df)} rows)")
            n_skip += 1
            continue
        try:
            # .df() coerces DuckDB DECIMAL to float64 (loses >15-16
            # significant digits) — outputs are required to be typed
            # DOUBLE/BIGINT at the SQL level instead (Casts.scala), so a
            # decimal-typed oracle column here is a query-authoring bug.
            desc = con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
            dec_cols = [c for c, t, *_ in desc if "DECIMAL" in t or "HUGEINT" in t]
            if dec_cols:
                print(f"WARN {name}: oracle emits DECIMAL/HUGEINT columns {dec_cols}; "
                      "cast them to DOUBLE/BIGINT in the SQL (Casts.scala rule)")
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"WARN {name}: column ORDER differs (names match after sort): "
                  f"spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        s_cols, s_rows = frame_sig(spark_df)
        d_cols, d_rows = frame_sig(duck_df)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: row counts differ spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; first at {i}:")
            print(f"  cols : {s_cols}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1

    missing = set(oracles) - set(result_dirs)
    for name in sorted(missing):
        print(f"FAIL {name}: oracle declared but no verify output (query threw?)")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
