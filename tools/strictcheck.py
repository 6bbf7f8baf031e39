#!/usr/bin/env python3
"""Strict replica of the driver's t2 hash compare — NO numeric normalization.

Hypothesis from CORRECTNESS_r01.json: the driver sorts columns by name,
sorts rows, and hashes str()-ified cells.  That makes Spark DECIMAL(18,2)
("155.00") differ from DuckDB float64 ("155.0") even when numerically
equal.  This tool reproduces that compare and prints the first differing
cell per query so each mismatch can be root-caused.

Usage: python3 tools/strictcheck.py <sfDir> <verifyOutDir> [queryFilter...]
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent))
from selfcheck import TABLES  # single source of truth for the test tables


def norm_cell(v):
    import numpy as np
    if v is None:
        return "NULL"
    if isinstance(v, float) and v != v:
        return "NaN"
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)) or isinstance(v, np.ndarray):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_sig(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = sorted("\x1f".join(norm_cell(v) for v in tup)
                  for tup in df.itertuples(index=False, name=None))
    return sorted(df.columns), rows


def main(sf_dir, out_dir, only=()):
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_skip = 0
    for name in sorted(p.name for p in out.iterdir() if p.is_dir()):
        if only and name not in only:
            continue
        if name not in oracles:
            n_skip += 1
            continue
        files = sorted((out / name).glob("*.parquet"))
        if not files:
            # the query crashed in Verify and left an empty dir — report
            # and keep checking the rest instead of dying in pd.concat
            print(f"FAIL {name}: no parquet output written (query crashed in Verify?)")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        duck_df = con.execute(oracles[name]).df()
        s_cols, s_rows = frame_sig(spark_df)
        d_cols, d_rows = frame_sig(duck_df)
        if s_cols != d_cols or len(s_rows) != len(d_rows):
            print(f"FAIL {name}: shape spark={s_cols}x{len(s_rows)} duck={d_cols}x{len(d_rows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            sa, sb = a.split("\x1f"), b.split("\x1f")
            diffs = [(c, x, y) for c, x, y in zip(s_cols, sa, sb) if x != y]
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; row {i} cells: "
                  + "; ".join(f"{c}: spark={x!r} duck={y!r}" for c, x, y in diffs[:4]))
            n_fail += 1
        else:
            n_pass += 1

    print(f"== strict: {n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
