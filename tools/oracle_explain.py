#!/usr/bin/env python3
"""EXPLAIN every oracle SQL statement in DuckDB against the test corpus.

Usage: python3 tools/oracle_explain.py <sfDir> <oracle_sql.json>

Catches oracle syntax/semantic drift (bad function names, type errors)
without executing the queries. Exit 0 iff every statement plans.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str, oracle_json: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads(Path(oracle_json).read_text())
    bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:
            print(f"FAIL {name}: {e}")
            bad += 1
    print(f"== {len(oracles) - bad}/{len(oracles)} oracles plan cleanly")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
