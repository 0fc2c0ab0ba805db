#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Reads oracle_sql.json from the Verify output dir, registers the sf tables as
DuckDB views over the same parquet files, runs each oracle statement, and
compares against the Spark parquet dump: columns sorted by name, rows sorted
by all columns, values compared exactly (floats to 1e-9 relative as a
diagnostic; exact-string as the headline, mirroring a hash compare).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            failures += 1
            continue
        # exact compare, mirroring a value-hash
        gs = g.astype(str).values.tolist()
        es = e.astype(str).values.tolist()
        if gs != es:
            ndiff = sum(1 for a, b in zip(gs, es) if a != b)
            print(f"FAIL {name}: {ndiff}/{len(gs)} rows differ")
            for a, b in zip(gs, es):
                if a != b:
                    print(f"   spark={a}\n   duck ={b}")
                    break
            # dtype hint
            print(f"   spark dtypes: {dict(g.dtypes.astype(str))}")
            print(f"   duck  dtypes: {dict(e.dtypes.astype(str))}")
            failures += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
