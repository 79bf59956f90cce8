#!/usr/bin/env python3
"""Suite-wide oracle dialect-type guard (r15 judge finding, class rule).

The driver's hasher is type-tagged: DuckDB HUGEINT (int128) hashes
differently from BIGINT even when every value is equal, so an oracle SQL
whose RESULT contains a HUGEINT column can never hash-match Spark's
BIGINT — tpch_q12 was the one row of 307 that hit this (sum over integer
literals), and tools/local_verify.py's Python int coercion cannot see it.
This guard runs every oracle SQL through DuckDB with `LIMIT 0` semantics
(full plan, zero rows fetched where possible) and fails if any result
column types HUGEINT (or UHUGEINT). Run it after Verify alongside
local_verify.py:

    python3 tools/oracle_type_check.py <sfDir> <verifyOutDir>

Dev-only tooling (mirrors the driver); the engine itself is pure Scala.
"""
import duckdb, json, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    if len(sys.argv) > 3:
        keep = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    bad = 0
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            hug = [c for c, t in zip(rel.columns, rel.types)
                   if "HUGEINT" in str(t).upper()]
        except Exception as e:
            print(f"SKIP {name}: {str(e)[:120]}")
            continue
        if hug:
            bad += 1
            print(f"HUGEINT {name}: columns {hug} — cast to BIGINT in both "
                  "the Spark and oracle SQL (dialect rule)")
    print("TYPES OK" if bad == 0 else f"{bad} HUGEINT-PRODUCING QUERIES")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
