#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first, then this script:
it registers the sf parquet tables as DuckDB views, runs each oracle SQL
from <outDir>/oracle_sql.json, and compares against the Spark parquet dump
(columns sorted by name, rows sorted, exact value compare) — the same
shape as CORRECTNESS_r{N}.json.

It ALSO runs the suite-wide dialect-type guard inline (r16 judge ask:
one command = value compare + type guard): the driver's hasher is
type-tagged, so an oracle SQL whose result types HUGEINT/UHUGEINT
(DuckDB int128 — e.g. sum over integer literals) can never hash-match
Spark's BIGINT even when every value is equal. Any such column is a
failure here, before it can reach the driver. The standalone
tools/oracle_type_check.py remains for targeted runs.

Dev-only tooling (mirrors the driver); the engine itself is pure Scala.
"""
import duckdb, json, math, sys, os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    def c(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return v
        return v
    return sorted([tuple(c(v) for v in row) for row in rows], key=lambda r: str(r))

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    # optional 3rd arg: comma-separated query names (matches Verify's filter)
    if len(sys.argv) > 3:
        keep = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    failures = 0
    type_failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            # type guard first: column types come from the relation plan,
            # independent of the value fetch below
            rel = con.sql(sql)
            hug = [c for c, t in zip(rel.columns, rel.types)
                   if "HUGEINT" in str(t).upper()]
            if hug:
                type_failures += 1
                print(f"TYPE {name}: HUGEINT columns {hug} — cast to BIGINT "
                      "in both the Spark and oracle SQL (dialect rule)")
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        # driver sorts columns by name before hashing values
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
        schema_ok = sorted(spark_cols) == sorted(duck_cols)
        s = canon([[r[i] for i in s_idx] for r in spark_rows])
        d = canon([[r[i] for i in d_idx] for r in duck_rows])
        rows_ok = len(s) == len(d)
        exact = s == d
        if schema_ok and exact:
            print(f"OK   {name}: {len(s)} rows")
        else:
            failures += 1
            print(f"FAIL {name}: schema_ok={schema_ok} rows {len(s)} vs {len(d)} exact={exact}")
            if not schema_ok:
                print(f"     spark cols: {sorted(spark_cols)}")
                print(f"     duck  cols: {sorted(duck_cols)}")
            else:
                for i, (a, b) in enumerate(zip(s, d)):
                    if a != b:
                        print(f"     first diff row {i}:\n       spark {a}\n       duck  {b}")
                        break
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}"
          f" ({len(oracle)} queries)")
    print("TYPES OK" if type_failures == 0
          else f"{type_failures} HUGEINT-PRODUCING QUERIES")
    sys.exit(1 if failures or type_failures else 0)

if __name__ == "__main__":
    main()
