#!/usr/bin/env python3
"""Dev harness: run TPC-DS derivation + a query body on DuckDB only.

Extracts the `derivations` CTE block straight from TpcdsQueries.scala
(stripping the Scala string margin), registers the sf dir's parquet
tables as views, and runs either bodies passed on stdin (separated by
lines of `---`) or, with --all, every registered tpcds_q* body dumped
by a prior Verify run's oracle_sql.json. Prints row count + first rows
per query — a parse/plumbing check for the oracle side before paying an
sbt cycle. Usage: tools/tpcds_dev.py <sfdir> [name] < body.sql
"""
import re, sys, duckdb

SCALA = "src/main/scala/graft/TpcdsQueries.scala"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def derivations():
    src = open(SCALA).read()
    m = re.search(r'private val derivations: String =\s*\n?\s*"""(.*?)"""\.stripMargin',
                  src, re.S)
    block = m.group(1)
    lines = []
    for ln in block.split("\n"):
        s = ln.lstrip()
        if s.startswith("|"):
            lines.append(s[1:])
        else:
            lines.append(ln)
    return "\n".join(lines)


def wrap(body):
    b = body.strip().rstrip(";")
    d = derivations()
    if b.upper().startswith("WITH "):
        return "WITH " + d + ",\n" + b[5:]
    return "WITH " + d + "\n" + b


def main():
    sfdir = sys.argv[1]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    bodies = sys.stdin.read().split("\n---\n")
    for i, body in enumerate(bodies):
        if not body.strip():
            continue
        name = f"body{i}"
        try:
            r = con.sql(wrap(body))
            rows = r.fetchall()
            cols = r.columns
            types = [str(t) for t in r.types]
            hug = [c for c, t in zip(cols, types) if "HUGEINT" in t.upper()]
            print(f"== {name}: {len(rows)} rows; cols={cols}")
            if hug:
                print(f"   !! HUGEINT columns: {hug}")
            for row in rows[:5]:
                print("  ", row)
        except Exception as e:
            print(f"== {name}: ERROR {e}")


if __name__ == "__main__":
    main()
