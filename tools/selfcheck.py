#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare (SURVEY.md §5.2.1).

Usage: python3 tools/selfcheck.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ (Spark parquet result) and <outDir>/oracle_sql.json,
runs each oracle SQL in DuckDB against the parquet tables in <sfDir>, and
compares: row count, column names (sorted), and cell values (stringified,
columns sorted by name, row order as produced — queries must have a total
ORDER BY). Prints one line per query + a summary; exits 1 on any FAIL.

Driver-side only tooling (duckdb/pyarrow are not available to the Scala
engine itself).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            fails.append(name)
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            fails.append(name)
            continue
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns want={wcols} got={gcols}")
            fails.append(name)
            continue
        if want.num_rows != got.num_rows:
            print(f"FAIL {name}: rows want={want.num_rows} got={got.num_rows}")
            fails.append(name)
            continue
        wtypes = {c: str(want.schema.field(c).type) for c in wcols}
        gtypes = {c: str(got.schema.field(c).type) for c in gcols}
        # The driver's canonical hash is dtype-sensitive (decimal128(38,0)
        # != int64 even when every value matches) — so any arrow dtype
        # mismatch is a hard FAIL here too, not a note. This is exactly how
        # 4 red rows shipped in round 2 while selfcheck said 63/63.
        tdrift = {k: (wtypes[k], gtypes[k]) for k in wcols
                  if wtypes[k] != gtypes[k]}
        if tdrift:
            print(f"FAIL {name}: dtype mismatch (oracle, spark): {tdrift}")
            fails.append(name)
            continue
        w = want.select(wcols).to_pylist()
        g = got.select(gcols).to_pylist()
        bad = None
        for i, (rw, rg) in enumerate(zip(w, g)):
            for c in wcols:
                if canon(rw[c]) != canon(rg[c]):
                    bad = (i, c, canon(rw[c]), canon(rg[c]))
                    break
            if bad:
                break
        if bad:
            i, c, vw, vg = bad
            print(f"FAIL {name}: row {i} col {c}: want={vw} got={vg} "
                  f"(types: want={wtypes[c]} got={gtypes[c]})")
            fails.append(name)
        else:
            print(f"OK   {name} ({want.num_rows} rows)")
    n = len([k for k in oracle if not only or k in only])
    print(f"\n{n - len(fails)}/{n} OK")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
