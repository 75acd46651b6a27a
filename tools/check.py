#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (t2).

Reads Verify.scala's output dir (<out>/<name>/ parquet + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf parquet tables, and
compares: row count, column names (sorted), and values (rows sorted, cells
canonicalized). Reports PASS/FAIL per query. Driver-side-only tooling —
the Scala library never depends on this.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):  # datetime/date — normalize precision
        s = v.isoformat()
        return s[:26] if "." in s else s
    if isinstance(v, (int, str, bool, bytes)):
        return v
    return str(v)


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(canon(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


# Output types that do not survive the driver's arrow->pandas hash path
# with their value representation intact: DuckDB HUGEINT (int128) becomes
# arrow decimal128(38,0) and then pandas float64, so `7572713` hashes as
# `7572713.0` while Spark's int64 hashes as `7572713` (the r4-r6 q_stats
# failure). Every sum()/product() over BIGINT must be cast in the oracle's
# final SELECT. DECIMAL outputs are banned for the same reason.
BANNED_TYPE = ("HUGEINT", "UHUGEINT", "DECIMAL")


def lint_types(con, name, sql):
    """Return a list of (column, type) oracle outputs whose DuckDB type
    would change representation on the way to the driver's hasher."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(r[0], r[1]) for r in desc
            if any(r[1].upper().startswith(b) for b in BANNED_TYPE)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            bad_types = lint_types(con, name, sql)
        except Exception as e:
            bad_types = []
            print(f"WARN {name}: type lint skipped: {e}")
        if bad_types:
            print(f"FAIL {name}: oracle output type leaks through arrow/pandas: "
                  f"{bad_types} — cast to BIGINT/DOUBLE in the final SELECT")
            n_fail += 1
            continue
        try:
            ds = pads.dataset(f"{out_dir}/{name}")
            tbl = ds.to_table()
            got_cols = tbl.column_names
            got_rows = [tuple(col[i].as_py() for col in tbl.columns)
                        for i in range(tbl.num_rows)]
            cur = con.execute(sql)
            want_cols = [d[0] for d in cur.description]
            want_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} duckdb={sorted(want_cols)}")
            n_fail += 1
            continue
        if len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows spark={len(got_rows)} duckdb={len(want_rows)}")
            n_fail += 1
            continue
        g, w = rowset(got_cols, got_rows), rowset(want_cols, want_rows)
        if g != w:
            bad = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
