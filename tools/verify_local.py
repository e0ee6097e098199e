#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate (NOT shipped library
code): run graft.Verify, then replay each oracle SQL in DuckDB over the
same parquet tables and diff values exactly.

Usage: tools/verify_local.py [sfdir] [outdir] [only: q1,q2,...]
"""
import json, math, re, subprocess, sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


ONLY = sys.argv[3] if len(sys.argv) > 3 else None

# Oracles whose expected values are precomputed over the sf0.01
# fixture (the driver's correctness gate): at any other SF the VALUES
# table doesn't apply, so dev sweeps skip them instead of reporting a
# false failure. The driver itself only ever replays at sf0.01.
PINNED_SF001 = {"q120_compression_quality"}


def run_verify():
    cmd = ["tools/run.sh", "graft.Verify", SF, str(OUT)]
    if ONLY:
        cmd.append(ONLY)
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    return v


def rows_of(rel):
    cols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in cols]
    rows = [tuple(norm(r[i]) for i in idx) for r in rel.fetchall()]
    return cols, rows


def main():
    run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = json.loads((OUT / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        if name in PINNED_SF001 and "sf0.01" not in SF:
            print(f"SKIP {name}: oracle pinned to the sf0.01 gate")
            n_skip += 1
            continue
        sql = oracles[name]
        pq = OUT / name
        if not pq.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_cols, got = rows_of(con.sql(
                f"SELECT * FROM '{pq}/*.parquet'"))
            exp_rel = con.sql(sql)
            # Oracle result-TYPE assertion (VERDICT r12 item 3): the
            # driver's hasher is type-sensitive, and DuckDB silently
            # widens integer math to HUGEINT (int128) when any term
            # escapes an explicit CAST — q482's divisor did exactly
            # that and shipped a red hash on exactly-equal values.
            # Forbidden: integer types Spark can NEVER emit (int128
            # and the unsigned family); INTEGER/BIGINT pair fine with
            # Spark int32/int64 and stay allowed. The scan is over the
            # FULL type string (r13 ADVICE): a HUGEINT nested inside a
            # STRUCT(...)/LIST column widens just as silently as a
            # top-level one, so word-bounded regex over str(t) catches
            # both.
            _FORBIDDEN = re.compile(
                r"\b(HUGEINT|UHUGEINT|UTINYINT|USMALLINT|"
                r"UINTEGER|UBIGINT)\b")
            bad = [(c, str(t)) for c, t in zip(exp_rel.columns,
                                               exp_rel.types)
                   if _FORBIDDEN.search(str(t).upper())]
            if bad:
                print(f"FAIL {name}: oracle column(s) {bad} have an "
                      f"integer type Spark cannot emit — add "
                      f"CAST(... AS BIGINT)")
                n_fail += 1
                continue
            exp_cols, exp = rows_of(exp_rel)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif got != exp:
            print(f"FAIL {name}: {len(got)} vs {len(exp)} rows", )
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    print(f"  first diff row {i}:\n   got {g}\n   exp {e}")
                    break
            else:
                print(f"  row count differs only")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    skip_note = f", {n_skip} skipped (sf-pinned)" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skip_note} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
