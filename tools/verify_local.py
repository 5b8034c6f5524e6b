#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the raw testdata tables and compare (columns sorted by name,
rows sorted by all columns) against the parquet Verify.scala dumped.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>
(Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run.)
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Lint (shown only for failing queries — sums over DOUBLE are fine):
    # DuckDB widens integer sum()/list_sum() to HUGEINT; un-CAST ones are the
    # classic driver-hash killer (pandas renders HUGEINT as float64).
    import re
    lint = {}
    for qn, sql in sorted(oracles.items()):
        hits = []
        for m in re.finditer(r"(?<![a-zA-Z_])(list_)?sum\(", sql):
            pre = sql[max(0, m.start() - 70):m.start()].upper()
            if "CAST(" not in pre:
                hits.append(sql[m.start():m.start() + 30].replace("\n", " "))
        if hits:
            lint[qn] = hits
    failures = 0
    # every oracle key MUST have a dumped directory: a query that crashed
    # inside Verify.scala would otherwise simply vanish from the loop below
    # and the gate would false-pass with "ALL OK"
    dumped = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracles) - dumped):
        print(f"{name:28s} MISSING DUMP (query crashed in Verify?)")
        failures += 1
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        try:
            got = pd.read_parquet(qdir)
        except Exception as e:  # noqa: BLE001 - one corrupt dump must not kill the gate
            print(f"{name:28s} UNREADABLE DUMP: {e}")
            failures += 1
            continue
        if name not in oracles:
            status = f"rows-only ({len(got)} rows)"
            if len(got) == 0:
                status += "  *** EMPTY ***"
                failures += 1
            print(f"{name:28s} {status}")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"{name:28s} COLUMN MISMATCH spark={list(g.columns)} duck={list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"{name:28s} ROWCOUNT MISMATCH spark={len(g)} duck={len(e)}")
            failures += 1
            continue
        # dtype-STRICT exact compare: the driver hashes stringified values,
        # so an integer column on one side vs float64 on the other ("83" vs
        # "83.0") is a driver failure even when the numbers agree — typically
        # DuckDB sum(BIGINT)/list_sum returning HUGEINT which pandas
        # materializes as float64. Fail it here instead of coercing.
        bad = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            gf = str(gv.dtype).startswith("float")
            ef = str(ev.dtype).startswith("float")
            if gf != ef:
                bad.append((c, f"DTYPE MISMATCH spark={gv.dtype} duck={ev.dtype}"
                               " (un-CAST integer sum in the oracle?)"))
                continue
            if gf and ef:
                # NaN-mask compare, NOT a fillna sentinel: any sentinel value
                # (1.5 was used here once) collides with a legitimate cell of
                # that value, reporting NULL-vs-value as equal
                gd, ed = gv.astype("float64"), ev.astype("float64")
                eq = (gd.isna() & ed.isna()) | (gd == ed)
            else:
                eq = gv.astype(str) == ev.astype(str)
            if not eq.all():
                bad.append((c, int((~eq).sum()), gv[~eq].head(3).tolist(), ev[~eq].head(3).tolist()))
        if bad:
            print(f"{name:28s} VALUE MISMATCH {bad}")
            if name in lint:
                print(f"{'':28s} LINT: un-CAST sum() in oracle: {lint[name][:3]}")
            failures += 1
        else:
            print(f"{name:28s} OK ({len(g)} rows)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
