#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate.

NOT part of the engine (driver-side python only): runs graft.Verify via java,
then executes each oracle SQL in DuckDB over the same parquet tables and
compares (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check.py [sfdir] [--skip-run] [name ...]
"""
import json, os, subprocess, sys, glob

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
OUT = os.path.join(REPO, "target", "verify_out")
ONLY = [a for a in sys.argv[2:] if not a.startswith("-")]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

ADD_OPENS = []
for p in ("java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio "
          "java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs "
          "sun.security.action sun.util.calendar").split():
    ADD_OPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]

def run_verify():
    cp = os.path.join(REPO, "target", "scala-2.13", "classes") + ":/opt/spark/jars/*"
    cmd = ["java"] + ADD_OPENS + [
        "-Xmx8g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.Verify", SF, OUT]
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print(line)
    if r.returncode != 0:
        print(r.stderr[-3000:])
        sys.exit(1)

def compare():
    import duckdb
    import pandas as pd
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = json.load(open(os.path.join(OUT, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if ONLY and name not in ONLY:
            continue
        spark_files = glob.glob(os.path.join(OUT, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            # bind the oracle SQL ONCE; the relation serves both the value
            # fetch and the declared-type gate below (the heavy unrolled
            # oracles — 32 epoch CTEs, 256 BPE rounds — pay seconds per bind)
            drel = con.sql(sql)
            ddf = drel.df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_bad += 1; continue
        sdf = con.sql(f"SELECT * FROM '{os.path.join(OUT, name)}/*.parquet'").df()
        ddf = ddf.reindex(sorted(ddf.columns), axis=1)
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        if list(ddf.columns) != list(sdf.columns):
            print(f"FAIL {name}: columns duck={list(ddf.columns)} spark={list(sdf.columns)}"); n_bad += 1; continue
        # Declared-type gate: the driver's hash is type-sensitive (r11: a
        # HUGEINT oracle column failed it while pandas-coerced values here
        # matched). Compare DuckDB's declared oracle types against the
        # Spark parquet schema, both in DuckDB's type vocabulary.
        dtypes = dict(zip(drel.columns, (str(t) for t in drel.types)))
        stypes = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{os.path.join(OUT, name)}/*.parquet'").fetchall()}
        bad_t = [(c, dtypes[c], stypes.get(c)) for c in sorted(dtypes)
                 if dtypes[c] != stypes.get(c)]
        if bad_t:
            print(f"FAIL {name}: dtype mismatch " +
                  ", ".join(f"{c}: duck={a} spark={b}" for c, a, b in bad_t))
            n_bad += 1; continue
        if len(ddf) != len(sdf):
            print(f"FAIL {name}: rows duck={len(ddf)} spark={len(sdf)}"); n_bad += 1; continue
        ddf = ddf.sort_values(by=list(ddf.columns)).reset_index(drop=True) if len(ddf) else ddf
        sdf = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True) if len(sdf) else sdf
        bad_cols = []
        for c in ddf.columns:
            a, b = ddf[c], sdf[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    eq = ((a.isna() & b.isna()) | (a == b)).all()
                else:
                    eq = ((a.isna() & b.isna()) | (a.astype(object) == b.astype(object))).all()
            except Exception:
                eq = (a.astype(str) == b.astype(str)).all()
            if not eq:
                bad_cols.append(c)
        if bad_cols:
            n_bad += 1
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                neq = ~(((ddf[c].isna()) & (sdf[c].isna())) | (ddf[c] == sdf[c]))
                idx = list(neq[neq].index[:3])
                for i in idx:
                    print(f"   row{i} {c}: duck={ddf[c][i]!r} spark={sdf[c][i]!r}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(ddf)} rows)")
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    if "--skip-run" not in sys.argv:
        run_verify()
    compare()
