#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each Spark
result parquet from Verify's outDir, run the paired DuckDB oracle SQL on
the raw tables, and diff (rows sorted, exact values).

Strict-dtype mode is the DEFAULT: the driver's hash gate is
type-sensitive, so any dtype divergence between the Spark parquet and
the DuckDB oracle result (e.g. an uncast SUM(BIGINT) -> HUGEINT, the
q_ref_integrity/q_cms_counts bug class) FAILS here too. Pass --coerce
to restore the old lenient comparison (values only)."""
import json, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir: str, out_dir: str, strict: bool = True) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            duck_df = con.sql(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            failures += 1
            continue
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            failures += 1
            continue
        s = spark_df[sc].sort_values(sc).reset_index(drop=True)
        d = duck_df[dc].sort_values(dc).reset_index(drop=True)
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            failures += 1
            continue
        if strict:
            bad = [(c, str(s[c].dtype), str(d[c].dtype)) for c in sc
                   if s[c].dtype != d[c].dtype]
            if bad:
                det = ", ".join(f"{c}: spark={sd} duck={dd}" for c, sd, dd in bad)
                print(f"FAIL {name}: dtype mismatch ({det})")
                failures += 1
                continue
        mismatch = None
        for c in sc:
            sv, dv = s[c], d[c].astype(s[c].dtype, errors="ignore") if hasattr(d[c], 'astype') else d[c]
            try:
                eq = (sv == dv) | (sv.isna() & dv.isna())
            except Exception:
                eq = sv.astype(str) == dv.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = f"col {c} row {i}: spark={sv[i]!r} duck={dv[i]!r} (dtype {sv.dtype} vs {d[c].dtype})"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            failures += 1
        else:
            print(f"OK   {name}: {len(s)} rows")
    return failures

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--coerce"]
    strict = "--coerce" not in sys.argv[1:]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/verify_out"
    sys.exit(1 if main(sf, out, strict) else 0)
