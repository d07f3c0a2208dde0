#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [q1,q2,...]

Reads <verifyOutDir>/oracle_sql.json, registers each testdata parquet as a
DuckDB view, runs each oracle SQL, and compares against the Spark result
parquet dumped by graft.Verify:
  - column name sets must match (driver sorts columns by name before hashing)
  - row counts must match
  - values compared after sorting columns by name and rows by all columns.
    Floats are compared BITWISE (IEEE-754 bit pattern), mirroring the
    driver's hash: queries must round unstable float aggregates themselves,
    and -0.0 != +0.0 here exactly as it differs in the driver's hash.
"""
import json, math, sys, glob, os, struct
import duckdb

def canon(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    r.append("NaN")
                else:
                    r.append(struct.pack("<d", v).hex())
            else:
                r.append(str(v) if v is not None else None)
        out.append(tuple(r))
    out.sort(key=lambda t: tuple((x is None, x if x is not None else "") for x in t))
    return out

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-8]
        # Driver tiers are single parquet FILES; builder-synthesized tiers
        # (GenData/GenRel) are Spark-written DIRECTORIES of part files.
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if only:
        missing = only - set(oracle)
        if missing:
            # A typo'd name must not yield "0 pass / 0 fail" with exit 0.
            print(f"FAIL unknown query name(s): {', '.join(sorted(missing))}")
            return 1
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        try:
            duck = con.sql(oracle[name])
            duck_cols = sorted(duck.columns)
            duck_rows = duck.df()[duck_cols].itertuples(index=False, name=None)
            duck_canon = canon(duck_rows)
            sp = con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            sp_cols = sorted(sp.columns)
            sp_canon = canon(sp.df()[sp_cols].itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL {name}: exception {e}"); n_fail += 1; continue
        if duck_cols != sp_cols:
            print(f"FAIL {name}: cols duck={duck_cols} spark={sp_cols}"); n_fail += 1; continue
        if len(duck_canon) != len(sp_canon):
            print(f"FAIL {name}: rows duck={len(duck_canon)} spark={len(sp_canon)}"); n_fail += 1; continue
        if duck_canon != sp_canon:
            diff = [(a, b) for a, b in zip(duck_canon, sp_canon) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs (duck, spark): {diff}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(sp_canon)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
             set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
