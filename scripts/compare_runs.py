#!/usr/bin/env python3
"""Partition-invariance gate between two graft.Verify output dirs: every
query's result must be identical (sorted canonical rows, bitwise floats)
across runs with different shuffle partitionings. Usage:
  python3 scripts/compare_runs.py <outDirA> <outDirB>"""
import sys, os, math, struct
import duckdb

def canon(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                r.append("NaN" if math.isnan(v) else struct.pack("<d", v).hex())
            else:
                r.append(str(v) if v is not None else None)
        out.append(tuple(r))
    out.sort(key=lambda t: tuple((x is None, x if x is not None else "") for x in t))
    return out

def main(a, b):
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
    n_pass = n_fail = 0
    for name in names:
        pb = os.path.join(b, name)
        if not os.path.isdir(pb):
            print(f"FAIL {name}: missing in {b}"); n_fail += 1; continue
        try:
            ra = con.sql(f"SELECT * FROM read_parquet('{a}/{name}/*.parquet')")
            rb = con.sql(f"SELECT * FROM read_parquet('{pb}/*.parquet')")
            ca, cb = sorted(ra.columns), sorted(rb.columns)
            if ca != cb:
                print(f"FAIL {name}: columns {ca} != {cb}"); n_fail += 1; continue
            na = con.sql(f"SELECT count(*) FROM read_parquet('{a}/{name}/*.parquet')").fetchone()[0]
            nb = con.sql(f"SELECT count(*) FROM read_parquet('{pb}/*.parquet')").fetchone()[0]
            if na != nb:
                print(f"FAIL {name}: {na} vs {nb} rows"); n_fail += 1; continue
            if na <= 200_000:
                va = canon(ra.df()[ca].itertuples(index=False, name=None))
                vb = canon(rb.df()[cb].itertuples(index=False, name=None))
                if va != vb:
                    diff = sum(1 for x, y in zip(va, vb) if x != y)
                    print(f"FAIL {name}: {na} rows, {diff} differing")
                    n_fail += 1
                else:
                    print(f"PASS {name} ({na} rows)"); n_pass += 1
            else:
                # sf10-sized dumps (100M+ rows): vectorized multiset compare
                # (NaN-safe value equality; bitwise only diverges on
                # -0.0 vs +0.0, excluded by the output-rounding discipline).
                proj = ", ".join(f'"{c}"' for c in ca)
                d = con.sql(
                    f"SELECT count(*) FROM ((SELECT {proj} FROM read_parquet('{a}/{name}/*.parquet') "
                    f"EXCEPT ALL SELECT {proj} FROM read_parquet('{pb}/*.parquet')) UNION ALL "
                    f"(SELECT {proj} FROM read_parquet('{pb}/*.parquet') "
                    f"EXCEPT ALL SELECT {proj} FROM read_parquet('{a}/{name}/*.parquet')))").fetchone()[0]
                if d:
                    print(f"FAIL {name}: {na} rows, {d} differing (except-all)")
                    n_fail += 1
                else:
                    print(f"PASS {name} ({na} rows, except-all)"); n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
