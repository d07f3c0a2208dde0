#!/usr/bin/env python3
"""check_oracle with per-query wall timing and a per-query timeout.

Same comparison semantics as check_oracle.py (sorted columns, bitwise
floats; the >200k-row EXCEPT ALL path carries signbit companions for
every float column so a -0.0/+0.0 flip fails — round-13 fix; NaN is
equal-to-NaN under DuckDB set-op semantics, matching canon()'s "NaN"
token), plus: each oracle runs under a watchdog that interrupts DuckDB
after --timeout seconds (default 1800).
ORACLE_EXCEPT_THRESHOLD overrides the 200k cutover (test hook). Timed-out queries are reported
TIMEOUT (diagnosed, not failed silently) — the sf10 tier's purpose is to
find exactly which ORACLE-side CTEs stop being payable two decades above
the fixture, separately from engine correctness. Writes a JSON timing
record to --out.

Usage: check_oracle_timed.py <sfDir> <verifyOutDir> [--only q1,q2]
       [--timeout SEC] [--out timings.json]
"""
import json, math, sys, glob, os, shutil, struct, threading, time
import duckdb

# DuckDB spill floor: interrupt any oracle once free disk drops below this
# (the q124 sf10 oracle spilled >60 GB and took the whole box's tempdir
# with it — a diagnosed-DISK result must never cascade into other jobs).
MIN_FREE_BYTES = 25 * (1 << 30)


def spill_dir():
    """The filesystem the guard must watch = where DuckDB actually spills:
    DUCK_TMP when set, else '/'. Watching '/' unconditionally (round-12
    advice) meant a DUCK_TMP on another volume either never tripped the
    floor (that volume filled) or tripped it spuriously."""
    d = os.environ.get("DUCK_TMP")
    return d if d and os.path.isdir(d) else "/"


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


def views(con, sf_dir):
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-8]
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{src}')")


def load_fragments(path):
    frag = open(path).read()
    pairs = frag.split("===PAIRS_CTES===\n")[1].split("\n===EDGES_CTES===")[0]
    comps = frag.split("===COMPS_PREFIX===\n")[1].split("\n===END===")[0]
    return pairs, comps


def rewrite_prefix(sql, fragments):
    """If `sql` opens with a shared calibrated CTE prefix, strip it so the
    suffix's CTE names resolve to the tables `build_cal_prefix.py`
    materialized (same text, derived once — still DuckDB's own work)."""
    pairs_ctes, comps_prefix = fragments
    for prefix, kw in ((comps_prefix, "WITH RECURSIVE "),
                       ("WITH " + pairs_ctes, "WITH ")):
        if sql.startswith(prefix):
            suffix = sql[len(prefix):].lstrip("\n ")
            if suffix.startswith(","):
                return kw + suffix.lstrip(", \n"), True
            return suffix, True
    return sql, False


def main():
    args = sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    only, timeout, out_path = None, 1800.0, None
    fragments, db_path = None, None
    i = 2
    while i < len(args):
        if args[i] == "--only":
            only = set(args[i + 1].split(",")); i += 2
        elif args[i] == "--timeout":
            timeout = float(args[i + 1]); i += 2
        elif args[i] == "--out":
            out_path = args[i + 1]; i += 2
        elif args[i] == "--frag":
            fragments = load_fragments(args[i + 1]); i += 2
        elif args[i] == "--db":
            db_path = args[i + 1]; i += 2
        else:
            print(f"unknown arg {args[i]}"); return 2
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if only:
        missing = only - set(oracle)
        if missing:
            print(f"FAIL unknown query name(s): {', '.join(sorted(missing))}")
            return 1
        oracle = {k: v for k, v in oracle.items() if k in only}
    results = {}
    n_pass = n_fail = n_timeout = 0
    for name in sorted(oracle):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark result dir", flush=True)
            results[name] = {"status": "fail", "reason": "no spark result"}
            n_fail += 1
            continue
        # A just-interrupted spiller's temp cleanup is asynchronous: wait
        # for the disk to recover before starting the next query, or the
        # guard cascades one genuine DISKKILL into killing its successors.
        for _ in range(30):
            if shutil.disk_usage(spill_dir()).free >= MIN_FREE_BYTES + 10 * (1 << 30):
                break
            time.sleep(10)
        sql = oracle[name]
        rewritten = False
        if fragments:
            sql, rewritten = rewrite_prefix(sql, fragments)
        # Fresh connection per query: an interrupt can leave a connection
        # unusable, and view setup is metadata-only (lazy scans).
        con = duckdb.connect(db_path) if db_path else duckdb.connect()
        tmpdir = os.environ.get("DUCK_TMP")
        if tmpdir:
            os.makedirs(tmpdir, exist_ok=True)
            con.execute(f"SET temp_directory='{tmpdir}'")
        if os.environ.get("DUCK_MEM"):
            con.execute(f"SET memory_limit='{os.environ['DUCK_MEM']}'")
        if os.environ.get("DUCK_THREADS"):
            con.execute(f"SET threads={os.environ['DUCK_THREADS']}")
        views(con, sf_dir)
        timed_out = threading.Event()
        disk_killed = threading.Event()
        done = threading.Event()

        def watchdog(c=con, ev=timed_out):
            ev.set()
            c.interrupt()

        def disk_guard(c=con, ev=disk_killed, fin=done):
            while not fin.wait(10):
                if shutil.disk_usage(spill_dir()).free < MIN_FREE_BYTES:
                    ev.set()
                    c.interrupt()
                    return

        threading.Thread(target=disk_guard, daemon=True).start()
        t = threading.Timer(timeout, watchdog)
        t.start()
        t0 = time.monotonic()
        try:
            duck = con.sql(sql)
            duck_cols = sorted(duck.columns)
            sp = con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            sp_cols = sorted(sp.columns)
            if duck_cols != sp_cols:
                t.cancel(); done.set(); con.close()
                print(f"FAIL {name}: cols duck={duck_cols} spark={sp_cols}",
                      flush=True)
                results[name] = {"status": "fail", "reason": "cols"}
                n_fail += 1
                continue
            proj = ", ".join(f'"{c}"' for c in duck_cols)
            con.execute(f"CREATE TEMP TABLE __d AS SELECT {proj} FROM ({sql})")
            con.execute("CREATE TEMP TABLE __s AS SELECT " + proj +
                        f" FROM read_parquet('{spark_path}/*.parquet')")
            nd = con.sql("SELECT count(*) FROM __d").fetchone()[0]
            ns = con.sql("SELECT count(*) FROM __s").fetchone()[0]
            if nd != ns:
                t.cancel(); done.set(); con.close()
                print(f"FAIL {name}: rows duck={nd} spark={ns}", flush=True)
                results[name] = {"status": "fail", "reason": "rows",
                                 "sec": round(time.monotonic() - t0, 1)}
                n_fail += 1
                continue
            if nd <= int(os.environ.get("ORACLE_EXCEPT_THRESHOLD", 200_000)):
                # Exact driver semantics: bitwise floats, sorted rows.
                duck_canon = canon(con.sql("SELECT * FROM __d").df()
                                   .itertuples(index=False, name=None))
                sp_canon = canon(con.sql("SELECT * FROM __s").df()
                                 .itertuples(index=False, name=None))
                mismatch = duck_canon != sp_canon
                diff = ([(a, b) for a, b in zip(duck_canon, sp_canon) if a != b][:3]
                        if mismatch else [])
            else:
                # Large outputs: multiset EXCEPT in DuckDB (vectorized,
                # NaN-safe). Round-13 fix for the round-12 advice: plain
                # EXCEPT ALL treats -0.0 == +0.0, so every float column
                # (scalars AND list elements) gets a signbit COMPANION in
                # the projection — a partition/engine-dependent zero-sign
                # flip now diffs instead of passing silently. (The Scala
                # Verify --invariance gate does the same through DoubleBits
                # bit patterns.)
                dtypes = con.sql("SELECT * FROM __d").types
                dnames = con.sql("SELECT * FROM __d").columns
                # A result column literally named __sb_<x> would collide with
                # x's companion and alias two different columns in the
                # projection — refuse loudly (round-13 advice).
                collide = [c for c in dnames if c.startswith("__sb_")]
                if collide:
                    t.cancel(); done.set(); con.close()
                    print(f"FAIL {name}: column(s) {collide} collide with the "
                          "signbit companion prefix __sb_", flush=True)
                    results[name] = {"status": "fail", "reason": "sb-collision"}
                    n_fail += 1
                    continue
                aug = []
                # Companions mask NaN to false: DuckDB's hardware-division NaN
                # commonly carries a SET sign bit on x86 while Java NaN is
                # positive, and canon()'s <=200k path folds every NaN to one
                # token — only true zero-sign flips should diff (r13 advice).
                nested_float = []
                # NB: loop vars must not shadow the watchdog Timer `t`.
                for c, ctype in zip(dnames, dtypes):
                    ts = str(ctype)
                    aug.append(f'"{c}"')
                    if ts in ("DOUBLE", "FLOAT", "REAL"):
                        aug.append(f'CASE WHEN isnan("{c}") THEN false ELSE '
                                   f'signbit("{c}") END AS "__sb_{c}"')
                    elif ts in ("DOUBLE[]", "FLOAT[]", "REAL[]"):
                        aug.append(
                            f'list_transform("{c}", x -> CASE WHEN isnan(x) '
                            f'THEN false ELSE signbit(x) END) AS "__sb_{c}"')
                    elif any(f in ts for f in ("DOUBLE", "FLOAT", "REAL")):
                        # Nested float-bearing type this path has no companion
                        # for (DOUBLE[][], STRUCT(... DOUBLE ...), MAP):
                        # refuse loudly like Verify.bitwise rather than let the
                        # -0.0 hole persist silently inside the nesting.
                        nested_float.append((c, ts))
                if nested_float:
                    t.cancel(); done.set(); con.close()
                    print(f"FAIL {name}: unhandled nested float type(s) "
                          f"{nested_float} in >threshold EXCEPT path — extend "
                          "the signbit companions before trusting it", flush=True)
                    results[name] = {"status": "fail", "reason": "nested-float"}
                    n_fail += 1
                    continue
                aproj = ", ".join(aug)
                d = con.sql(
                    f"SELECT count(*) FROM ((SELECT {aproj} FROM __d EXCEPT ALL "
                    f"SELECT {aproj} FROM __s) UNION ALL (SELECT {aproj} FROM __s "
                    f"EXCEPT ALL SELECT {aproj} FROM __d))").fetchone()[0]
                mismatch = d != 0
                diff = [f"except_all_diff_rows={d}"] if mismatch else []
            dt = time.monotonic() - t0
            t.cancel()
            done.set()
            con.close()
            if mismatch:
                print(f"FAIL {name}: value mismatch, first diffs: {diff}",
                      flush=True)
                results[name] = {"status": "fail", "sec": round(dt, 1),
                                 "reason": "values"}
                n_fail += 1
            else:
                print(f"PASS {name} ({nd} rows, {dt:.1f}s)", flush=True)
                results[name] = {"status": "pass", "sec": round(dt, 1),
                                 "rows": nd, "rewritten": rewritten}
                n_pass += 1
            continue
        except Exception as e:
            dt = time.monotonic() - t0
            t.cancel()
            done.set()
            if disk_killed.is_set():
                print(f"DISKKILL {name} after {dt:.1f}s (spill past free-disk floor)",
                      flush=True)
                results[name] = {"status": "diskkill", "sec": round(dt, 1)}
                n_timeout += 1
            elif timed_out.is_set():
                print(f"TIMEOUT {name} after {dt:.1f}s", flush=True)
                results[name] = {"status": "timeout", "sec": round(dt, 1)}
                n_timeout += 1
            else:
                print(f"FAIL {name}: exception {e}", flush=True)
                results[name] = {"status": "fail", "sec": round(dt, 1),
                                 "reason": str(e)[:300]}
                n_fail += 1
            con.close()
            continue
    print(f"== {n_pass} pass / {n_fail} fail / {n_timeout} timeout ==")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
