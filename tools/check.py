#!/usr/bin/env python3
"""Local correctness self-check mirroring the driver's DuckDB oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify into <verifyOutDir>/<name>/ (parquet)
with an entry in <verifyOutDir>/oracle_sql.json, run the oracle SQL in
DuckDB over the same parquet tables and compare: row count, column names
(sorted), and a value hash over column-name-sorted rows. Exact row order is
also compared (our queries all end in a total ORDER BY).
"""
import sys, os, json, glob, hashlib, time
import duckdb

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(norm(r[i]) for i in order) + "\x1e").encode())
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_noracle = 0
    for d in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, d)
        if not os.path.isdir(qdir):
            continue
        res = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        spark_cols = [c[0] for c in res.description]
        spark_rows = res.fetchall()
        if d not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {d}: {len(spark_rows)} rows "
                  f"{'OK' if len(spark_rows) > 0 else 'EMPTY!'}")
            continue
        try:
            t0 = time.time()
            ores = con.execute(oracle[d])
            o_cols = [c[0] for c in ores.description]
            o_rows = ores.fetchall()
            o_sec = time.time() - t0
        except Exception as e:
            print(f"  [FAIL-ORACLE-SQL] {d}: {e}")
            n_fail += 1
            continue
        ok_cols = sorted(spark_cols) == sorted(o_cols)
        ok_rows = len(spark_rows) == len(o_rows)
        ok_hash = ok_cols and ok_rows and \
            table_hash(spark_rows, spark_cols) == table_hash(o_rows, o_cols)
        if ok_hash:
            n_pass += 1
            print(f"  [PASS] {d} ({len(spark_rows)} rows, "
                  f"oracle {o_sec:.1f}s)")
        else:
            n_fail += 1
            print(f"  [FAIL] {d}: cols {ok_cols} "
                  f"(spark={sorted(spark_cols)} oracle={sorted(o_cols)}) "
                  f"rows {len(spark_rows)} vs {len(o_rows)}")
            if ok_cols and ok_rows:
                order = sorted(range(len(spark_cols)),
                               key=lambda i: spark_cols[i])
                oorder = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
                shown = 0
                for i, (a, b) in enumerate(zip(spark_rows, o_rows)):
                    av = [norm(a[j]) for j in order]
                    bv = [norm(b[j]) for j in oorder]
                    if av != bv:
                        print(f"    row {i}: spark={av}\n            oracle={bv}")
                        shown += 1
                        if shown >= 3:
                            break
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
