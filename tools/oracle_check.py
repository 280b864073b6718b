#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify's parquet dumps
against DuckDB oracle SQL on the same sf dir. The driver's hash is
ORDER-SENSITIVE over emitted rows (columns sorted by name), so rows are
compared in emitted order here too; a value-equal-but-reordered result is
reported as ORDER-FAIL (driver would fail it).

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols):
    # sort columns by name, stringify values; rows stay in emitted order
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return [cols[i] for i in order], out

def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name}"); continue
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sq = con.execute(f"SELECT * FROM read_parquet('{spark_glob}')")
            scols = [d[0] for d in sq.description]; srows = sq.fetchall()
            oq = con.execute(sql)
            ocols = [d[0] for d in oq.description]; orows = oq.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            print(f"FAIL {name}: cols spark={sc} oracle={oc}"); n_fail += 1
        elif len(sr) != len(orr):
            print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orr)}"); n_fail += 1
        elif sr != orr:
            bad = next(i for i in range(len(sr)) if sr[i] != orr[i])
            kind = "ORDER-FAIL" if sorted(sr) == sorted(orr) else "FAIL"
            print(f"{kind} {name}: value mismatch at row {bad}:\n  spark ={sr[bad]}\n  oracle={orr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    skip = tuple(sys.argv[3].split(",")) if len(sys.argv) > 3 else ()
    sys.exit(main(sys.argv[1], sys.argv[2], skip))
