#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle_sql.json entry in
DuckDB against the sf parquet tables, compare (schema-insensitively: columns sorted by
name, rows sorted, values normalized) with the Spark parquet dumps from graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    # everything becomes a string so heterogeneous (None/float/str) rows sort stably
    if v is None: return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def table_rows(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = sorted(tuple(norm(v) for v in row) for row in zip(*data)) if data else []
    return cols, rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table dir (DataGen output): glob the parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # optional 3rd arg: comma-separated query names to skip (e.g. the pair-exhaustive
    # O(n^2) oracles, which are infeasible in DuckDB at rehearsal scale BY CONSTRUCTION
    # — avoiding that n^2 is what the engine's LSH/prefix-filter forms are for)
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    import time
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if name in skip:
            print(f"SKIP {name} (declared infeasible-oracle at this sf)", flush=True)
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            t0 = time.time()
            got = pq.read_table(spark_path)
            want = con.execute(oracles[name]).fetch_arrow_table()
            if time.time() - t0 > 10:
                print(f"  [{name}: oracle took {time.time()-t0:.0f}s]", flush=True)
            gc, gr = table_rows(got)
            wc, wr = table_rows(want)
            if gc != wc:
                print(f"FAIL {name}: columns {gc} != {wc}"); n_fail += 1; continue
            if gr != wr:
                diff = next((i for i,(a,b) in enumerate(zip(gr,wr)) if a!=b), min(len(gr),len(wr)))
                print(f"FAIL {name}: rows {len(gr)} vs {len(wr)}; first diff @{diff}:")
                print(f"  spark: {gr[diff] if diff < len(gr) else '<none>'}")
                print(f"  duck : {wr[diff] if diff < len(wr) else '<none>'}")
                n_fail += 1; continue
            print(f"PASS {name} ({len(gr)} rows)", flush=True); n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
