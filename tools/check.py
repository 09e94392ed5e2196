#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify's parquet
outputs + oracle_sql.json, run each oracle in DuckDB against the same
testdata parquet, compare (sort columns by name, sort rows, compare values).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
Dev-only tool (driver-side python libs); not part of the shipped library.
"""
import sys, json, glob, math, os
import duckdb
import pyarrow.parquet as pq

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list): return tuple(norm(x) for x in v)
    if isinstance(v, dict): return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"): return v.isoformat()
    import decimal
    if isinstance(v, decimal.Decimal): return str(v)
    return v

def load_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only: continue
        pdir = os.path.join(out_dir, name)
        try:
            t = pq.read_table(pdir)
            scols = t.column_names
            srows = [tuple(row[c] for c in scols) for row in t.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}"); n_fail += 1; continue
        try:
            res = con.execute(sql)
            dcols = [c[0] for c in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        sc, sr = load_rows(scols, srows)
        dc, dr = load_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}"); n_fail += 1; continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}"); n_fail += 1
            print(f"  spark[:3]={sr[:3]}\n  duck[:3]={dr[:3]}")
            continue
        # compare both as-ordered and sorted (driver may do either)
        mism = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
        if mism:
            i, a, b = mism[0]
            print(f"FAIL {name}: {len(mism)}/{len(sr)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
