#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify's parquet
outputs + oracle_sql.json, run each oracle in DuckDB against the same
testdata parquet, compare (sort columns by name, compare rows).

STRICT MODE (round 2): the driver's hasher is sensitive to value
*representation*, not just value. Empirically (see memory/oracle-parity-rules):
DuckDB's pandas fetch coerces DECIMAL(any p,s) and HUGEINT to float64
("1.10" -> 1.1, 5 -> 5.0) while parquet reads keep Decimal/int64 — so a
bit-exact value can still hash-mismatch. This checker therefore:
  1. compares values with type tags (int 5 != float 5.0) and exact float
     bits (float.hex, no rounding);
  2. coerces the DuckDB side exactly like pandas would (DECIMAL/HUGEINT ->
     float64) while reading the Spark side natively via pyarrow — making
     local FAIL predict driver FAIL;
  3. fails outright on any DECIMAL or HUGEINT output column on either side
     ("fragile type"): the catalog bans them — sum in decimal internally,
     emit BIGINT cents or exact doubles.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
Dev-only tool (driver-side python libs); not part of the shipped library.
"""
import sys, json, glob, math, os, re, decimal
import duckdb
import pyarrow.parquet as pq


def canon_duck_type(t):
    s = str(t).upper()
    if s.endswith("[]"):
        return canon_duck_type(s[:-2]) + "[]"
    if s.startswith("DECIMAL"):
        return s.replace(" ", "").lower()
    return {
        "BIGINT": "bigint", "INTEGER": "int", "SMALLINT": "smallint",
        "TINYINT": "tinyint", "HUGEINT": "hugeint", "DOUBLE": "double",
        "FLOAT": "float", "VARCHAR": "string", "BOOLEAN": "boolean",
        "DATE": "date", "BLOB": "binary",
    }.get(s, "timestamp" if s.startswith("TIMESTAMP") else s.lower())


def canon_arrow_type(t):
    import pyarrow as pa
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return canon_arrow_type(t.value_type) + "[]"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_int64(t): return "bigint"
    if pa.types.is_int32(t): return "int"
    if pa.types.is_int16(t): return "smallint"
    if pa.types.is_int8(t): return "tinyint"
    if pa.types.is_float64(t): return "double"
    if pa.types.is_float32(t): return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t): return "string"
    if pa.types.is_boolean(t): return "boolean"
    if pa.types.is_date(t): return "date"
    if pa.types.is_timestamp(t): return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t): return "binary"
    if pa.types.is_struct(t): return "struct"
    return str(t)


# The ban below makes a pandas-coercion mimic unnecessary: any column that
# WOULD coerce (decimal/hugeint) fails outright, which is exactly the
# driver-observable outcome — the catalog must not emit such types at all.
FRAGILE = re.compile(r"decimal|hugeint")


def norm(v):
    """Type-tagged exact normalization: int 5 != float 5.0, no rounding."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v): return ("f", "NaN")
        return ("f", float.hex(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))  # scale-preserving: 1.10 stays "1.10"
    if isinstance(v, bytes):
        return ("x", v.hex())
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    return v


def load_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], [cols[i] for i in range(len(cols))], out, order


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        pdir = os.path.join(out_dir, name)
        try:
            t = pq.read_table(pdir)
            scols = t.column_names
            stypes = [canon_arrow_type(f.type) for f in t.schema]
            srows = [tuple(row[c] for c in scols) for row in t.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}"); n_fail += 1; continue
        try:
            rel = con.sql(sql)
            dcols = list(rel.columns)
            dtypes = [canon_duck_type(x) for x in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        # fragile-type ban: decimal/hugeint hash-diverge at the driver
        frag = [f"spark:{c}:{ty}" for c, ty in zip(scols, stypes) if FRAGILE.search(ty)] + \
               [f"duck:{c}:{ty}" for c, ty in zip(dcols, dtypes) if FRAGILE.search(ty)]
        if frag:
            print(f"FAIL {name}: fragile output types (driver hasher diverges on these): {frag}")
            n_fail += 1
            continue
        sc, _, sr, _ = load_rows(scols, srows)
        dc, _, dr, dorder = load_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}"); n_fail += 1; continue
        # driver tolerance: all int widths hash alike (python int), json
        # fetches as str — compare representation *classes*, not widths
        def cls(ty):
            for k in ("tinyint", "smallint", "bigint", "int"):
                ty = ty.replace(k, "int")
            return ty.replace("float", "double").replace("json", "string")
        sty = [cls(stypes[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])]
        dty = [cls(dtypes[i]) for i in dorder]
        if sty != dty:
            print(f"FAIL {name}: column types differ\n  spark={list(zip(sc, sty))}\n  duck ={list(zip(dc, dty))}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}"); n_fail += 1
            print(f"  spark[:3]={sr[:3]}\n  duck[:3]={dr[:3]}")
            continue
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
