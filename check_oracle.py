#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Loads each Verify-dumped parquet result and replays the matching
oracle_sql.json entry in DuckDB over the same sf directory, then
compares rows / sorted-column schema / a canonical value hash the same
way the driver does (columns sorted by name, rows sorted, values
stringified with float rounding). Dev tool only — not part of the
library.
"""
import sys, os, json, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    names = sorted(os.listdir(out_dir))
    for name in names:
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and not any(s in name for s in only):
            continue
        tbl = pq.read_table(d)
        scols = list(tbl.column_names)
        srows = [tuple(r.values()) for r in tbl.to_pylist()]
        if name not in oracles:
            print(f"{name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [c[0] for c in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            bad += 1
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = ok_rows and ok_schema and \
            frame_hash(scols, srows) == frame_hash(ocols, orows)
        if ok_rows and ok_schema and ok_hash:
            pass
        else:
            bad += 1
            print(f"{name}: rows {len(srows)}/{len(orows)} "
                  f"schema_ok={ok_schema} hash_ok={ok_hash}")
            if not ok_schema:
                print(f"  spark={sorted(scols)}\n  duck ={sorted(ocols)}")
    print(f"checked {len(oracles)} oracles, {bad} mismatched")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:] or None))
