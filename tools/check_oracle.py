#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
Scala library does not depend on this).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query parquet dumped by graft.Verify, replays the oracle SQL in
DuckDB over the same testdata tables and compares: schema (column names),
row count, and values (columns sorted by name, rows sorted by all
columns, exact equality).
"""
import sys, json, math, os, struct

import duckdb

NEG_ZERO_BITS = struct.pack('<d', -0.0)


def is_negzero(x):
    if isinstance(x, float):
        return struct.pack('<d', x) == NEG_ZERO_BITS
    if isinstance(x, (list, tuple)):
        return any(is_negzero(v) for v in x)
    if isinstance(x, dict):
        return any(is_negzero(v) for v in x.values())
    return False

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    t = con.execute(rel_sql).fetch_arrow_table()
    import pyarrow as pa
    cols = sorted(t.column_names)
    t = t.select(cols)
    rows = [tuple(t.column(c)[i].as_py() for c in cols) for i in range(t.num_rows)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # Bit-compare, like the driver's type/byte-aware hash: -0.0 != +0.0.
        return struct.pack('<d', a) == struct.pack('<d', b)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(eq(v, b[k]) for k, v in a.items())
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        try:
            gcols, grows = canon(con, f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            if any(is_negzero(x) for r in grows for x in r):
                print(f"FAIL {name}: negative-zero lint (rows-only query)")
                n_fail += 1
            else:
                print(f"SKIP {name}: no oracle (rows-only check: {len(grows)} rows)")
            continue
        try:
            ocols, orows = canon(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if gcols != ocols:
            print(f"FAIL {name}: columns differ\n  spark : {gcols}\n  oracle: {ocols}")
            n_fail += 1
            continue
        if len(grows) != len(orows):
            print(f"FAIL {name}: row count spark={len(grows)} oracle={len(orows)}")
            n_fail += 1
            continue
        # Registry-wide negative-zero lint: round(x, 9) of a tiny-negative
        # double yields -0.0 in DuckDB (binary round keeps the IEEE sign)
        # but +0.0 in Spark (BigDecimal has no signed zero) — a knife-edge
        # class the value-compare below can't see on its own side.
        # Normalize at source (when(c === 0d, lit(0d)) / x + 0.0) instead.
        nz = None
        for side, rws in (("spark", grows), ("oracle", orows)):
            for i, r in enumerate(rws):
                for c, x in zip(gcols, r):
                    if is_negzero(x):
                        nz = (side, i, c, x)
                        break
                if nz:
                    break
            if nz:
                break
        if nz:
            side, i, c, x = nz
            print(f"FAIL {name}: negative-zero lint: {side} row {i} col {c} "
                  f"is -0.0 — normalize signed zero at the source")
            n_fail += 1
            continue
        bad = None
        for i, (gr, orow) in enumerate(zip(grows, orows)):
            if not all(eq(x, y) for x, y in zip(gr, orow)):
                bad = (i, gr, orow)
                break
        if bad:
            i, gr, orow = bad
            print(f"FAIL {name}: first diff at sorted row {i}")
            for c, x, y in zip(gcols, gr, orow):
                if not eq(x, y):
                    print(f"    {c}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(grows)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
