#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: compare.py <sfDir> <outDir>
  <outDir> = dir written by graft.Verify (one parquet dir per query +
  oracle_sql.json).

For each query: run the oracle SQL in DuckDB with the sf tables
registered as views, load the Spark parquet result, sort columns by
name, sort rows, compare cell-exactly. Reports PASS/FAIL per query.
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple((x is None, str(x)) for x in t)
    return sorted(out, key=key), [cols[i] for i in order]


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    result_dirs = sorted(
        d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if "." not in d.split("/")[-1])
    for name in result_dirs:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS {name}: no spark output"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        gcols = [d[0] for d in con.description]
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            continue
        try:
            want = con.execute(oracle[name]).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        wcols = [d[0] for d in con.description]
        # type check: DESCRIBE both sides (catches INT32-vs-BIGINT drift
        # the value compare would miss)
        gt = dict((r[0].lower(), r[1]) for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall())
        wt = dict((r[0].lower(), r[1]) for r in con.execute(
            f"DESCRIBE {oracle[name]}").fetchall())
        tdiff = [(c, gt[c], wt[c]) for c in gt if c in wt and gt[c] != wt[c]]
        if tdiff:
            print(f"FAIL {name}: type mismatch {tdiff}"); n_fail += 1
            continue
        g, gc = canon(got, gcols)
        w, wc = canon(want, wcols)
        if [c.lower() for c in gc] != [c.lower() for c in wc]:
            print(f"FAIL {name}: columns {gc} != {wc}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}"); n_fail += 1
            continue
        bad = None
        for i, (rg, rw) in enumerate(zip(g, w)):
            if not all(cells_equal(a, b) for a, b in zip(rg, rw)):
                bad = (i, rg, rw); break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(result_dirs) - n_pass - n_fail} skipped(no-oracle)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
