#!/usr/bin/env python3
"""Local dev harness approximating the driver's correctness gate:
runs graft.Verify output against the DuckDB oracle and diffs.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols = [c[0] for c in got.description]
            grows = got.fetchall()
            exp = con.execute(sql)
            ecols = [c[0] for c in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        # Driver's hash gate is dtype-sensitive: a DuckDB HUGEINT or
        # DECIMAL oracle column hash-mismatches an engine BIGINT/DOUBLE
        # even when values are equal. Flag any oracle dtype outside the
        # repo's BIGINT/DOUBLE/VARCHAR/BOOLEAN/TIMESTAMP/DATE/BLOB/list
        # convention so the mismatch is caught locally, not by the gate.
        bad = [(c[0], str(c[1])) for c in exp.description
               if any(t in str(c[1]).upper()
                      for t in ("HUGEINT", "DECIMAL", "INT128"))]
        if bad:
            print(f"FAIL {name}: oracle dtype outside convention "
                  f"(driver hash gate will fail): {bad}")
            n_fail += 1
            continue
        gc, gr = canon(gcols, grows)
        ec, er = canon(ecols, erows)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}")
            diff = [(a, b) for a, b in zip(gr, er) if a != b]
            for a, b in diff[:3]:
                print(f"   engine: {a}\n   oracle: {b}")
            if len(gr) != len(er):
                sg, se = set(gr), set(er)
                for x in list(sg - se)[:3]:
                    print(f"   only-engine: {x}")
                for x in list(se - sg)[:3]:
                    print(f"   only-oracle: {x}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(gr)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
