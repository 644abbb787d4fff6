#!/usr/bin/env python3
"""Local dev mirror of the driver's t2 DuckDB-oracle check (NOT part of the
shipped library). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out [query...]

Compares each Spark result parquet in outDir against the matching oracle SQL run
in DuckDB over the same tables: column names (sorted), row counts, and the full
sorted-row multiset. Reports per-query PASS/FAIL with first differing rows.
"""
import sys, os, json, glob
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    result_dirs = {os.path.basename(p): p for p in glob.glob(os.path.join(out_dir, "*"))
                   if os.path.isdir(p)}
    n_pass = n_fail = 0
    for name in sorted(result_dirs):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(result_dirs[name], "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: cannot read output: {e}"); n_fail += 1; continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only check: {got.num_rows} rows)")
            continue
        try:
            want = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gc, wc = sorted(got.column_names), sorted(want.column_names)
        if gc != wc:
            print(f"FAIL {name}: columns differ spark={gc} duck={wc}"); n_fail += 1; continue
        # TYPE-SENSITIVE gate (r3 lesson): the driver hashes typed arrow data, so
        # value-equal results with different arrow types (DuckDB sum(BIGINT) ->
        # HUGEINT/decimal128 vs Spark BIGINT) FAIL the driver while a pure Python
        # value compare passes. Require exact arrow-type equality per column, and
        # ban decimal output columns outright — r3's q_agg_decimal had bit-identical
        # DECIMAL values on both sides and still hash-failed in the driver's
        # comparator, so decimal is not a safe output encoding at all; emit scaled
        # BIGINT or pinned-scale strings instead (DECIMAL arithmetic internally is
        # fine).
        type_errs = []
        gt = {f.name: f.type for f in got.schema}
        wt = {f.name: f.type for f in want.schema}
        for c in gc:
            if str(gt[c]) != str(wt[c]):
                type_errs.append(f"column {c}: spark={gt[c]} duck={wt[c]}")
            for side, t in (("spark", gt[c]), ("duck", wt[c])):
                if "decimal" in str(t):
                    type_errs.append(
                        f"column {c}: {side} emits {t} — decimal output is "
                        "driver-hash-unsafe; emit scaled BIGINT or STRING")
        if type_errs:
            print(f"FAIL {name}: output types unsafe/mismatched:")
            for e in type_errs:
                print(f"   {e}")
            n_fail += 1; continue
        def norm(tbl):
            rows = list(zip(*[tbl.column(c).to_pylist() for c in sorted(tbl.column_names)]))
            return sorted(rows, key=lambda r: tuple((v is None, str(v)) for v in r))
        g, w = norm(got), norm(want)
        if len(g) != len(w):
            print(f"FAIL {name}: rowcount spark={len(g)} duck={len(w)}"); n_fail += 1; continue
        if g != w:
            diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs (spark vs duck):")
            for a, b in diffs:
                print(f"   spark: {a}\n   duck : {b}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
