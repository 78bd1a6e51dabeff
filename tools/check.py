#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
reads Verify's parquet dumps + oracle_sql.json, runs each oracle in
DuckDB over the same sf parquet tables, compares sorted-by-column-name
values. Dev-only tool — NOT part of the shipped Scala library.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            got = duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: engine output missing: {e}")
            n_bad += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_bad += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_bad += 1
            continue
        def isnull(v):
            # catches None, float NaN, and pd.NaT uniformly: null scalars
            # are the only values unequal to themselves
            try:
                return v is None or v != v
            except Exception:
                return False

        bad = None
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                na_a, na_b = isnull(a), isnull(b)
                if na_a or na_b:
                    # pandas may surface the same null as None/NaN/NaT on
                    # the two sides — any null==any null, null!=value
                    if na_a and na_b:
                        continue
                    bad = (c, i, a, b)
                    break
                if hasattr(a, "to_pydatetime"):
                    a = a.to_pydatetime()
                if hasattr(b, "to_pydatetime"):
                    b = b.to_pydatetime()
                try:
                    same = bool(a == b)
                except Exception:
                    same = str(a) == str(b)
                if not same:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} exp={a!r} got={b!r}")
            n_bad += 1
        else:
            dtypes = {c: str(exp[c].dtype) for c in exp.columns}
            gtypes = {c: str(got[c].dtype) for c in got.columns}
            note = "" if dtypes == gtypes else f"  [dtype diff exp={dtypes} got={gtypes}]"
            print(f"OK   {name}  rows={len(exp)}{note}")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
