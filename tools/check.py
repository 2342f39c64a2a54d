#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL
in DuckDB against the same parquet tables and compare with the Verify
parquet dumps (columns sorted by name, exact value compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, math, glob, struct

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        # BIT-EXACT, matching the driver's hash: -0.0 != +0.0. The r8
        # verdict's three hash fails (doc_dsir_weights, text_learnability,
        # log_change_decomposition) all passed the old `fa == fb` compare
        # because IEEE == treats -0.0 and +0.0 as equal while the driver
        # hashes the bit patterns. Never weaken this back.
        return struct.pack("<d", fa) == struct.pack("<d", fb)
    if isinstance(a, (int,)) and isinstance(b, (int,)):
        return a == b
    return str(a) == str(b)


def selftest():
    """Regression fixture for the negative-zero class (r8 verdict): the
    compare must FAIL an injected -0.0 vs +0.0 divergence and still pass
    NaN==NaN and ordinary equality. Run: python3 tools/check.py --selftest
    """
    assert not cell_eq(-0.0, 0.0), "-0.0 vs +0.0 must MISMATCH (bit-exact)"
    assert not cell_eq(0.0, -0.0), "+0.0 vs -0.0 must MISMATCH (bit-exact)"
    assert cell_eq(0.0, 0.0) and cell_eq(-0.0, -0.0)
    assert cell_eq(float("nan"), float("nan"))
    assert cell_eq(1.25, 1.25) and not cell_eq(1.25, 1.2500001)
    assert cell_eq(None, None) and cell_eq(3, 3) and cell_eq("x", "x")
    assert cell_eq(2, 2.0), "int vs float same value compares equal"
    print("ok   selftest (negative-zero fixture)")


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
    # --json PATH: also write a driver-format correctness artifact
    # ({query: {rows_match, schema_match, hash_match, spark_rows,
    # oracle_rows, err}}) — used at round close to commit
    # CORRECTNESS_r{N}.json alongside the driver's own copy (r10's
    # artifacts were lost; verdict r11 ask #4)
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check.py [--json OUT] <sfDir> <verifyOutDir> [query ...]")
            sys.exit(2)
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sfdir, outdir = args[0], args[1]
    only = set(args[2:])
    report = {}
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    unknown = only - set(oracle)
    if unknown:
        print(f"FAIL: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        report[name] = rec
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            rec["err"] = "no spark output"
            n_bad += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        rec["spark_rows"] = len(got)
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            rec["err"] = f"oracle error: {e}"
            n_bad += 1
            continue
        rec["oracle_rows"] = len(want)
        rec["schema_match"] = list(got.columns) == list(want.columns)
        rec["rows_match"] = len(got) == len(want)
        if not rec["schema_match"]:
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if not rec["rows_match"]:
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        bad = None
        for ci, c in enumerate(got.columns):
            gv, wv = got[c].tolist(), want[c].tolist()
            for ri in range(len(gv)):
                if not cell_eq(gv[ri], wv[ri]):
                    bad = (ri, c, gv[ri], wv[ri])
                    break
            if bad:
                break
        if bad:
            ri, c, g, w = bad
            print(f"FAIL {name}: row {ri} col {c}: spark={g!r} duckdb={w!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            rec["hash_match"] = True
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"json report -> {json_out}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
