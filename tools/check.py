#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT shipped library code).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
       python3 tools/check.py --selftest

Reads each <outDir>/<name>/ parquet (Spark result) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over <sfDir>/*.parquet,
then compares: row count, sorted-column names, and a HASH of the
column-name-sorted, row-sorted canonical value encoding.

The encoding is EXACT — floats are rendered with repr(), which preserves
the sign of zero ('-0.0' vs '0.0') and every last ulp. This mirrors the
driver's hash comparison; the r1–r3 version of this gate compared with
assert_frame_equal(atol=1e-9), under which -0.0 == +0.0, and that exact
gap let q73's signed-zero divergence pass locally for three rounds while
failing the driver's hash. --selftest seeds that fixture and asserts this
gate now catches it.
"""
import sys, os, json, glob, hashlib
from decimal import Decimal

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]


def canon_cell(v) -> str:
    """Canonical exact string for one value. repr() on floats preserves
    the zero sign and round-trips every bit. Decimals are rendered
    EXACTLY (integral -> int string; fractional -> full decimal string),
    NEVER through float64: the r11 version normalized Decimal->float64,
    which made a Spark decimal(38,0) column hash equal to DuckDB's
    HUGEINT->float64 even though the driver's exact encoding
    distinguishes them — exactly how q262/q284 shipped locally-green
    and failed the driver (the second gate-looser-than-driver incident
    after the r1–r3 atol gap this docstring's history recounts). An
    integral Decimal now encodes as the bare int string (matching a
    true int64 of the same value) while DuckDB's float64-materialized
    HUGEINT encodes as repr(float) — so a decimal-vs-hugeint dtype
    split FAILS locally, as it does on the driver."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, Decimal):
        if v != v:
            return "NaN"
        iv = v.to_integral_value()
        if v == iv:
            return str(int(iv))
        # fractional decimal: tagged so it can NEVER collide with a
        # float repr of the same value — a fractional decimal in an
        # output is always a dtype-portability bug to surface
        return "\x00DEC" + format(v, "f")
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon(df) -> tuple:
    """(sorted column names, sorted rows of canonical strings, sha256)."""
    import pandas as pd
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    cols = list(df.columns)
    enc_cols = []
    for c in cols:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            # Widen to float64 so a float32-vs-float64 dtype split between
            # engines (same stored value) encodes identically — but take the
            # NULL/NaN distinction from the ORIGINAL values: on a nullable
            # Float64 extension column, astype("float64") folds pd.NA into
            # NaN, which would encode a genuine NULL as "NaN".
            s64 = s.astype("float64")
            # Iterate the ORIGINAL series (not .to_numpy(), which folds
            # pd.NA into nan on masked arrays): element access yields
            # pd.NA for NULL and nan for a genuine NaN.
            enc_cols.append(["\x00NULL" if orig is pd.NA or orig is None
                             else ("NaN" if x != x else canon_cell(float(x)))
                             for orig, x in zip(iter(s), s64.to_numpy())])
        elif pd.api.types.is_integer_dtype(s):
            # Nullable Int64 carries pd.NA, on which int() raises — the
            # gate must report a mismatch, not crash.
            enc_cols.append(["\x00NULL" if pd.isna(x) else str(int(x))
                             for x in s.to_numpy()])
        elif pd.api.types.is_bool_dtype(s):
            enc_cols.append(["\x00NULL" if pd.isna(x) else str(bool(x))
                             for x in s.to_numpy()])
        elif pd.api.types.is_datetime64_any_dtype(s):
            ss = s.astype("datetime64[us]")
            enc_cols.append(["\x00NULL" if pd.isna(x)
                             else x.isoformat() for x in ss])
        else:
            enc_cols.append([canon_cell(x) if not (x is None or
                             (isinstance(x, float) and x != x)) else
                             ("NaN" if isinstance(x, float) and x != x
                              else "\x00NULL")
                             for x in s.to_numpy()])
    rows = sorted(zip(*enc_cols)) if enc_cols and len(df) else []
    h = hashlib.sha256()
    for r in rows:
        for cell in r:
            h.update(cell.encode("utf-8"))
            h.update(b"\x1f")
        h.update(b"\x1e")
    return cols, rows, h.hexdigest()


def first_diff(rows_a, rows_b):
    for i, (ra, rb) in enumerate(zip(rows_a, rows_b)):
        if ra != rb:
            return i, ra, rb
    return len(min(rows_a, rows_b, key=len)), None, None


def selftest():
    import pandas as pd
    a = pd.DataFrame({"k": ["x", "y"], "v": [1.25, 0.0]})
    b = pd.DataFrame({"k": ["x", "y"], "v": [1.25, -0.0]})
    _, _, ha = canon(a)
    _, _, hb = canon(b)
    assert ha != hb, "gate MISSED a -0.0 vs +0.0 divergence"
    c = pd.DataFrame({"v": [0.0 + 0.0], "k": ["y"]})  # normalized, cols shuffled
    d = pd.DataFrame({"k": ["y"], "v": [-0.0 + 0.0]})
    _, _, hc = canon(c)
    _, _, hd = canon(d)
    assert hc == hd, "+0.0 normalization must hash equal across col order"
    # decimal-vs-hugeint fixture (the q262/q284 failure class): Spark's
    # decimal(38,0) lands in pandas as a Decimal object; DuckDB's HUGEINT
    # lands as float64. Equal VALUES must now hash DIFFERENT, because the
    # driver's exact encoding distinguishes the dtypes.
    e = pd.DataFrame({"v": pd.array([Decimal("2984905180860")],
                                    dtype=object)})
    f = pd.DataFrame({"v": [2984905180860.0]})
    assert canon(e)[2] != canon(f)[2], \
        "gate MISSED a decimal-vs-hugeint(float64) dtype split"
    # fractional decimal vs double: also distinct (exact decimal string
    # vs float repr)
    e2 = pd.DataFrame({"v": pd.array([Decimal("1.50")], dtype=object)})
    f2 = pd.DataFrame({"v": [1.5]})
    assert canon(e2)[2] != canon(f2)[2], \
        "gate MISSED a fractional decimal-vs-double dtype split"
    # integral decimal vs true int64 of the same value: equal (both
    # encode as the bare int string)
    e3 = pd.DataFrame({"v": pd.array([Decimal("42")], dtype=object)})
    f3 = pd.DataFrame({"v": pd.array([42], dtype="Int64")})
    assert canon(e3)[2] == canon(f3)[2], \
        "integral decimal must encode as the bare int string"
    import numpy as np
    g = pd.DataFrame({"v": pd.array([1, None], dtype="Int64")})
    _, rows_g, _ = canon(g)  # must not raise on pd.NA
    assert rows_g[0] == ("\x00NULL",), "nullable-int NA must encode as NULL"
    i32 = pd.DataFrame({"v": np.array([1.5, 0.25], dtype=np.float32)})
    i64 = pd.DataFrame({"v": np.array([1.5, 0.25], dtype=np.float64)})
    assert canon(i32)[2] == canon(i64)[2], \
        "float32 vs float64 dtype split on equal values must hash equal"
    # FloatingArray with an explicit mask: slot 1 is NULL, slot 2 a real NaN
    # (pd.array(...) would silently fold the literal nan into NA).
    fx = pd.DataFrame({"v": pd.arrays.FloatingArray(
        np.array([1.5, 0.0, np.nan]), np.array([False, True, False]))})
    _, rows_fx, _ = canon(fx)
    assert sorted(r[0] for r in rows_fx) == ["\x00NULL", "1.5", "NaN"], \
        "nullable-Float64 must keep NULL distinct from NaN after widening"
    print("selftest OK: -0.0 detected, +0.0 normalization stable, "
          "decimal-vs-hugeint split detected, decimal==int64 when "
          "integral, nullable-int NA safe, f32/f64 unified, "
          "Float64 NULL!=NaN")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return
    import duckdb
    import pandas as pd
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table: a directory of part files (the
            # adversarial sf dirs are staged this way)
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noora = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if files:
            spark_df = pd.concat([pd.read_parquet(f) for f in files],
                                 ignore_index=True)
        else:
            # an AQE-coalesced EMPTY result can commit zero part files
            # (degenerate-corpus gate runs); the rows/hash compare is
            # still exact, only the column-name check degrades to
            # "oracle's own columns" for this 0-row case
            spark_df = None
        if name not in oracle:
            nr = "?" if spark_df is None else len(spark_df)
            print(f"  {name}: NO-ORACLE rows={nr}")
            n_noora += 1
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        if spark_df is None:
            spark_df = pd.DataFrame(columns=duck_df.columns)
        cols_a, rows_a, hash_a = canon(spark_df)
        cols_b, rows_b, hash_b = canon(duck_df)
        if cols_a != cols_b:
            print(f"✗ {name}: COLUMN MISMATCH spark={cols_a} duck={cols_b}")
            n_fail += 1
        elif len(rows_a) != len(rows_b):
            print(f"✗ {name}: ROWCOUNT spark={len(rows_a)} duck={len(rows_b)}")
            n_fail += 1
        elif hash_a != hash_b:
            i, ra, rb = first_diff(rows_a, rows_b)
            print(f"✗ {name}: HASH MISMATCH at sorted row {i}:\n"
                  f"    spark={ra}\n    duck ={rb}\n    cols ={cols_a}")
            n_fail += 1
        else:
            print(f"✓ {name}: rows={len(rows_a)} hash={hash_a[:12]}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
