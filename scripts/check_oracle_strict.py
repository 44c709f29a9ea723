#!/usr/bin/env python3
"""STRICT local twin of the driver's DuckDB correctness gate.

Usage: check_oracle_strict.py <sfDir> <verifyOutDir> [only1,only2,...]

Unlike check_oracle.py (which rounds floats to 6 places and canonicalizes
-0.0 — useful as a diagnostic, but it masks exactly the bit-level
differences the driver's hash distinguishes), this mode compares the RAW
IEEE-754 bits of every float cell. A Spark +0.0 vs DuckDB -0.0 is a FAIL
here, as it is at the driver. This is the pre-commit gate; the rounded
checker remains for diagnosing *which* kind of difference you have.
"""
import sys, json, glob, math, struct

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cell_key(v):
    """Canonical strict representation: floats by raw IEEE bits (NaNs
    collapsed to one canonical NaN so only *payload* noise is ignored),
    everything else by type-tagged string."""
    if v is None:
        return "\x00null"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "f:nan"
        return "f:" + struct.pack("<d", f).hex()
    if isinstance(v, (np.integer,)):
        return "i:" + str(int(v))
    if isinstance(v, (int,)):
        return "i:" + str(v)
    if isinstance(v, (np.bool_, bool)):
        return "b:" + str(bool(v))
    if isinstance(v, bytes):
        return "y:" + v.hex()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(cell_key(x) for x in v) + "]"
    # timestamps, dates, strings, decimals: normalized string form
    if v is pd.NaT:
        return "\x00null"
    try:
        if pd.isna(v):
            return "\x00null"
    except (TypeError, ValueError):
        pass
    return "s:" + str(v)


def frame_rows(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = [tuple(cell_key(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
            n_fail += 1
            continue
        g, e = frame_rows(got), frame_rows(exp)
        if len(g) > 0 and len(e) == 0:
            # DuckDB's file readers (read_blob/read_parquet/read_csv over a
            # glob) return 0 rows with NO error when the glob matches nothing
            # — the exact shape of the round-11 m03 red (an oracle SQL that
            # embedded a deleteOnExit temp path). Call it out as the likely
            # dead-input-path it is, not a generic count mismatch.
            print(f"FAIL {name}: oracle returned 0 rows while spark returned "
                  f"{len(g)} — SUSPECT DEAD INPUT PATH (a file-reading oracle "
                  f"whose glob matches nothing fails SILENTLY in DuckDB; check "
                  f"any filesystem path embedded in the oracle SQL)")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(g, e) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(g)} bit-mismatched rows; "
                  f"first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows, bit-exact)")
            n_pass += 1
    print(f"== STRICT {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
