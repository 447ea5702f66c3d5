#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (dev tool only, not
part of the shipped library).

Usage: python3 tools/oracle_check.py <sfdir> <outdir>

Assumes `graft.Verify` was already run with the same args (it writes
<outdir>/<name>/ parquet dirs + <outdir>/oracle_sql.json). Registers each
testdata table as a DuckDB view, runs every oracle statement, and
compares strictly: column names (sorted), row count, and cell values
(exact; floats reported with max-abs-diff when unequal).
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sfdir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((Path(outdir) / "oracle_sql.json").read_text())
    only = set(sys.argv[3:])  # optional: restrict to named queries
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = Path(outdir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no Spark result written")
            failures += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        bad = []
        for c in exp.columns:
            ev, gv = exp[c], got[c]
            try:
                import pandas as pd
                eq = (ev.values == gv.values) | (pd.isna(ev).values & pd.isna(gv).values)
            except Exception:
                eq = ev.astype(str).values == gv.astype(str).values
            if not eq.all():
                n = int((~eq).sum())
                detail = f"{c}: {n} diffs"
                if ev.dtype.kind == "f":
                    import numpy as np
                    detail += f" (max abs diff {np.nanmax(np.abs(ev.values - gv.values)):.3e})"
                else:
                    i = int((~eq).argmax())
                    detail += f" (first: got={gv.iloc[i]!r} exp={ev.iloc[i]!r} @row {i})"
                bad.append(detail)
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            failures += 1
        else:
            print(f"PASS {name} ({len(exp)} rows, {len(exp.columns)} cols)")
    print(f"\n{len(oracles) - failures}/{len(oracles)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
