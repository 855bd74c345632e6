#!/usr/bin/env python3
"""Dev-only mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [--only q1,q2,...] [--times]
  - expects <outDir>/<name>/ parquet dirs (written by graft.Verify)
    and <outDir>/oracle_sql.json
  - registers each parquet table from <sfDir> as a DuckDB view,
    runs every oracle SQL, and compares to the Spark result:
    columns sorted by name, rows as written (both sides ORDER BY).
  - --only: restrict to a comma-separated list of FULL query names
    (the sf1eq delta gate, tools/sf1gate.py, drives this).
  - --times: print per-oracle DuckDB wall seconds (the SURVEY 6.21
    oracle-cost column).

NOT part of the shipped library (driver-side python is allowed for
dev tooling only).
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


#: DuckDB result types that pandas renders as float64/object and the
#: driver's dtype-sensitive hash then mismatches against Spark's int64.
#: Any oracle output column with one of these types is a latent red cell
#: even when every value is equal (observed: q151 in round 6 — sum(BIGINT)
#: widens to HUGEINT). Oracles must CAST sum-derived columns to BIGINT.
WIDENED = ("HUGEINT", "UHUGEINT", "DECIMAL", "INT128")


def audit_dtypes(sf_dir: str, out_dir: str) -> int:
    """`--dtypes` mode: DESCRIBE every oracle (no execution) and fail on
    any result column whose DuckDB type is in WIDENED."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error {e}")
            n_bad += 1
            continue
        bad = [(c, t) for c, t, *_ in desc if any(w in t.upper() for w in WIDENED)]
        if bad:
            print(f"FAIL {name}: widened oracle dtypes {bad}")
            n_bad += 1
        else:
            print(f"PASS {name}: {[t for _, t, *_ in desc]}")
    print(f"{len(oracles) - n_bad}/{len(oracles)} dtype-clean")
    return 1 if n_bad else 0


def main(sf_dir: str, out_dir: str, only=None, times=False) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        missing = sorted(set(only) - set(oracles))
        if missing:
            print(f"FAIL --only names not registered: {missing}")
            return 1
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            import time as _time
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            t0 = _time.time()
            exp = canon(con.execute(sql).df())
            if times:
                print(f"TIME {name}: {_time.time() - t0:.1f}s oracle wall")
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
            continue
        diffs = []
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = (~eq).idxmax()
                diffs.append(f"col {c} (dtype {a.dtype}/{b.dtype}) row {i}: {a[i]!r} != {b[i]!r}")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3]))
            n_bad += 1
        else:
            dt_note = ""
            for c in got.columns:
                if str(got[c].dtype) != str(exp[c].dtype):
                    dt_note += f" [dtype {c}: {got[c].dtype} vs {exp[c].dtype}]"
            print(f"PASS {name} ({len(got)} rows){dt_note}")
    print(f"{len(oracles) - n_bad}/{len(oracles)} passed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    times = "--times" in argv
    argv = [a for a in argv if a != "--times"]
    if "--dtypes" in argv:
        args = [a for a in argv if a != "--dtypes"]
        sys.exit(audit_dtypes(args[0], args[1]))
    sys.exit(main(argv[0], argv[1], only=only, times=times))
