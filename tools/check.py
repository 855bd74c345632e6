#!/usr/bin/env python3
"""Dev-only mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  - expects <outDir>/<name>/ parquet dirs (written by graft.Verify)
    and <outDir>/oracle_sql.json
  - registers each parquet table from <sfDir> as a DuckDB view,
    runs every oracle SQL, and compares to the Spark result:
    columns sorted by name, rows as written (both sides ORDER BY).

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


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            exp = canon(con.execute(sql).df())
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
    if "--dtypes" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--dtypes"]
        sys.exit(audit_dtypes(args[0], args[1]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
