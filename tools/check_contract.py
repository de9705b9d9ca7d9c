"""Local stand-in for the driver's CORRECTNESS check: runs every queries()
entry at the given sf and compares SQL-checked ones against oracle_sql()
via DuckDB (row count + schema + order-insensitive value comparison)."""

import sys
import time
import warnings

warnings.filterwarnings("ignore")

import duckdb
import numpy as np
import pandas as pd
import ray
import ray.data


def to_pandas(x):
    if isinstance(x, pd.DataFrame):
        return x
    if hasattr(x, "to_pandas"):
        return x.to_pandas()
    raise TypeError(type(x))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None):
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    qs = E.queries()
    sqls = E.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        el = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows={len(got)} cols={list(got.columns)} "
                  f"({el:.1f}s, rows-only)")
            continue
        try:
            exp = normalize(con.execute(sqls[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised: {ex}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            failures += 1
            continue
        bad = False
        for c in got.columns:
            a, b = got[c].to_numpy(), exp[c].to_numpy()
            if np.issubdtype(np.asarray(a).dtype, np.floating):
                eq = np.allclose(a.astype(float), b.astype(float),
                                 rtol=0, atol=1e-9)
            else:
                eq = np.array_equal(a, b)
            if not eq:
                print(f"FAIL {name}: column {c} differs; "
                      f"got head {a[:5]} exp head {b[:5]}")
                bad = True
        if bad:
            failures += 1
        else:
            print(f"PASS {name}: rows={len(got)} ({el:.1f}s)")
    ray.shutdown()
    print("failures:", failures)
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(1 if main(sf, only) else 0)
