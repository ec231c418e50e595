#!/usr/bin/env python3
"""Parallel + cached cross-SF oracle sweep (VERDICT r11 #1).

The driver's per-round gate runs at sf0.01; the cross-SF sweep is OUR
evidence that every entry is hash-exact at sf0.001/0.01/0.1 too. At
sf0.1 the brute-force n^2 oracle section (all-pairs shingle joins over
5000 docs) costs ~9 min of DuckDB per entry — engine dumps finish in
minutes, the ORACLE side was the reason r11 closed at 69/120.

This tool makes the sweep repeatable in minutes:
  * runs each entry's DuckDB side in a process pool (--jobs),
  * caches the oracle result parquet keyed by md5(sql) per SF under
    fixtures/oracle_cache/<sf>/ — identical SQL across entries (e.g.
    pl_d2/pl_d11 share the verbatim truth-pairs text) runs ONCE, and
    re-sweeps after engine-only changes are pure cache hits,
  * compares with the exact same normalize/compare rules as
    tools/check_oracle.py (imported, not copied).

Usage: python3 tools/sweep_oracle.py <verify_out_dir> <sf_dir> \
           [--jobs N] [--cache DIR] [--only name ...]
Writes a per-entry PASS/FAIL line plus wall-clock; exit 1 on any FAIL.
"""
import argparse, hashlib, json, os, sys, time
import glob as globmod
from concurrent.futures import ProcessPoolExecutor, as_completed

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import normalize

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cache_path(cache_dir, sql):
    return os.path.join(cache_dir, hashlib.md5(sql.encode()).hexdigest() + ".parquet")


def run_oracle(args):
    """Worker: DuckDB-execute one oracle SQL (or load it from cache);
    returns (name, cache_file, seconds, cached)."""
    name, sql, sf_dir, cache_dir, threads = args
    cpath = cache_path(cache_dir, sql)
    if os.path.exists(cpath):
        return name, cpath, 0.0, True
    import duckdb
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        # partial fixture dirs (fixtures/sf1 carries only the
        # documents/embeddings/events tables) — skip absent tables so
        # oracles that never touch them still run
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    t0 = time.time()
    df = con.execute(sql).df()
    dt = time.time() - t0
    tmp = cpath + f".tmp{os.getpid()}"
    df.to_parquet(tmp, index=False)
    os.replace(tmp, cpath)
    return name, cpath, dt, False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("sf_dir")
    ap.add_argument("--jobs", type=int, default=6)
    ap.add_argument("--threads", type=int, default=8,
                    help="DuckDB threads per worker")
    ap.add_argument("--cache", default=None)
    ap.add_argument("--only", nargs="*", default=None)
    a = ap.parse_args()
    sf_tag = os.path.basename(a.sf_dir.rstrip("/"))
    cache_dir = a.cache or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "oracle_cache", sf_tag)
    os.makedirs(cache_dir, exist_ok=True)
    oracle = json.load(open(os.path.join(a.out_dir, "oracle_sql.json")))
    if a.only:
        oracle = {k: v for k, v in oracle.items() if k in set(a.only)}

    # one DuckDB run per DISTINCT SQL text; identical texts share it
    by_sql = {}
    for name, sql in sorted(oracle.items()):
        by_sql.setdefault(sql, []).append(name)
    jobs = [(names[0], sql, a.sf_dir, cache_dir, a.threads)
            for sql, names in by_sql.items()]
    t_start = time.time()
    want_file = {}
    with ProcessPoolExecutor(max_workers=a.jobs) as ex:
        futs = {ex.submit(run_oracle, j): j for j in jobs}
        for f in as_completed(futs):
            name, cpath, dt, cached = f.result()
            sql = futs[f][1]
            for n in by_sql[sql]:
                want_file[n] = cpath
            if not cached:
                print(f"[oracle] {name}: {dt:.1f}s", flush=True)

    import pandas as pd
    n_pass = n_fail = 0
    fails = []
    for name in sorted(oracle):
        spark_files = globmod.glob(os.path.join(a.out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            fails.append(name); continue
        try:
            got = normalize(pd.concat([pd.read_parquet(f) for f in spark_files]))
            want = normalize(pd.read_parquet(want_file[name]))
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; fails.append(name); continue
        ok, why = compare(got, want)
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: {why}"); n_fail += 1; fails.append(name)
    print(f"== {n_pass} pass / {n_fail} fail == "
          f"({time.time() - t_start:.0f}s wall, sf={sf_tag})")
    if fails:
        print("failed:", " ".join(fails))
    sys.exit(1 if n_fail else 0)


def compare(got, want):
    """Same rules as check_oracle.py's inline compare."""
    import numpy as np
    import pandas as pd
    if list(got.columns) != list(want.columns):
        return False, f"columns {list(got.columns)} != {list(want.columns)}"
    if len(got) != len(want):
        return False, f"rows {len(got)} != {len(want)}"
    for c in got.columns:
        a_, b_ = got[c].to_numpy(), want[c].to_numpy()
        if a_.dtype.kind == 'f' or b_.dtype.kind == 'f':
            eq = (a_ == b_) | (pd.isna(a_) & pd.isna(b_))
        else:
            eq = (a_ == b_) | (pd.isna(pd.Series(a_)) & pd.isna(pd.Series(b_))).to_numpy()
        if not eq.all():
            i = int(np.argmin(eq))
            return False, (f"col {c} row {i}: spark={a_[i]!r} duckdb={b_[i]!r} "
                           f"(dtypes {a_.dtype}/{b_.dtype})")
    return True, ""


if __name__ == "__main__":
    main()
