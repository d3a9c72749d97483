#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver:
run DuckDB on each oracle_sql.json entry over the testdata parquet and
compare against the Spark-written parquet in outDir (sorted columns,
sorted rows, exact value compare with small float tolerance report).

Usage: python3 tools/compare_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# MLlib-fit-family queries: their outputs embed a fitted model's values,
# which are NOT ulp-reproducible across JVMs — comparing one Verify leg's
# parquet against another leg's oracle literals produced the r14 campaign's
# two false-red kmeans rows. Verify stamps a per-JVM leg id into
# <out>/<query>/_LEG and <out>/oracle_leg.json; these queries REFUSE a
# cross-leg pairing instead of reporting a phantom value mismatch.
FIT_FAMILY = {"q_kmeans_sizes", "q_kmeans_inertia", "q_kmeans_restarts",
              "q_ksweep", "q_pca"}

def leg_of(path):
    try:
        with open(path) as f:
            s = f.read().strip()
        return json.loads(s)["leg"] if s.lstrip().startswith("{") else s
    except Exception:
        return None

def cross_leg(out_dir, name):
    """Returns (out_leg, oracle_leg) when a fit-family pairing crosses
    Verify legs; None when same-leg or when either stamp is absent
    (pre-r16 outputs carry no stamps — back-compat, caveat emptor)."""
    if name not in FIT_FAMILY:
        return None
    out_leg = leg_of(f"{out_dir}/{name}/_LEG")
    oracle_leg = leg_of(f"{out_dir}/oracle_leg.json")
    if out_leg and oracle_leg and out_leg != oracle_leg:
        return (out_leg, oracle_leg)
    return None

class ArrayColumn(Exception):
    pass

def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mimic the driver: sort columns by name, sort rows by all columns.
    The driver's pandas harness CRASHES on array-typed values (unhashable
    ndarray in sort/factorize) — replicate that as a loud failure instead
    of silently tuple-converting (round-1 divergence #2)."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(
                df[c].iloc[0], (list, tuple)) or any(
                hasattr(v, "__len__") and not isinstance(v, (str, bytes))
                for v in df[c].head(5)):
            raise ArrayColumn(c)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def dtypes_of(df: pd.DataFrame):
    """Driver hashing is dtype-KIND-sensitive: DuckDB HUGEINT/DECIMAL sums
    land as float64 while Spark writes int64 — those FAIL in the driver
    even though values compare equal (round-1: all 8 hash-fails). Integer
    WIDTH is normalized (int32 vs int64 was driver-green), so compare the
    kind after widening."""
    kinds = []
    for t in df.dtypes:
        k = t.kind if hasattr(t, "kind") else "O"
        kinds.append({"i": "int64", "u": "int64", "f": "float64",
                      "b": "bool"}.get(k, str(t)))
    return kinds

def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # GRAFT_ORACLE_THREADS caps DuckDB so a long compare can share the
    # box with a Spark bench; GRAFT_ORACLE_ONLY / GRAFT_ORACLE_SKIP
    # (comma-separated) subset the queries for resumes and iteration.
    import os
    threads = os.environ.get("GRAFT_ORACLE_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    # Large MATERIALIZED CTE chains (the graph-family replays) buffer
    # full intermediates; insertion order is irrelevant here because
    # canon() sorts rows before comparing, so let DuckDB stream instead
    # of preserving order (big reduction in temp spill at sf1).
    con.execute("SET preserve_insertion_order=false")
    memlimit = os.environ.get("GRAFT_ORACLE_MEMLIMIT")
    if memlimit:
        con.execute(f"SET memory_limit='{memlimit}'")
    # cap DuckDB's spill so a pathological replay (the sf10 graph chains
    # spilled >50 GB) fails CLEANLY instead of filling the disk under a
    # concurrently-running Spark campaign
    tmpcap = os.environ.get("GRAFT_ORACLE_TEMPLIMIT")
    if tmpcap:
        con.execute(f"SET max_temp_directory_size='{tmpcap}'")
    # spill OUTSIDE the repo: an in-memory DuckDB defaults its temp dir
    # to ./.tmp under cwd, which is how a 1.9 GB spill file ended up
    # committed in the r14 end-of-round snapshot
    tmpdir = os.environ.get("GRAFT_ORACLE_TEMPDIR", "/tmp/graft_duckdb_tmp")
    os.makedirs(tmpdir, exist_ok=True)
    con.execute(f"SET temp_directory='{tmpdir}'")
    only = {s for s in os.environ.get("GRAFT_ORACLE_ONLY", "").split(",") if s}
    skip = {s for s in os.environ.get("GRAFT_ORACLE_SKIP", "").split(",") if s}
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if (only and name not in only) or name in skip:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        xl = cross_leg(out_dir, name)
        if xl:
            print(f"FAIL {name}: CROSS-LEG pairing refused (output leg "
                  f"{xl[0]}, oracle leg {xl[1]}) — fit-family outputs must "
                  f"pair with oracle_sql.json from the SAME Verify JVM "
                  f"(same-run pairing rule; re-leg this query + "
                  f"oracle_sql.json in one Verify run)")
            n_bad += 1; continue
        try:
            got = canon(pq.read_table(files[0]).to_pandas())
        except ArrayColumn as ex:
            print(f"FAIL {name}: spark output column {ex} is array-typed — driver harness crashes on these"); n_bad += 1; continue
        except Exception as ex:
            print(f"FAIL {name}: read spark output: {ex}"); n_bad += 1; continue
        try:
            exp = canon(con.execute(sql).df())
        except ArrayColumn as ex:
            print(f"FAIL {name}: oracle column {ex} is array-typed — driver harness crashes on these"); n_bad += 1; continue
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}"); n_bad += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} duckdb={list(exp.columns)}"); n_bad += 1; continue
        if dtypes_of(got) != dtypes_of(exp):
            print(f"FAIL {name}: dtypes spark={dtypes_of(got)} duckdb={dtypes_of(exp)} (driver hash is dtype-sensitive)"); n_bad += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duckdb={len(exp)}"); n_bad += 1; continue
        bad = None
        for c in got.columns:
            # vectorized per-column compare (the r9 per-row Python loop
            # timed out >90 s/query on the sf1 799k-row stream joins):
            # exact equality with NaN==NaN, like the driver's hash. The
            # slow scalar path runs only to LOCALIZE an already-found
            # mismatch, never on the green path.
            a, b = got[c], exp[c]
            if (a.dtype.kind in "fmM") or (b.dtype.kind in "fmM") \
                    or a.dtype == object or b.dtype == object:
                # null-tolerant branch: float NaN, datetime NaT, object None
                neq = ~((a == b) | (a.isna() & b.isna()))
            else:
                neq = a != b
            if neq.any():
                # re-check EVERY flagged row with the authoritative scalar
                # compare, not just the first — a tolerated first row must
                # not mask a genuine mismatch later in the column
                for i in neq[neq].index:
                    av, bv = a.iloc[int(i)], b.iloc[int(i)]
                    if not eq(av, bv) and not (pd.isna(av) and pd.isna(bv)
                                               if not isinstance(av, (tuple, type(None))) else False):
                        bad = (int(i), c, av, bv); break
                if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duckdb={bad[3]!r}"); n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)"); n_ok += 1
    missing = [d.split("/")[-1] for d in glob.glob(f"{out_dir}/q*") if d.split("/")[-1] not in oracle]
    if missing:
        print(f"rows-only (no oracle): {sorted(missing)}")
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
