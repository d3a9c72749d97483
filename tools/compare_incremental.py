#!/usr/bin/env python3
"""Incremental, timeout-guarded oracle compare for long campaigns: runs
tools/compare_oracle.py ONE query at a time (GRAFT_ORACLE_ONLY) under a
process timeout, records per-query outcomes in a resumable state file,
and only touches queries whose Spark output already exists — so it can
run REPEATEDLY while a Verify sweep is still producing outputs, and a
single pathological DuckDB replay cannot stall the whole campaign
(the r9/r10 scale-campaign lesson, automated).

Usage: python3 tools/compare_incremental.py <sf_dir> <out_dir> <state.json>
                                            [timeout_sec=900]
Env: GRAFT_ORACLE_THREADS / GRAFT_ORACLE_MEMLIMIT pass through.
"""
import sys, os, json, glob, subprocess

def main(sf_dir, out_dir, state_path, timeout=900):
    state = {}
    if os.path.exists(state_path):
        state = json.load(open(state_path))
    sql_path = f"{out_dir}/oracle_sql.json"
    if not os.path.exists(sql_path):
        print(f"no {sql_path} yet"); return 0
    oracle = json.load(open(sql_path))
    here = os.path.dirname(os.path.abspath(__file__))
    for name in sorted(oracle):
        if name in state and state[name]["status"] != "timeout":
            continue
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            continue  # spark output not produced yet — next sweep
        env = dict(os.environ, GRAFT_ORACLE_ONLY=name)
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(here, "compare_oracle.py"),
                 sf_dir, out_dir],
                capture_output=True, text=True, timeout=timeout, env=env)
            line = next((l for l in p.stdout.splitlines()
                         if l.startswith(("OK", "FAIL"))), "no output")
            status = "ok" if line.startswith("OK") else "fail"
        except subprocess.TimeoutExpired:
            line, status = f"TIMEOUT after {timeout}s", "timeout"
        state[name] = {"status": status, "detail": line}
        print(f"{status:8s} {name}: {line}", flush=True)
        json.dump(state, open(state_path, "w"), indent=1)
    done = sum(1 for v in state.values() if v["status"] == "ok")
    bad = {k: v["detail"] for k, v in state.items() if v["status"] == "fail"}
    to = [k for k, v in state.items() if v["status"] == "timeout"]
    print(f"== {done} ok / {len(state)} attempted; fail={bad}; timeout={to}")
    return 0

if __name__ == "__main__":
    t = int(sys.argv[4]) if len(sys.argv) > 4 else 900
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], t))
