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
Env: GRAFT_ORACLE_THREADS / GRAFT_ORACLE_MEMLIMIT / GRAFT_ORACLE_TEMPLIMIT
     pass through. GRAFT_COMPARE_RETRY = comma-separated query names to
     force-retry regardless of recorded status (e.g. to re-run a 'fail'
     with a bigger memory limit).
"""
import sys, os, json, glob, subprocess

def _out_mtime(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    return max((os.path.getmtime(f) for f in files), default=None)

def _save(state, state_path):
    # atomic: a kill mid-write must not corrupt the resumable state
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, state_path)

def main(sf_dir, out_dir, state_path, timeout=900):
    state = {}
    if os.path.exists(state_path):
        state = json.load(open(state_path))
    sql_path = f"{out_dir}/oracle_sql.json"
    if not os.path.exists(sql_path):
        print(f"no {sql_path} yet"); return 0
    oracle = json.load(open(sql_path))
    here = os.path.dirname(os.path.abspath(__file__))
    force = set(filter(None, os.environ.get(
        "GRAFT_COMPARE_RETRY", "").split(",")))
    for name in sorted(oracle):
        mt = _out_mtime(out_dir, name)
        if mt is None:
            if name in force:
                # a forced retry must never vanish silently
                print(f"skipped  {name}: forced but no spark output yet",
                      flush=True)
            continue  # spark output not produced yet — next sweep
        if name in state and name not in force:
            st = state[name]["status"]
            # retry timeouts (unless deferred for this sweep), and ANY
            # recorded outcome — ok or fail — whose Spark output was
            # re-produced after the recorded attempt (a stale 'ok' kept
            # forever would hide a regression introduced after the pass);
            # keep everything else
            stale = mt > state[name].get("out_mtime", float("inf"))
            defer_to = os.environ.get("GRAFT_COMPARE_NO_TIMEOUT_RETRY")
            if (st in ("ok", "fail") and not stale) \
                    or (st == "timeout" and defer_to):
                continue
            if st == "ok" and stale:
                print(f"stale ok {name}: spark output re-produced after "
                      f"recorded pass — re-comparing", flush=True)
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
        state[name] = {"status": status, "detail": line, "out_mtime": mt}
        print(f"{status:8s} {name}: {line}", flush=True)
        _save(state, state_path)
    done = sum(1 for v in state.values() if v["status"] == "ok")
    bad = {k: v["detail"] for k, v in state.items() if v["status"] == "fail"}
    to = [k for k, v in state.items() if v["status"] == "timeout"]
    print(f"== {done} ok / {len(state)} attempted; fail={bad}; timeout={to}")
    return 0

if __name__ == "__main__":
    t = int(sys.argv[4]) if len(sys.argv) > 4 else 900
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], t))
