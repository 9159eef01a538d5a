#!/usr/bin/env python3
"""Full-registry driver-replica sweep with per-query timeouts.

Runs tools/check_driver.py (the driver-faithful checker) one query per
subprocess over an existing graft.Verify dump, so a single pathological
DuckDB oracle (recursive CTEs and shingle self-joins get expensive at
sf0.1) can be timed out and RECORDED without stalling the whole sweep.

Usage: sweep.py <sfDir> <verifyOutDir> [timeoutSec=600] [checker]
Writes a summary line per query and a final tally; exit 1 on any FAIL
(timeouts are reported separately — they are cost, not wrongness).
"""
import json
import os
import subprocess
import sys
import time


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    checker = sys.argv[4] if len(sys.argv) > 4 else "tools/check_driver.py"
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(k for k in oracle
                   if os.path.isdir(f"{out_dir}/{k}"))
    n_pass = n_fail = n_timeout = 0
    failures, timeouts = [], []
    for name in names:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, checker, sf_dir, out_dir, f"--only={name}"],
                capture_output=True, text=True, timeout=timeout)
            took = time.time() - t0
            ok = f"PASS {name}" in r.stdout
            if not ok:
                # One retry before recording a FAIL: a multi-hour sweep
                # must not go red on a transient (seen once: q209 flaked
                # under concurrent load, then passed 4/4 re-runs).
                r = subprocess.run(
                    [sys.executable, checker, sf_dir, out_dir,
                     f"--only={name}"],
                    capture_output=True, text=True, timeout=timeout)
                took = time.time() - t0
                if f"PASS {name}" in r.stdout:
                    print(f"PASS {name} ({took:.1f}s, on retry — "
                          "first attempt flaked)", flush=True)
                    n_pass += 1
                    continue
            if ok:
                n_pass += 1
                print(f"PASS {name} ({took:.1f}s)", flush=True)
            else:
                n_fail += 1
                failures.append(name)
                detail = [l for l in r.stdout.splitlines()
                          if l.startswith(("FAIL", "ERR"))]
                print(f"FAIL {name} ({took:.1f}s): "
                      + "; ".join(detail)[:300], flush=True)
        except subprocess.TimeoutExpired:
            n_timeout += 1
            timeouts.append(name)
            print(f"TIMEOUT {name} (> {timeout}s DuckDB oracle)", flush=True)
    print(f"\nSWEEP: {n_pass} pass, {n_fail} fail, {n_timeout} timeout, "
          f"{len(names)} dumped")
    if failures:
        print("failures: " + ",".join(failures))
    if timeouts:
        print("timeouts: " + ",".join(timeouts))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
