#!/usr/bin/env python3
"""Oracle-gate mutation smoke (VERDICT r16 task 5): prove the DuckDB
compare actually catches a wrong answer.

The whole correctness chain leans on check_oracle.py (and the driver's
equivalent) flagging a value mismatch. This meta-test runs Verify on two
queries with SPARK_GRAFT_MUTATION_SMOKE perturbing ONE of them (first
numeric column + 1, applied inside Verify just before the parquet write)
and asserts:
  - the perturbed query compares RED (VALUE_MISMATCH), and
  - the untouched control query compares GREEN in the SAME run
    (so a red can't be blamed on environment/setup).

Usage: python3 tools/mutation_smoke.py   (from the repo root)
Exit 0 = gate has teeth; nonzero = the compare failed to flag the
mutation (or the control broke) — STOP and investigate before trusting
any correctness record.
"""
import os
import shutil
import subprocess
import sys

SF = "/root/testdata/sf0.01"
OUT = "/tmp/graft_mutation_smoke"
MUTANT = "q02_lag_pairs"
CONTROL = "q01_tpch_agg"


def main():
    shutil.rmtree(OUT, ignore_errors=True)
    env = dict(os.environ,
               SPARK_GRAFT_ONLY=f"{CONTROL},{MUTANT}",
               SPARK_GRAFT_MUTATION_SMOKE=MUTANT)
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {SF} {OUT}"],
        env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        print("FAIL: Verify run itself failed")
        return 1
    if "MUTATION SMOKE" not in r.stderr + r.stdout:
        print("FAIL: Verify never announced the mutation — hook not engaged")
        return 1
    c = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "check_oracle.py"), SF, OUT],
        capture_output=True, text=True)
    out = c.stdout
    print(out)
    mutant_red = any(line.startswith("FAIL") and MUTANT in line
                     and "VALUE_MISMATCH" in line
                     for line in out.splitlines())
    control_green = any(line.startswith("PASS") and CONTROL in line
                        for line in out.splitlines())
    if not mutant_red:
        print(f"FAIL: oracle compare did NOT flag the mutated {MUTANT} — "
              f"the gate has no teeth; do not trust correctness records")
        return 1
    if not control_green:
        print(f"FAIL: control {CONTROL} did not pass — environment broken, "
              f"red on the mutant proves nothing")
        return 1
    print(f"PASS: mutation smoke — {MUTANT} flagged VALUE_MISMATCH, "
          f"{CONTROL} green in the same run; the oracle gate has teeth")
    return 0


if __name__ == "__main__":
    sys.exit(main())
