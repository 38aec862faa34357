"""Calibration pre-check for scaling runs (VERDICT r6 item 1).

The north-rule pair is only worth recording when the window is quiet:
this runs the allocation-free pure-JVM calibration loop (the same loop
scripts/scaling.py measures inline) at two core counts, each in its own
subprocess (fresh JVM), and prints the N->4N calibration efficiency.
Record a scaling pair only when this gate prints >= ~0.95 — below that
the host itself cannot deliver linear CPU between the two levels and a
raw pipeline ratio would measure the window, not the plan.

Usage:  python scripts/calib_gate.py [small] [big]     (default 4 16)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_level(cpus: int) -> float:
    from s2_geometry_kotlin_spark.session import get_spark
    from scripts.scaling import _calibration
    spark = get_spark(f"calib-{cpus}", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    t = _calibration(spark, cpus, reps=2)
    spark.stop()
    return t


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        print(f"CALIB {run_level(int(sys.argv[2])):.3f}")
        return
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    here = os.path.abspath(__file__)
    cwd = os.path.dirname(os.path.dirname(here))
    secs = {}
    for cpus in (small, big):
        proc = subprocess.run(
            [sys.executable, here, "--run", str(cpus)],
            capture_output=True, text=True, timeout=900, cwd=cwd)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("CALIB ")]
        if not line:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
            raise SystemExit(f"calib level {cpus} failed")
        secs[cpus] = float(line[-1].split()[1])
    eff = (secs[small] / secs[big]) / (big / small)
    out = {"small": small, "big": big,
           "sec_small": secs[small], "sec_big": secs[big],
           "calib_efficiency": round(eff, 3),
           "gate": "PASS" if eff >= 0.95 else "RETRY"}
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
