"""Run every gate in sequence and summarize. For round N+1 sessions:

    python tools/run_gates.py            # all gates (~6-8 min)
    python tools/run_gates.py --fast     # pytest + parity only

Gates: pytest suite, DuckDB parity (driver replica), cross-JVM determinism,
headline bench throughput.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str], env: dict | None = None) -> tuple[bool, str]:
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       env={**os.environ, **(env or {})})
    dt = time.time() - t0
    tail = (r.stdout + r.stderr).strip().splitlines()[-1] if (r.stdout or r.stderr) else ""
    status = "PASS" if r.returncode == 0 else "FAIL"
    print(f"[{status}] {name} ({dt:.0f}s): {tail[:140]}")
    return r.returncode == 0, tail


def main() -> int:
    fast = "--fast" in sys.argv
    ok = True

    ok &= run("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"])[0]
    ok &= run("parity", [sys.executable, "tools/check_parity.py"])[0]
    if not fast:
        ok &= run("determinism", [sys.executable, "tools/determinism_check.py", "2", "8"])[0]
        good, tail = run(
            "bench-headline",
            [sys.executable, "bench.py"],
            env={"SPARK_GRAFT_BENCH_ONLY": "transcripts_extract"},
        )
        ok &= good
        if good and tail.startswith("{"):
            d = json.loads(tail)
            print(f"    turns/sec: {d.get('turns_per_sec')}")
    print("ALL GATES PASS" if ok else "GATE FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
