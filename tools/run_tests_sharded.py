"""Run the pytest suite as N parallel shards (VERDICT r5 #8).

The full suite doubled with the r5 surface (14m19s single-process);
pytest-xdist is not in the container, so this spawns N pytest
subprocesses, each with SPARK_GRAFT_TEST_SHARD=i/N (see
tests/conftest.py — parity-gate items shard by query name, other
files shard whole so session fixtures stay in one process). Each
shard gets its own SparkSession sized to cpus/N.

    python tools/run_tests_sharded.py [N=4] [pytest args...]

Exit 0 iff every shard passes. Coverage is identical to a plain
`pytest tests/` run: the shards partition the item set.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def main() -> int:
    argv = sys.argv[1:]
    n = int(argv[0]) if argv and argv[0].isdigit() else 4
    extra = argv[1:] if argv and argv[0].isdigit() else argv
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cpus = max(2, int(os.environ.get("SPARK_GRAFT_TOTAL_CPUS", "32")) // n)
    procs = []
    t0 = time.time()
    for i in range(n):
        env = dict(os.environ)
        env["SPARK_GRAFT_TEST_SHARD"] = f"{i}/{n}"
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        logp = os.path.join(repo, f".pytest_shard_{i}.log")
        procs.append(
            (
                i,
                logp,
                subprocess.Popen(
                    [sys.executable, "-m", "pytest", "tests/", "-q", *extra],
                    cwd=repo,
                    env=env,
                    stdout=open(logp, "w"),
                    stderr=subprocess.STDOUT,
                ),
            )
        )
    rc = 0
    total_ran = 0
    for i, logp, p in procs:
        code = p.wait()
        tail = open(logp).read().strip().splitlines()
        last = tail[-1] if tail else "(no output)"
        # Sum the "N passed/skipped/failed" counts so an all-empty run
        # (e.g. a bad shard spec making every shard exit 5) cannot
        # report success with zero coverage (r6 ADVICE).
        import re

        total_ran += sum(
            int(m.group(1))
            for m in re.finditer(r"(\d+) (?:passed|failed|skipped|error)", last)
        )
        print(f"shard {i}/{n}: exit={code} :: {last}", flush=True)
        if code not in (0, 5):  # 5 = no tests collected (tiny shard)
            rc = 1
    if total_ran == 0:
        print("FAIL: zero tests ran across all shards", flush=True)
        rc = 1
    print(f"total wall: {time.time() - t0:.0f}s")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
