#!/usr/bin/env python3
"""Process-sharded pytest runner — the offline stand-in for pytest-xdist.

The suite is dominated by Spark jobs that a single 8-core test session
serializes; the box has 32 cores. This runner shards ``tests/test_*.py``
across N pytest subprocesses (default 3), each with

- its own scratch WORKING DIRECTORY (so ``saveAsTable``'s cwd-relative
  ``spark-warehouse`` and any other cwd-relative state never collide),
- its own local[8] Spark JVM (ports are all auto-assigned: Spark picks
  free driver/blockManager ports, the loopback HTTP gateway binds port 0),
- the same ``-x -q`` contract as the driver's sequential invocation.

Shard assignment is greedy longest-processing-time bin-packing over
measured per-file wall costs persisted in ``scripts/test_costs.json`` —
refreshed from each run's ``--durations=0`` output, so the balance
self-corrects as the suite evolves (files without a recorded cost get a
neutral default and are measured on their first run).

Exit code: max over shard exit codes. Per-shard output is captured to
``/tmp/shard_tests/shard<i>.log`` (path printed per shard) and the tail
of any failing shard is echoed. Every test remains individually present —
nothing is skipped, merged, or de-asserted; this changes WHERE tests run,
never WHAT runs.

Usage: python scripts/shard_tests.py [n_shards] [extra pytest args...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COSTS_PATH = os.path.join(REPO, "scripts", "test_costs.json")
LOG_DIR = "/tmp/shard_tests"
DEFAULT_COST = 20.0  # unmeasured files: assume mid-weight until measured


def load_costs() -> dict[str, float]:
    try:
        with open(COSTS_PATH) as f:
            return {k: float(v) for k, v in json.load(f).items()}
    except (OSError, ValueError):
        return {}


def pack(files: list[str], costs: dict[str, float], n: int) -> list[list[str]]:
    """Greedy LPT bin-packing: heaviest file onto the lightest shard."""
    shards: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for f in sorted(files, key=lambda f: -costs.get(os.path.basename(f), DEFAULT_COST)):
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += costs.get(os.path.basename(f), DEFAULT_COST)
    return [s for s in shards if s]


_DUR_RE = re.compile(
    # pytest prints the nodeid relative to its computed rootdir — which
    # varies with the invocation cwd (shards run from a scratch dir), so
    # match the basename: test files are unique by name
    r"^\s*([0-9.]+)s\s+(?:call|setup|teardown)\s+\S*?(test_[^:/\s]+\.py)::", re.M
)


def harvest_costs(log_text: str) -> dict[str, float]:
    """Sum pytest --durations=0 (call+setup+teardown) per test FILE."""
    out: dict[str, float] = {}
    for secs, path in _DUR_RE.findall(log_text):
        base = os.path.basename(path)
        out[base] = out.get(base, 0.0) + float(secs)
    return out


def main() -> int:
    args = sys.argv[1:]
    n = 4  # measured best wall at 4 (488 s vs 699 s at 3, r06)
    if args and args[0].isdigit():
        n = int(args[0])
        args = args[1:]
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    costs = load_costs()
    shards = pack(files, costs, n)
    os.makedirs(LOG_DIR, exist_ok=True)

    procs: list[tuple[int, subprocess.Popen, str, str]] = []
    t0 = time.time()
    for i, shard in enumerate(shards):
        scratch = os.path.join(LOG_DIR, f"cwd{i}")
        shutil.rmtree(scratch, ignore_errors=True)
        os.makedirs(scratch, exist_ok=True)
        log_path = os.path.join(LOG_DIR, f"shard{i}.log")
        env = dict(os.environ, PYTHONPATH=REPO)
        cmd = [
            sys.executable, "-m", "pytest", *shard,
            "-x", "-q", "--durations=0", "-p", "no:cacheprovider", *args,
        ]
        log = open(log_path, "w")
        procs.append(
            (
                i,
                subprocess.Popen(cmd, cwd=scratch, env=env, stdout=log, stderr=subprocess.STDOUT),
                log_path,
                ", ".join(os.path.basename(f) for f in shard),
            )
        )
        print(f"shard {i}: {len(shard)} files -> {log_path}")

    rc = 0
    measured: dict[str, float] = {}
    for i, p, log_path, names in procs:
        code = p.wait()
        with open(log_path) as f:
            text = f.read()
        measured.update(harvest_costs(text))
        tail = [ln for ln in text.strip().splitlines() if ln.strip()][-1:]
        print(f"shard {i} exit={code} ({tail[0] if tail else 'no output'})")
        if code != 0:
            print(f"--- shard {i} failing tail ({log_path}) ---")
            print("\n".join(text.strip().splitlines()[-30:]))
            rc = max(rc, code)

    wall = time.time() - t0
    print(f"TOTAL wall: {wall:.1f}s across {len(shards)} shards (exit={rc})")
    if measured:
        merged = {**costs, **measured}
        with open(COSTS_PATH, "w") as f:
            json.dump(dict(sorted(merged.items())), f, indent=1, sort_keys=True)
        print(f"refreshed {COSTS_PATH} ({len(measured)} files measured)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
