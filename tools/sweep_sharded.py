"""Sharded full-registry value sweep (the r9 sweep post-mortem's fix).

The r9 sf10 sweep proved that ONE long-lived process cannot survive a
293-query x100 sweep: after hours of Arrow frames + per-query DuckDB
connections + the py4j JVM, even a fresh ``duckdb.connect()`` failed
with bad_alloc at 2 KB while the host had 89 GB free — process-level
allocator/mmap exhaustion, not data size.  The same queries passed
immediately one-process-per-query.

This runner shards the registry into chunks of ~30 ids and runs each
chunk as a FRESH ``tools/check_oracle.py --fast-compare`` subprocess,
sequentially (the sweep only needs correctness, not an idle host).  A
green-list state file makes it restartable: re-running the same round
skips ids already OK/ROWS_ONLY/SKIP, so a killed sweep resumes at the
first unfinished chunk instead of starting over.

Usage:
    SPARK_GRAFT_ORACLE_SF_DIR=.bench_sf10 python tools/sweep_sharded.py 9
    # options: --chunk 30 --threads 4 --fresh (ignore prior state)

Results merge into SCALE_r{N}.json (sweep_* fields) next to the
pricing numbers tools/scale_drill.py recorded.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# `{name:28s} {tag:14s} rows=N  [msg]` — check_oracle._print_result
_LINE = re.compile(
    r"^(q_[a-z0-9_]+)\s+(ok\(rows-only\)|ok|SKIP|FAIL|ERROR)\s+rows=(-?\d+)(?:\s+(.*))?$"
)
_GREEN = {"ok", "ok(rows-only)", "SKIP"}


def main() -> None:
    args = sys.argv[1:]
    chunk_size, threads, fresh = 30, 4, False
    if "--chunk" in args:
        i = args.index("--chunk")
        chunk_size = int(args[i + 1])
        del args[i : i + 2]
    if "--threads" in args:
        i = args.index("--threads")
        threads = int(args[i + 1])
        del args[i : i + 2]
    if "--fresh" in args:
        fresh = True
        args.remove("--fresh")
    rnd = int(args[0])

    sys.path.insert(0, REPO)
    from binancedatapipelineinaws_spark.registry import all_specs

    names = sorted(all_specs())
    state_path = os.path.join(REPO, f".sweep_state_r{rnd}.json")
    state: dict[str, list] = {}
    if not fresh and os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)

    todo = [n for n in names if state.get(n, [None])[0] not in _GREEN]
    print(
        f"sweep r{rnd}: {len(names)} ids, {len(names) - len(todo)} already "
        f"green in {state_path}, {len(todo)} to run in chunks of {chunk_size}",
        flush=True,
    )

    t0 = time.perf_counter()
    for ci in range(0, len(todo), chunk_size):
        chunk = todo[ci : ci + chunk_size]
        log = os.path.join(
            "/tmp", f"sweep_r{rnd}_chunk{ci // chunk_size:02d}.log"
        )
        print(
            f"-- chunk {ci // chunk_size + 1}/{-(-len(todo) // chunk_size)}: "
            f"{len(chunk)} ids -> {log}",
            flush=True,
        )
        with open(log, "w") as out:
            subprocess.run(
                [
                    sys.executable,
                    os.path.join(REPO, "tools", "check_oracle.py"),
                    "--fast-compare",
                    "--threads",
                    str(threads),
                    *chunk,
                ],
                stdout=out,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=REPO,
                check=False,  # a failing chunk still parses below
            )
        seen = set()
        for ln in open(log):
            m = _LINE.match(ln.rstrip())
            if m and m.group(1) in set(chunk):
                state[m.group(1)] = [
                    m.group(2),
                    int(m.group(3)),
                    (m.group(4) or "")[:200],
                ]
                seen.add(m.group(1))
        for n in chunk:
            if n not in seen:  # crashed before printing: mark, don't lose
                state[n] = ["ERROR", -1, "no result line (chunk crashed?)"]
        with open(state_path, "w") as f:
            json.dump(state, f, indent=1)
        n_green = sum(1 for v in state.values() if v[0] in _GREEN)
        print(
            f"   chunk done; cumulative {n_green}/{len(names)} green "
            f"({time.perf_counter() - t0:.0f}s elapsed)",
            flush=True,
        )

    ok = sorted(n for n in names if state.get(n, [None])[0] in ("ok", "ok(rows-only)"))
    skipped = sorted(n for n in names if state.get(n, [None])[0] == "SKIP")
    failing = sorted(set(names) - set(ok) - set(skipped))
    summary = {
        "sweep_ok": len(ok),
        "sweep_failing": len(failing),
        "sweep_skipped": len(skipped),
        "sweep_exit": 0 if not failing else 1,
        "sweep_wall_sec": round(time.perf_counter() - t0, 1),
        "sweep_failures": [
            f"{n} {state[n][0]} {state[n][2]}" for n in failing
        ][:40],
        "sweep_skips": [f"{n} {state[n][2][:80]}" for n in skipped],
    }
    scale_path = os.path.join(REPO, f"SCALE_r{rnd}.json")
    merged = {}
    if os.path.exists(scale_path):
        with open(scale_path) as f:
            merged = json.load(f)
    merged.update(summary)
    merged.setdefault("round", rnd)
    with open(scale_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(summary)[:2000], flush=True)
    sys.exit(summary["sweep_exit"])


if __name__ == "__main__":
    main()
