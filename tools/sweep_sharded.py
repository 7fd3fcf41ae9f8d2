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

After the main pass, remaining failures AUTO-ESCALATE through the
recovery ladder the r9 campaign proved out by hand: (2) chunks of 6
solo (``--threads 1`` = the full 48 GB DuckDB budget per query; the
pool-OOM cascade under 4-way concurrency recovers here), then (3)
chunks of 1 with an 80 GB budget (the dedup_horizon-class oracles
whose list-fold churn needs 49-80 GB at sf10).  Only what survives
all three passes is reported failing.

Usage:
    SPARK_GRAFT_ORACLE_SF_DIR=.bench_sf10 python tools/sweep_sharded.py 9
    # options: --chunk 30 --threads 4 --fresh (ignore prior state)
    #          --no-escalate (single pass, the pre-r9 behavior)

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


def _run_pass(
    rnd: int,
    names: list[str],
    state: dict[str, list],
    state_path: str,
    chunk_size: int,
    threads: int,
    t0: float,
    tag: str,
    env_extra: dict[str, str] | None = None,
) -> None:
    """One sharded pass over every id whose state is not green."""
    todo = [n for n in names if state.get(n, [None])[0] not in _GREEN]
    if not todo:
        return
    print(
        f"[{tag}] {len(todo)} ids in chunks of {chunk_size}, "
        f"threads={threads}"
        + (f", env={env_extra}" if env_extra else ""),
        flush=True,
    )
    env = dict(os.environ, **(env_extra or {}))
    for ci in range(0, len(todo), chunk_size):
        chunk = todo[ci : ci + chunk_size]
        log = os.path.join(
            "/tmp", f"sweep_r{rnd}_{tag}_chunk{ci // chunk_size:02d}.log"
        )
        print(
            f"-- {tag} chunk {ci // chunk_size + 1}/"
            f"{-(-len(todo) // chunk_size)}: {len(chunk)} ids -> {log}",
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
                env=env,
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
            if n not in seen:
                # the chunk subprocess died before reaching this id —
                # tag NOTRUN (not ERROR) so crashed-chunk casualties
                # stay distinguishable from genuinely failing queries
                # in the summary; the escalation ladder retries both
                state[n] = ["NOTRUN", -1, "chunk crashed before this id ran"]
        with open(state_path, "w") as f:
            json.dump(state, f, indent=1)
        n_green = sum(1 for v in state.values() if v[0] in _GREEN)
        print(
            f"   chunk done; cumulative {n_green}/{len(names)} green "
            f"({time.perf_counter() - t0:.0f}s elapsed)",
            flush=True,
        )


def main() -> None:
    args = sys.argv[1:]
    chunk_size, threads, fresh, escalate = 30, 4, False, True
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
    if "--no-escalate" in args:
        escalate = False
        args.remove("--no-escalate")
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
    _run_pass(rnd, names, state, state_path, chunk_size, threads, t0, "main")
    if escalate:
        # recovery ladder (proved by the r9 campaign): solo budgets
        # clear the concurrency pool-OOMs; 80 GB clears the known
        # oracle-side list-fold outliers.  Fresh subprocesses each
        # time, so nothing a crashed chunk poisoned carries over.
        _run_pass(rnd, names, state, state_path, 6, 1, t0, "solo")
        if "SPARK_GRAFT_DUCK_MEM" not in os.environ:
            _run_pass(
                rnd, names, state, state_path, 1, 1, t0, "bigmem",
                env_extra={"SPARK_GRAFT_DUCK_MEM": "80GB"},
            )

    ok = sorted(n for n in names if state.get(n, [None])[0] in ("ok", "ok(rows-only)"))
    skipped = sorted(n for n in names if state.get(n, [None])[0] == "SKIP")
    notrun = sorted(
        n for n in names if state.get(n, [None])[0] == "NOTRUN"
    )
    failing = sorted(set(names) - set(ok) - set(skipped) - set(notrun))
    scale_path = os.path.join(REPO, f"SCALE_r{rnd}.json")
    prior_wall = 0.0
    if os.path.exists(scale_path):
        with open(scale_path) as f:
            prior_wall = json.load(f).get("sweep_wall_sec") or 0.0
    summary = {
        "sweep_ok": len(ok),
        "sweep_failing": len(failing),
        "sweep_skipped": len(skipped),
        # ids whose chunk subprocess crashed before they ran and that no
        # escalation pass reached (e.g. --no-escalate) — NOT failures
        "sweep_notrun": len(notrun),
        "sweep_exit": 0 if not failing and not notrun else 1,
        # accumulates across resumed runs of the same round's campaign
        "sweep_wall_sec": round(prior_wall + time.perf_counter() - t0, 1),
        "sweep_failures": [
            f"{n} {state[n][0]} {state[n][2]}" for n in failing
        ][:40],
        "sweep_notrun_ids": notrun[:40],
        "sweep_skips": [f"{n} {state[n][2][:80]}" for n in skipped],
    }
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
