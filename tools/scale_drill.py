"""One-command per-round scale drill (VERDICT r8 item 5): the x100
pricing run (tools/bench_sf1.py against .bench_sf10) followed by the
full-registry VALUE sweep at the same corpus (tools/check_oracle.py
--threads 4 --fast-compare), recorded as one JSON artifact.

The two phases run SEQUENTIALLY — pricing needs the host alone, the
sweep only needs correctness — and the summary lands in
SCALE_r{N}.json at the repo root for SCALING.md's per-round section.

Usage:
    python tools/scale_drill.py 9              # round number for the artifact
    SPARK_GRAFT_SCALE_DIR=.bench_sf1 python tools/scale_drill.py 9   # other corpus

Expects the corpus to exist (SPARK_GRAFT_SF1_REPLICAS=100
python tools/make_sf1.py .bench_sf10 builds the default one with the
fixed replica seed, so ratios are comparable round over round).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", os.path.join(REPO, ".bench_sf10")
)


def main() -> None:
    rnd = int(sys.argv[1])
    if not os.path.isdir(CORPUS):
        sys.exit(f"scale corpus {CORPUS} missing — run tools/make_sf1.py first")
    env = dict(os.environ, SPARK_GRAFT_SCALE_DIR=CORPUS)

    # phase outputs stream to files, not pipes: a killed/hung phase
    # must not take the other phase's finished results with it (the r9
    # sweep deadlock post-mortem)
    pricing_log = f"/tmp/scale_drill_r{rnd}_pricing.log"
    sweep_log = f"/tmp/scale_drill_r{rnd}_sweep.log"

    t0 = time.perf_counter()
    with open(pricing_log, "w") as out:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_sf1.py")],
            env=env,
            stdout=out,
            stderr=subprocess.STDOUT,
            text=True,
            check=True,
        )
    pricing_lines = [
        ln for ln in open(pricing_log) if ln.startswith("{")
    ]
    pricing = json.loads(pricing_lines[-1])
    pricing_sec = round(time.perf_counter() - t0, 1)

    # record pricing FIRST so a sweep failure can't take it down with it
    path = os.path.join(REPO, f"SCALE_r{rnd}.json")
    artifact = {
        "round": rnd,
        "corpus": os.path.basename(CORPUS),
        "pricing": pricing["queries"],
        "pricing_wall_sec": pricing_sec,
    }
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)

    # the sweep runs through tools/sweep_sharded.py: each ~30-id chunk
    # is a FRESH subprocess (the r9 post-mortem: a single long-lived
    # process self-poisons — allocator/mmap exhaustion after hours —
    # and one wedged query used to take the whole sweep's results with
    # it).  sweep_sharded is restartable via .sweep_state_r{N}.json and
    # merges its summary into SCALE_r{N}.json itself.
    sweep_env = dict(os.environ, SPARK_GRAFT_ORACLE_SF_DIR=CORPUS)
    with open(sweep_log, "w") as out:
        sweep = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "sweep_sharded.py"),
                str(rnd),
            ],
            env=sweep_env,
            stdout=out,
            stderr=subprocess.STDOUT,
            text=True,
        )
    with open(path) as f:
        artifact = json.load(f)
    print(json.dumps({k: v for k, v in artifact.items() if k != "pricing"}))
    print(f"wrote {path}")
    if sweep.returncode != 0 or artifact.get("sweep_failing"):
        sys.exit(1)


if __name__ == "__main__":
    main()
