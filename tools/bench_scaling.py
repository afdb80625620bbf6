"""Scaling-efficiency evidence for the north rule: run bench.py at two
parallelism levels (local[8] ≙ N executors, local[32] ≙ 4N) on the SAME
input and report throughput at both plus efficiency
(events/s @4N) / (4 × events/s @N). Writes BENCH_SCALING.json and
refreshes the measured-numbers section of BASELINE.md.

Usage: python tools/bench_scaling.py [events]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, events: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_CDC_EVENTS=str(events),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench.py produced no JSON (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    lo = run_bench(8, events)
    hi = run_bench(32, events)
    eff = round(hi["value"] / (4 * lo["value"]), 3)
    result = {
        "events": events,
        "p8_events_per_sec": lo["value"],
        "p32_events_per_sec": hi["value"],
        "scaling_efficiency_8_to_32": eff,
        "p8": lo["cdc_replay"],
        "p32": hi["cdc_replay"],
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))

    md = open(os.path.join(REPO, "BASELINE.md")).read()
    section = (
        "\n## Measured (this repo)\n\n"
        f"| CDC replay throughput @ local[8] (≙ N executors) | {lo['value']:.0f} events/s | "
        f"{events} synthetic change events + 10k-row snapshot | bench.py |\n"
        f"| CDC replay throughput @ local[32] (≙ 4N executors) | {hi['value']:.0f} events/s | same input | bench.py |\n"
        f"| Scaling efficiency N→4N | {eff} (target ≥ 0.8) | (events/s @32) / (4 × events/s @8) | tools/bench_scaling.py |\n"
    )
    marker = "\n## Measured (this repo)\n"
    if marker in md:
        md = md[: md.index(marker)]
    with open(os.path.join(REPO, "BASELINE.md"), "w") as f:
        f.write(md + section)


if __name__ == "__main__":
    main()
