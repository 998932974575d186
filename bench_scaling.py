#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule: run the IDENTICAL
bench job at two parallelism levels (local[8] = N cores, local[32] = 4N
cores) on the same input, report throughput at both and efficiency
(T8/T32)/4.  Each run is a fresh JVM (subprocess) so nothing is shared.

Writes SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))


def run_bench(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # scaling evidence needs a compute-dominated workload (~12.5M turns):
    # the suite runs ~9 Spark jobs with ~4s of fixed driver/planning cost,
    # so per-core work must dwarf that for 4x cores to show. The parquet
    # input is written once and byte-identical for both runs.
    env.setdefault("SPARK_GRAFT_CONVS", "1000000")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    low, high = 8, 32
    r_low = run_bench(low)
    r_high = run_bench(high)
    t_low = r_low["queries"]["suite_transcripts_warm"]
    t_high = r_high["queries"]["suite_transcripts_warm"]
    tput_low = r_low["extra"]["turns_per_sec"]
    tput_high = r_high["extra"]["turns_per_sec"]
    efficiency = round((t_low / t_high) / (high / low), 3)
    total_eff = round(
        (r_low["value"] / r_high["value"]) / (high / low), 3
    )
    result = {
        "workload": "suite_transcripts (full expectation suite)",
        "turns": r_low["extra"]["turns_validated"],
        f"local[{low}]_sec": t_low,
        f"local[{high}]_sec": t_high,
        f"local[{low}]_turns_per_sec": tput_low,
        f"local[{high}]_turns_per_sec": tput_high,
        "scaling_efficiency": efficiency,
        "total_bench_efficiency": total_eff,
        "low": r_low,
        "high": r_high,
    }
    with open(os.path.join(REPO, "SCALING.md"), "w") as f:
        f.write(
            "# Scaling evidence (north rule: efficiency >= 0.8 from N to 4N)\n\n"
            "Protocol: identical job, identical deterministic input, fresh JVM "
            f"per run; N = local[{low}] cores, 4N = local[{high}] cores.\n\n"
            f"| metric | local[{low}] | local[{high}] |\n|---|---|---|\n"
            f"| suite_transcripts wall (s) | {t_low} | {t_high} |\n"
            f"| turns validated/sec | {tput_low} | {tput_high} |\n"
            f"| total bench wall (s) | {r_low['value']} | {r_high['value']} |\n\n"
            f"**Scaling efficiency (suite_transcripts): {efficiency}** "
            f"(= ({t_low}/{t_high})/{high // low})\n\n"
            f"Total-bench efficiency: {total_eff}\n\n"
            "Raw per-query timings:\n\n```json\n"
            + json.dumps(
                {f"local[{low}]": r_low["queries"], f"local[{high}]": r_high["queries"]},
                indent=2,
            )
            + "\n```\n"
        )
    print(json.dumps({k: v for k, v in result.items() if k not in ("low", "high")}))


if __name__ == "__main__":
    main()
