#!/usr/bin/env python
"""Opportunistic measurement scheduler for a shared host.

This sandbox shows hypervisor-steal bursts of 10-30% lasting tens of
minutes, separated by near-zero-steal windows.  Timing evidence taken
inside a burst is garbage; minima-over-rounds only works if at least
one round lands in a quiet window.  This runner inverts the protocol:
it samples steal over SAMPLE_SEC and only fires the next measurement
round when the window is quiet (< THRESHOLD_PCT), appending every
result (with its own per-run steal) to OUT so minima can be taken
across an arbitrary number of attempts under the identical protocol.

Usage:
  python jobs/quiet_window_runner.py CMDFILE OUT
where CMDFILE is a JSON list of {"name": ..., "env": {...}, "argv": [...]}
entries, cycled in order.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

THRESHOLD_PCT = float(os.environ.get("QUIET_THRESHOLD_PCT", "2.0"))
# other work on THIS vm (test runs, dataset generation) also pollutes a
# measurement — and asymmetrically across the N/4N legs, which would bias
# the ratio, not just inflate walls.  Require the host to be near-idle
# too, not just steal-free.
BUSY_THRESHOLD_PCT = float(os.environ.get("QUIET_BUSY_PCT", "8.0"))
SAMPLE_SEC = int(os.environ.get("QUIET_SAMPLE_SEC", "45"))
IDLE_SLEEP = int(os.environ.get("QUIET_IDLE_SLEEP", "90"))


def steal_pct(seconds: int) -> tuple:
    def ticks():
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        busy = v[0] + v[1] + v[2] + v[5] + v[6]
        idle = v[3] + v[4]
        return busy, idle, v[7] if len(v) > 7 else 0

    b0, i0, s0 = ticks()
    time.sleep(seconds)
    b1, i1, s1 = ticks()
    total = (b1 - b0) + (i1 - i0) + (s1 - s0)
    return (
        100.0 * (s1 - s0) / max(total, 1),
        100.0 * (b1 - b0) / max(total, 1),
    )


def main() -> None:
    cmds = json.load(open(sys.argv[1]))
    out = sys.argv[2]
    i = 0
    while True:
        pct, busy = steal_pct(SAMPLE_SEC)
        if pct >= THRESHOLD_PCT or busy >= BUSY_THRESHOLD_PCT:
            print(f"steal {pct:.1f}% busy {busy:.1f}% — waiting",
                  file=sys.stderr, flush=True)
            time.sleep(IDLE_SLEEP)
            continue
        spec = cmds[i % len(cmds)]
        i += 1
        env = {**os.environ, **spec.get("env", {})}
        print(f"steal {pct:.1f}% busy {busy:.1f}% — firing {spec['name']}",
              file=sys.stderr, flush=True)
        t0 = time.time()
        try:
            r = subprocess.run(spec["argv"], env=env, capture_output=True,
                               text=True, timeout=3600)
            lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
            rec = {"name": spec["name"], "ts": time.time(),
                   "wall": round(time.time() - t0, 1), "rc": r.returncode,
                   "result": json.loads(lines[-1]) if lines else None,
                   "stderr_tail": r.stderr[-2000:]}
        except Exception as exc:  # noqa: BLE001
            rec = {"name": spec["name"], "ts": time.time(),
                   "wall": round(time.time() - t0, 1), "error": str(exc)}
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"done {spec['name']} wall={rec.get('wall')}s",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
