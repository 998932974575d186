#!/usr/bin/env python
"""Summarize quiet-window runner output (one JSON record per fired round)
into per-level minima + N->4N scaling efficiency.

Usage: python jobs/quiet_summary.py /tmp/quiet_exec_jc8.jsonl [max_steal_pct]

Levels are read from each record's result.level ("WxC"); records whose
own in-run steal exceeds max_steal_pct (default 2.0) are listed but
excluded from the minima — the quiet check only gates the START of a
round, so a burst can still land mid-run.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1]
    max_steal = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    by_level: dict = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            r = rec.get("result")
            if not r or rec.get("rc") not in (0, None):
                print(f"skip {rec.get('name')}: error={rec.get('error')}")
                continue
            lvl = r.get("level") or rec["name"]
            if r.get("job_concurrency") is not None:
                lvl = f"{lvl}_jc{r['job_concurrency']}"
            ok = r.get("steal_pct", 0.0) <= max_steal
            by_level.setdefault(lvl, []).append(
                {"best": r["best"], "walls": r["walls"],
                 "steal": r.get("steal_pct"), "clean": ok,
                 "turns": r.get("turns"),
                 "jc": r.get("job_concurrency")}
            )
    for lvl, rows in sorted(by_level.items()):
        clean = [x["best"] for x in rows if x["clean"]]
        print(f"{lvl}: rounds={len(rows)} clean={len(clean)}")
        for x in rows:
            tag = "" if x["clean"] else f"  [EXCLUDED steal {x['steal']}%]"
            print(f"  best={x['best']}s walls={x['walls']} "
                  f"steal={x['steal']}%{tag}")
        if clean:
            print(f"  min(clean)={min(clean)}s")
    levels = {lvl: min(x["best"] for x in rows if x["clean"])
              for lvl, rows in by_level.items()
              if any(x["clean"] for x in rows)}
    if len(levels) == 2:
        lo_lvl = max(levels, key=levels.get)  # slower = N
        hi_lvl = min(levels, key=levels.get)
        t_n, t_4n = levels[lo_lvl], levels[hi_lvl]
        turns = next(x["turns"] for rows in by_level.values() for x in rows)
        print(json.dumps({
            "N_level": lo_lvl, "4N_level": hi_lvl,
            "N_best_sec": t_n, "4N_best_sec": t_4n,
            "N_turns_per_sec": round(turns / t_n, 1),
            "4N_turns_per_sec": round(turns / t_4n, 1),
            "scaling_efficiency": round((t_n / t_4n) / 4, 3),
        }))


if __name__ == "__main__":
    main()
