"""Box-state monitor (r08 interference triage): samples /proc/stat
steal/user/idle deltas and loadavg every 10s, one JSON line each, so
bench passes can be cross-referenced against host-level interference
windows (post-reboot Aug 17 the box shows intermittent multi-minute
slowdowns that hit 8-way concurrent passes 2-7x)."""

from __future__ import annotations

import json
import sys
import time


def cpu() -> list[int]:
    with open("/proc/stat") as fh:
        return list(map(int, fh.readline().split()[1:]))


def main() -> None:
    prev = cpu()
    while True:
        time.sleep(10)
        cur = cpu()
        d = [b - a for a, b in zip(prev, cur)]
        prev = cur
        total = sum(d) or 1
        with open("/proc/loadavg") as fh:
            load1 = float(fh.read().split()[0])
        print(
            json.dumps(
                {
                    "t": round(time.time(), 1),
                    "user_pct": round(100 * (d[0] + d[1]) / total, 1),
                    "sys_pct": round(100 * d[2] / total, 1),
                    "idle_pct": round(100 * d[3] / total, 1),
                    "iowait_pct": round(100 * d[4] / total, 1),
                    "steal_pct": round(100 * d[7] / total, 1),
                    "load1": load1,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
