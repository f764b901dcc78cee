#!/usr/bin/env python
"""Fire the layout scaling ladder ONLY inside a certified host window.

The ladder's own probe gate defers, but on retry exhaustion it
measures anyway - in a degraded co-tenant window that wastes the run
and buries the good figures. This watcher inverts the control: probe
cheaply forever, and launch one single-pair ladder run only after the
capacity probe clears the floor twice in a row (one clear reading can
be a blip between co-tenant bursts). A lockfile marks a measurement
in flight so interactive dev work can check-and-avoid colliding.

Usage: python tools/ladder_watch.py [floor] [max_hours]
       (defaults 0.88, 4.0; env LADDER_* forwarded to the ladder)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling_layout import cpu_capacity_ratio  # noqa: E402

LOCK = "/tmp/ladder_watch.lock"


def main() -> int:
    floor = float(sys.argv[1]) if len(sys.argv) > 1 else 0.88
    max_hours = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    deadline = time.time() + max_hours * 3600
    streak = 0
    while time.time() < deadline:
        cap = cpu_capacity_ratio()
        streak = streak + 1 if cap >= floor else 0
        print(f"probe {cap:.2f} (floor {floor:.2f}, streak {streak})",
              flush=True)
        if streak >= 2:
            env = dict(os.environ,
                       LADDER_BOUNDARY=os.environ.get(
                           "LADDER_BOUNDARY", "sink"),
                       LADDER_PROBE_FLOOR=str(floor),
                       LADDER_PROBE_RETRIES="2",
                       LADDER_PROBE_WAIT_SECS="45")
            with open(LOCK, "w") as fh:
                fh.write(str(time.time()))
            try:
                print("window certified - launching 1-pair ladder",
                      flush=True)
                subprocess.run(
                    [sys.executable, "bench_scaling_layout.py",
                     "160000", "1"], env=env, check=False)
            finally:
                os.unlink(LOCK)
            streak = 0
            # keep watching: more good pairs strengthen the evidence
        time.sleep(75)
    print("watch window exhausted", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
