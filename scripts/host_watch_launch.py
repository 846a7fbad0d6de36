"""Probe the host every ~15 min; when it leaves the kernel-time
pathology (see BENCH/BASELINE.md round-5 environment note), launch the
round-5 headline scaling run automatically.

Trigger: TWO consecutive quick probes (hist rep8 @32, the job whose
known-good epoch wall is 28-31 s) at or under WALL_TRIGGER seconds —
one lucky probe is not a window. On trigger, exec run_scaling_r5.py
(classic rep8 + hist rep24, 5 interleaved samples, per-iteration JSONL
so a closing window still leaves evidence).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scaling_bench as sb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "BENCH", "host_probe_r5.jsonl")
WALL_TRIGGER = float(os.environ.get("R5_WALL_TRIGGER", "48"))
PERIOD_S = int(os.environ.get("R5_PROBE_PERIOD", "900"))
MAX_HOURS = float(os.environ.get("R5_WATCH_HOURS", "4"))


def main() -> None:
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    t_start = time.time()
    streak = 0
    while time.time() - t_start < MAX_HOURS * 3600:
        try:
            r = sb.run_once(32, "/root/testdata/sf0.1", mode="hist",
                            replicate=8)
            wall = r["wall_s"]
        except Exception as e:
            wall = -1.0
            r = {"err": str(e)[:120]}
        row = {"ts": time.time(), "probe_wall_s": wall, "streak": streak}
        with open(LOG, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
        streak = streak + 1 if 0 < wall <= WALL_TRIGGER else 0
        if streak >= 2:
            print("window open — launching headline run", flush=True)
            env = dict(os.environ)
            env.update({"R5_CLASSIC_REP": "8", "R5_HIST_REP": "24",
                        "R5_ITERS": "5"})
            subprocess.run([sys.executable,
                            os.path.join(REPO, "scripts",
                                         "run_scaling_r5.py")], env=env)
            return
        time.sleep(PERIOD_S)
    print("watch window expired without a usable epoch", flush=True)


if __name__ == "__main__":
    main()
