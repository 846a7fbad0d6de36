"""Min-estimator scaling sampler for a host with short good windows.

The round-5 host flaps between good epochs (quick-probe wall 28-40 s)
and kernel-time storms (60-250 s for the identical job), with good
windows lasting only ~2-4 minutes — shorter than one full interleaved
iteration, so the bracketed-window protocol (windowed_scaling_r5.py)
may never land a certified pair. This sampler exploits the storm's
structure instead: the kernel tax is ONE-SIDED additive noise (storms
only ever ADD wall time; the earlier same-binary A/B showed the
identical job at 28-31 s pre-reboot and 63-249 s during storms), so

    eff_hat = min over samples of T_8 / (4 * min over samples of T_32)

converges to the true ratio as each leg's min lands inside a window —
the standard microbenchmarking min-estimator, the same rationale as
bench.py's min-of-2, applied per parallelism level. Legs are sampled
alternately with storm CAPS (a sample that blows past the cap is
killed and recorded as censored — it cannot be a min and waiting out a
25-minute storm leg buys nothing). Adjacent (T_32, T_8) samples that
are BOTH within 1.25x of their leg mins form quasi-epoch-local pairs,
recovering the interleaved protocol's ratio wherever the host allowed
it. Everything (including censored attempts) is appended to
BENCH/scaling_r5_samples.jsonl.
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
OUT = os.path.join(REPO, "BENCH", "scaling_r5_samples.jsonl")

HIST_REP = int(os.environ.get("R5_HIST_REP", "24"))
CAP32 = float(os.environ.get("R5_CAP32", "360"))
CAP8 = float(os.environ.get("R5_CAP8", "780"))
DEADLINE_TS = float(os.environ.get("R5_DEADLINE_TS", time.time() + 5400))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def log(row: dict) -> None:
    row["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def sample(cpus: int, cap: float) -> None:
    t0 = time.time()
    try:
        r = sb.run_once(cpus, SF_DIR, mode="hist", replicate=HIST_REP,
                        timeout_s=cap)
        log({"leg": cpus, "wall_s": r["wall_s"], "pairs": r["pairs"],
             "pairs_per_sec": r["pairs_per_sec"]})
    except subprocess.TimeoutExpired:
        log({"leg": cpus, "censored_at_s": round(time.time() - t0, 1)})
    except Exception as e:  # noqa: BLE001 - record and keep sampling
        log({"leg": cpus, "err": str(e)[:160]})


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    k = 0
    while time.time() < DEADLINE_TS:
        # tile-control ceiling every 3rd round for the silicon reference
        if k % 3 == 0:
            t8 = sb.cpu_control(8, fn=sb._burn_tile)
            t32 = sb.cpu_control(32, fn=sb._burn_tile)
            log({"leg": "tile", "tile8": t8, "tile32": t32,
                 "ceil": (t32 / t8) / 4.0})
        sample(32, CAP32)
        if time.time() >= DEADLINE_TS:
            break
        sample(8, CAP8)
        k += 1
    # summary over completed samples
    rows = [json.loads(l) for l in open(OUT)]
    w32 = sorted(r["wall_s"] for r in rows if r.get("leg") == 32 and "wall_s" in r)
    w8 = sorted(r["wall_s"] for r in rows if r.get("leg") == 8 and "wall_s" in r)
    if w32 and w8:
        log({"leg": "summary", "n32": len(w32), "n8": len(w8),
             "min32": w32[0], "min8": w8[0],
             "eff_min_estimator": round(w8[0] / w32[0] / 4.0, 3),
             "w32": [round(x, 1) for x in w32],
             "w8": [round(x, 1) for x in w8]})


if __name__ == "__main__":
    main()
