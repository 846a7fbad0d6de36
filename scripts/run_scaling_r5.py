"""Round-5 headline scaling measurement.

Same interleaved A/B protocol as scaling_bench.main() (every ratio is
epoch-local: tile control @8 -> @32 -> classic @8 -> @32 -> hist @8 ->
@32, all back-to-back, fresh pinned JVMs), but at the round-5 job sizes
the verdict prescribed:

- classic at replicate 8 (~96M pairs) — target eff >= 0.55 with the
  round-5 Arrow-native melt kernel;
- hist at replicate 24 (~864M pairs) — target median eff >= 0.8 over
  >= 5 interleaved samples (the 384M-pair r4 run measured median 0.784
  rising monotonically with job size).

Appends one JSON line per iteration to BENCH/scaling_r5.jsonl so a
partial run is still evidence if the session is interrupted.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scaling_bench as sb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "scaling_r5.jsonl")

CLASSIC_REP = int(os.environ.get("R5_CLASSIC_REP", "8"))
HIST_REP = int(os.environ.get("R5_HIST_REP", "24"))
ITERS = int(os.environ.get("R5_ITERS", "5"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for i in range(ITERS):
        row = {"iter": i, "classic_rep": CLASSIC_REP, "hist_rep": HIST_REP}
        t0 = time.time()
        row["tile8"] = sb.cpu_control(8, fn=sb._burn_tile)
        row["tile32"] = sb.cpu_control(32, fn=sb._burn_tile)
        row["ceil"] = (row["tile32"] / row["tile8"]) / 4.0
        row["clo"] = sb.run_once(8, SF_DIR, replicate=CLASSIC_REP)
        row["chi"] = sb.run_once(32, SF_DIR, replicate=CLASSIC_REP)
        row["ceff"] = (row["clo"]["wall_s"] / row["chi"]["wall_s"]) / 4.0
        row["hlo"] = sb.run_once(8, SF_DIR, mode="hist", replicate=HIST_REP)
        row["hhi"] = sb.run_once(32, SF_DIR, mode="hist", replicate=HIST_REP)
        row["heff"] = (row["hlo"]["wall_s"] / row["hhi"]["wall_s"]) / 4.0
        row["iter_wall_s"] = round(time.time() - t0, 1)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps({k: row[k] for k in
                          ("iter", "ceil", "ceff", "heff", "iter_wall_s")}),
              flush=True)
    rows = [json.loads(l) for l in open(OUT)
            if json.loads(l)["hist_rep"] == HIST_REP]
    heffs = sorted(r["heff"] for r in rows)
    ceffs = sorted(r["ceff"] for r in rows)
    print(json.dumps({
        "n": len(rows),
        "hist_effs": [round(x, 3) for x in heffs],
        "hist_median": round(sb._median(heffs), 3),
        "classic_effs": [round(x, 3) for x in ceffs],
        "classic_median": round(sb._median(ceffs), 3),
    }))


if __name__ == "__main__":
    main()
