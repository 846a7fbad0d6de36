"""Melt-decode width probe (r4 verdict #2).

The r4 scaling decomposition named the classic path's width limiter: a
zero-compute kernel emitting the full 96M-row narrow-IR melt through the
Arrow -> single-JVM decode never beats T_8 at local[32] (~36% cores
idle). This probe A/Bs the candidate levers on exactly that shape:

  pandas   - today's kernel: pd.DataFrame out of numpy arrays
  arrow    - applyInArrow: pa.Table out of numpy arrays (no pandas hop)
  packed   - 1 row per 128k pairs, single BinaryType blob column
             (collapses the JVM row count 128k-fold; measures the decode
             ceiling if consumers unpacked lazily)

each at a given --batch (spark.sql.execution.arrow.maxRecordsPerBatch)
and parallelism, CPU-pinned like scripts/scaling_bench.py. Usage:

  python scripts/melt_probe.py            # full sweep, prints JSON lines
  python scripts/melt_probe.py 32 arrow 131072   # one cell
"""

from __future__ import annotations

import json
import subprocess
import sys

REPO = "/root/repo"

WORKER = r'''
import json, sys, time
sys.path.insert(0, "@REPO@")
import numpy as np, pandas as pd, pyarrow as pa
from fuzzylink_spark.session import get_spark

cpus, mode, batch = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark("melt_probe", master=f"local[{cpus}]",
                  shuffle_partitions=cpus,
                  extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": batch})
NBLK, NA, NB = 32, 500, 6000          # 32 x 3M = 96M pairs
n = NA * NB
a = spark.range(NBLK * NA).selectExpr("id % 32 as block_id", "id as key_id")
b = spark.range(NBLK * NB).selectExpr("id % 32 as block_id", "id as key_id")
rng = np.random.default_rng(0)
out_np = {
    "block_id": np.zeros(n, dtype=np.int32),
    "a_id": np.arange(n, dtype=np.int64),
    "b_id": np.arange(n, dtype=np.int64),
    "sim": rng.random(n).astype(np.float32),
    "jw": rng.random(n).astype(np.float32),
    "exact": np.zeros(n, dtype=bool),
}
SCHEMA = ("block_id int, a_id long, b_id long, sim float, jw float, "
          "exact boolean")
cg = a.groupby("block_id").cogroup(b.groupby("block_id"))
if mode == "pandas":
    PDF = pd.DataFrame(out_np)
    res = cg.applyInPandas(lambda l, r: PDF, SCHEMA)
elif mode == "arrow":
    TBL = pa.table({k: pa.array(v) for k, v in out_np.items()})
    res = cg.applyInArrow(lambda l, r: TBL, SCHEMA)
elif mode == "packed":
    CHUNK = 131072
    packed = np.zeros(n, dtype=[("a", "<i8"), ("b", "<i8"),
                                ("s", "<f4"), ("j", "<f4")])
    packed["a"] = out_np["a_id"]; packed["b"] = out_np["b_id"]
    packed["s"] = out_np["sim"];  packed["j"] = out_np["jw"]
    raw = packed.tobytes()
    blobs = [raw[i * 24 * CHUNK:(i + 1) * 24 * CHUNK]
             for i in range((n + CHUNK - 1) // CHUNK)]
    TBL = pa.table({
        "block_id": pa.array(np.zeros(len(blobs), dtype=np.int32)),
        "n": pa.array(np.full(len(blobs),
                              min(CHUNK, n), dtype=np.int32)),
        "blob": pa.array(blobs, type=pa.binary()),
    })
    res = cg.applyInArrow(lambda l, r: TBL,
                          "block_id int, n int, blob binary")
else:
    raise SystemExit(f"unknown mode {mode}")
# tiny warm-up: worker startup + codegen outside the timer
a.limit(32).groupby("block_id").cogroup(b.limit(32).groupby("block_id")) \
    .applyInPandas(lambda l, r: pd.DataFrame(
        {k: v[:1] for k, v in out_np.items()}), SCHEMA).count()
t0 = time.time(); cnt = res.count(); wall = time.time() - t0
print(json.dumps({"cpus": cpus, "mode": mode, "batch": int(batch),
                  "rows": int(cnt), "wall_s": round(wall, 2),
                  "mrows_per_s": round(96.0 / wall, 1)}))
'''.replace("@REPO@", REPO)


def run(cpus: int, mode: str, batch: str) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", WORKER,
         str(cpus), mode, batch],
        capture_output=True, text=True, timeout=900,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


if __name__ == "__main__":
    if len(sys.argv) > 1:
        print(json.dumps(run(int(sys.argv[1]), sys.argv[2],
                             sys.argv[3] if len(sys.argv) > 3 else "131072")))
        sys.exit(0)
    # interleaved 8/32 per variant so both legs of a ratio share an epoch
    for mode, batch in [("pandas", "131072"), ("arrow", "131072"),
                        ("arrow", "524288"), ("packed", "131072")]:
        r8 = run(8, mode, batch)
        r32 = run(32, mode, batch)
        eff = r8["wall_s"] / (4.0 * r32["wall_s"])
        print(json.dumps({"mode": mode, "batch": int(batch),
                          "t8": r8["wall_s"], "t32": r32["wall_s"],
                          "t32_lt_t8": r32["wall_s"] < r8["wall_s"],
                          "eff_8_to_32": round(eff, 3)}))
