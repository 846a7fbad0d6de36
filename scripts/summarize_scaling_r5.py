"""Summarize BENCH/scaling_r5.jsonl into the BENCH/BASELINE.md table.

Prints a markdown table (one row per headline iteration: bracket probe
walls, tile-control ceiling, classic and hist walls at 8/32 cores,
epoch-local efficiencies, good flag) plus medians over the good subset
and over all iterations. Pure stdlib — safe to run while the windowed
driver is live.
"""

from __future__ import annotations

import json
import os
import sys

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH", "scaling_r5.jsonl")


def median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])


def summarize_samples(rows) -> None:
    """Min-estimator view of BENCH/scaling_r5_samples.jsonl (rows carry a
    'leg' key): per-leg minima over capped samples, censoring counts, and
    eff_hat = min T_8 / (4 * min T_32)."""
    legs = {8: [], 32: []}
    cens = {8: 0, 32: 0}
    tiles = []
    for r in rows:
        leg = r.get("leg")
        if leg == "tile":
            tiles.append(r["ceil"])
        elif leg in legs:
            if "wall_s" in r:
                legs[leg].append(r["wall_s"])
            elif "censored_at_s" in r:
                cens[leg] += 1
    for leg in (32, 8):
        ws = sorted(legs[leg])
        print(f"T_{leg}: n={len(ws)} walls={ws} censored={cens[leg]} "
              f"min={ws[0] if ws else None}")
    if tiles:
        print(f"tile ceilings: {[round(t, 3) for t in tiles]}")
    if legs[8] and legs[32]:
        eff = min(legs[8]) / (4.0 * min(legs[32]))
        print(f"eff_hat = {min(legs[8]):.1f} / (4 x {min(legs[32]):.1f}) "
              f"= {eff:.3f}  (= true_eff x i8/i32 where i are the "
              f"minima's residual storm-inflation factors — unusable in "
              f"either direction until both converge; see BENCH/BASELINE.md)")


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else OUT
    rows = [json.loads(l) for l in open(path) if l.strip()]
    if rows and "leg" in rows[0]:
        summarize_samples(rows)
        return
    rows = [r for r in rows if "heff" in r]
    if not rows:
        print("no complete iterations yet")
        return
    print("| iter | pre-probes (s) | post (s) | tile ceil | classic T8/T32 (s)"
          " | ceff | hist T8/T32 (s) | heff | Mpairs/s @32 | good |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        pre = "/".join(f"{w:.0f}" for w in r.get("pre_probe_walls", []))
        hps = r["hhi"]["pairs_per_sec"] / 1e6
        print(f"| {r['iter']} | {pre} | {r.get('post_probe_wall', -1):.0f} "
              f"| {r['ceil']:.3f} "
              f"| {r['clo']['wall_s']:.1f}/{r['chi']['wall_s']:.1f} "
              f"| {r['ceff']:.3f} "
              f"| {r['hlo']['wall_s']:.1f}/{r['hhi']['wall_s']:.1f} "
              f"| {r['heff']:.3f} | {hps:.2f} | {r.get('good')} |")
    for label, sel in (
            ("all", rows),
            # hist legs carry their own mid-iteration probe certificate,
            # so the headline median uses good_hist (fall back to the
            # whole-iteration flag for rows predating the mid-probe)
            ("good-hist", [r for r in rows
                           if r.get("good_hist", r.get("good"))]),
            ("good", [r for r in rows if r.get("good")])):
        if not sel:
            continue
        print(f"\n{label} (n={len(sel)}): "
              f"hist effs {sorted(round(r['heff'], 3) for r in sel)} "
              f"median {median([r['heff'] for r in sel]):.3f}; "
              f"classic effs {sorted(round(r['ceff'], 3) for r in sel)} "
              f"median {median([r['ceff'] for r in sel]):.3f}")


if __name__ == "__main__":
    main()
