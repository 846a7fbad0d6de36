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


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else OUT
    rows = [json.loads(l) for l in open(path) if l.strip()]
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
