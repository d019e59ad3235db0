#!/usr/bin/env python
"""Round-over-round BENCH_FULL comparison: print the top-N movers
between two full-registry sweeps as a markdown table (pasted into
BASELINE.md each round) — SELF-ADJUDICATING for host noise.

Two sweeps of an identical repo on this host differ by a roughly
uniform multiplicative factor (hypervisor co-tenancy; measured
1.2-1.35x bands in rounds 4-5). Since any one round changes only a
handful of queries, the MEDIAN per-query ratio across the sweep is an
estimate of that sweep-wide noise factor, not of any real regression
— so it is divided out before the 2x bar is applied. A genuine
regression then stands out as adj > 2x even in a slow window, and a
uniformly slow window flags nothing (round 5's sim_nn_within_label
false positive needed a paragraph of cross-window forensics under the
raw-ratio rule; under this rule it never flags).

Also uses min-of-reps when the files carry "queries_reps"
(bench_full.py records 2 reps/query since round 6) and prints each
flagged mover's rep spread, so a one-off slow rep is visible at a
glance.

Usage: python tools/bench_delta.py BENCH_FULL_r05.json BENCH_FULL_r06.json [n]
"""

from __future__ import annotations

import json
import statistics
import sys

ABS_FLOOR_SEC = 0.2  # ignore ratio churn below this old-time floor
# The noise estimate is only trusted inside this band: outside it,
# either the sweep is broken or nearly every query genuinely moved,
# and silently "correcting" by a wild factor would hide exactly that.
NOISE_BAND = (0.5, 2.0)
MIN_COMMON = 10


def main() -> None:
    old_f, new_f = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    old_doc = json.load(open(old_f))
    new_doc = json.load(open(new_f))
    old, new = old_doc["queries"], new_doc["queries"]
    new_reps = new_doc.get("queries_reps", {})

    # Sweep-wide noise scalar: median ratio over ALL comparable
    # queries (almost all are untouched in any given round).
    all_ratios = [
        new[n] / max(old[n], 1e-3)
        for n in new
        if n in old and max(old[n], new[n]) >= ABS_FLOOR_SEC
    ]
    if len(all_ratios) >= MIN_COMMON:
        noise = statistics.median(all_ratios)
        if not (NOISE_BAND[0] <= noise <= NOISE_BAND[1]):
            print(
                f"WARNING: noise scalar {noise:.2f} outside "
                f"{NOISE_BAND} — not applied; the whole sweep moved, "
                "investigate the window itself",
                file=sys.stderr,
            )
            noise = 1.0
    else:
        noise = 1.0

    rows = []
    for name, t_new in new.items():
        t_old = old.get(name)
        if t_old is None:
            rows.append((float("inf"), None, name, None, t_new))
        elif max(t_old, t_new) >= ABS_FLOOR_SEC:
            # bench_full rounds to 3 decimals, so a sub-0.5ms old time
            # can arrive as exactly 0.0 — floor it rather than crash
            # on the very regression the tool exists to report.
            raw = t_new / max(t_old, 1e-3)
            rows.append((raw / noise, raw, name, t_old, t_new))
    rows.sort(reverse=True)
    print(
        f"noise scalar (median ratio, {len(all_ratios)} comparable "
        f"queries): {noise:.3f} — adj = raw / {noise:.3f}"
    )
    print(f"\n| query | {old_f} | {new_f} | raw | adj |")
    print("|---|---|---|---|---|")
    for adj, raw, name, t_old, t_new in rows[:top_n]:
        if t_old is None:
            print(f"| {name} | — (new) | {t_new:.2f} s | — | — |")
        else:
            flag = " **>2x**" if adj > 2 else ""
            spread = (
                f" (reps {new_reps[name]})"
                if adj > 2 and name in new_reps
                else ""
            )
            print(
                f"| {name} | {t_old:.2f} s | {t_new:.2f} s | "
                f"{raw:.2f}x | {adj:.2f}x{flag}{spread} |"
            )
    gone = sorted(set(old) - set(new))
    if gone:
        print(f"\nremoved since {old_f}: {', '.join(gone)}")
    slow = [r for r in rows if r[1] is not None and r[0] > 2]
    print(
        f"\n{len(slow)} queries over the noise-adjusted 2x bar"
        + (": " + ", ".join(r[2] for r in slow) if slow else "")
    )


if __name__ == "__main__":
    main()
