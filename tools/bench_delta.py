#!/usr/bin/env python
"""Round-over-round BENCH_FULL comparison: print the top-N movers
between two full-registry sweeps as a markdown table (pasted into
BASELINE.md each round).

Single-rep sweeps on a shared host carry ~2x noise, so the table
shows the ratio and both absolute times and flags only >2x slowdowns
above an absolute floor (sub-100ms queries flip ratios on scheduler
jitter alone).

Usage: python tools/bench_delta.py BENCH_FULL_r04.json BENCH_FULL_r05.json [n]
"""

from __future__ import annotations

import json
import sys

ABS_FLOOR_SEC = 0.2  # ignore ratio churn below this old-time floor


def main() -> None:
    old_f, new_f = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    old = json.load(open(old_f))["queries"]
    new = json.load(open(new_f))["queries"]
    rows = []
    for name, t_new in new.items():
        t_old = old.get(name)
        if t_old is None:
            rows.append((float("inf"), name, None, t_new))
        elif max(t_old, t_new) >= ABS_FLOOR_SEC:
            # bench_full rounds to 3 decimals, so a sub-0.5ms old time
            # can arrive as exactly 0.0 — floor it rather than crash
            # on the very regression the tool exists to report.
            rows.append((t_new / max(t_old, 1e-3), name, t_old, t_new))
    rows.sort(reverse=True)
    print(f"| query | {old_f} | {new_f} | ratio |")
    print("|---|---|---|---|")
    for ratio, name, t_old, t_new in rows[:top_n]:
        if t_old is None:
            print(f"| {name} | — (new) | {t_new:.2f} s | — |")
        else:
            flag = " **>2x**" if ratio > 2 else ""
            print(f"| {name} | {t_old:.2f} s | {t_new:.2f} s | {ratio:.2f}x{flag} |")
    gone = sorted(set(old) - set(new))
    if gone:
        print(f"\nremoved since {old_f}: {', '.join(gone)}")
    slow = [r for r in rows if r[2] is not None and r[0] > 2]
    print(
        f"\n{len(slow)} queries over the 2x bar"
        + (": " + ", ".join(r[1] for r in slow) if slow else "")
    )


if __name__ == "__main__":
    main()
