"""Compare two bench artifacts: totals, median ratio, 2x-band outliers.

The cross-round reproducibility check (VERDICT r8 #4's done criterion):

    python tools/capture_compare.py BENCH_full_a.json BENCH_full_b.json

Entries outside the 2x band between two captures mark co-tenant bursts
that survived even the per-capture min-of-2/3; anything listed here
needs an isolated re-time (tools/isolated_retime.py) before being read
as a regression. Sub-0.5 s entries are skipped — at that absolute
scale a 2x swing is scheduler jitter, not signal.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    common = sorted(set(a) & set(b))
    out = [
        k
        for k in common
        if max(a[k], b[k]) > 2 * min(a[k], b[k]) and max(a[k], b[k]) > 0.5
    ]
    ratios = sorted(b[k] / a[k] for k in common if a[k] > 0)
    print(
        f"common={len(common)} sum_a={sum(a[k] for k in common):.1f} "
        f"sum_b={sum(b[k] for k in common):.1f} "
        f"median_ratio={statistics.median(ratios):.3f} "
        f"outside_2x_band={len(out)}"
    )
    for k in sorted(out, key=lambda k: -max(a[k], b[k])):
        print(f"  {k}: {a[k]} vs {b[k]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
