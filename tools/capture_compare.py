"""Compare two bench artifacts: totals, median ratio, band outliers.

The cross-round reproducibility check (VERDICT r8 #4's done criterion):

    python tools/capture_compare.py BENCH_full_a.json BENCH_full_b.json

Either path may be `git:REV:PATH` (e.g. `git:HEAD~1:BENCH_full.json`)
to read the artifact from a git revision — so the PRIOR round's
committed capture is always diffable without keeping renamed copies.

Two bands are reported (VERDICT r9 #1 — the r9 cross-capture audit at
2x missed four queries that regressed between ROUNDS at 1.4–2.8x):

- outside_2x_band: co-tenant bursts that survived per-capture
  min-of-2/3; each needs an isolated re-time
  (tools/isolated_retime.py) before being read as a regression.
- regressions_1p4x (b vs a, directional): every entry whose newer time
  exceeds the older by >1.4x. When `a` is the prior round's committed
  artifact, this IS the list the isolated-re-time protocol must
  process before close — noise-classify or rewrite, never ignore.

Sub-0.5 s entries are skipped in both bands — at that absolute scale
a 2x swing is scheduler jitter, not signal.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys


def _load(spec: str) -> dict:
    if spec.startswith("git:"):
        _, rev, path = spec.split(":", 2)
        raw = subprocess.run(
            ["git", "show", f"{rev}:{path}"],
            capture_output=True,
            check=True,
            text=True,
        ).stdout
        return json.loads(raw)
    return json.load(open(spec))


def main() -> int:
    art_a = _load(sys.argv[1])
    art_b = _load(sys.argv[2])
    a, b = art_a["queries"], art_b["queries"]
    common = sorted(set(a) & set(b))
    out = [
        k
        for k in common
        if max(a[k], b[k]) > 2 * min(a[k], b[k]) and max(a[k], b[k]) > 0.5
    ]
    regress = [k for k in common if b[k] > 1.4 * a[k] and b[k] > 0.5]
    ratios = sorted(b[k] / a[k] for k in common if a[k] > 0)
    print(
        f"common={len(common)} sum_a={sum(a[k] for k in common):.1f} "
        f"sum_b={sum(b[k] for k in common):.1f} "
        f"median_ratio={statistics.median(ratios):.3f} "
        f"outside_2x_band={len(out)} regressions_1p4x={len(regress)}"
    )
    for k in sorted(out, key=lambda k: -max(a[k], b[k])):
        print(f"  2x  {k}: {a[k]} vs {b[k]}")
    for k in sorted(regress, key=lambda k: -b[k] / a[k]):
        print(f"  1.4x {k}: {a[k]} -> {b[k]} ({b[k] / a[k]:.2f}x)")
    # Spool builds are part of the headline total but were invisible to
    # this diff (r10: the one-scan edge build halved doc_clusters
    # 7.9 -> 3.7 s and only bench_report's total showed it; the inverse
    # — a spool silently doubling — deserves the same 1.4x flag the
    # queries get).
    sa = art_a.get("spool_build_seconds", {})
    sb = art_b.get("spool_build_seconds", {})
    sc = sorted(set(sa) & set(sb))
    if sc:
        sregress = [k for k in sc if sb[k] > 1.4 * sa[k] and sb[k] > 0.5]
        print(
            f"spools common={len(sc)} sum_a={sum(sa[k] for k in sc):.1f} "
            f"sum_b={sum(sb[k] for k in sc):.1f} "
            f"regressions_1p4x={len(sregress)}"
        )
        for k in sorted(sregress, key=lambda k: -sb[k] / sa[k]):
            print(f"  1.4x spool {k}: {sa[k]} -> {sb[k]} ({sb[k] / sa[k]:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
