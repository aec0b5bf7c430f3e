"""Render the SURVEY §6 close-gate row FROM the committed bench artifact.

VERDICT r8 #3: the builder's SURVEY headline drifted from the committed
`BENCH_full.json` twice (r7: 314 vs 433 s; r8: 399.0 vs 415.7 s) because
the row was typed next to the artifact instead of generated from it.
This script IS the generator: it recomputes the headline total with the
exact accounting bench.py uses (sum of per-query mins excluding the two
permissive contrast fixtures, plus the spool-build total) and prints a
paste-ready SURVEY line. The SURVEY close row must byte-match:

    python tools/bench_report.py BENCH_full.json
"""

from __future__ import annotations

import json
import sys

BASELINE_FIXTURES = ("near_dup_jaccard", "embedding_near_dup")


def report(path: str) -> str:
    with open(path) as fh:
        art = json.load(fh)
    q = art["queries"]
    spools = art.get("spool_build_seconds", {})
    spool_total = round(sum(spools.values()), 1)
    scale_path = round(
        sum(v for k, v in q.items() if k not in BASELINE_FIXTURES), 1
    )
    total = round(scale_path + spool_total, 1)
    fixtures = round(sum(q.get(k, 0.0) for k in BASELINE_FIXTURES), 2)
    probes = art.get("machine_probe_seconds")
    probe_txt = (
        f"machine probe {probes[0]:.2f}/{probes[1]:.2f} s"
        if probes
        else "machine probe n/a"
    )
    noisy = art.get("noisy_entries_runs", {})
    noisy_txt = (
        f"{len(noisy)} min-of-3 entries ({', '.join(sorted(noisy))})"
        if noisy
        else "0 min-of-3 entries"
    )
    n = sum(1 for k in q if k not in BASELINE_FIXTURES)
    return (
        f"{total} s = {scale_path} query + {spool_total} spool over "
        f"{n} scale-path queries at sf{art.get('sf')}; "
        f"baseline fixtures {fixtures} s; {probe_txt}; {noisy_txt}"
    )


if __name__ == "__main__":
    print(report(sys.argv[1] if len(sys.argv) > 1 else "BENCH_full.json"))
