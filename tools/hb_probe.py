"""Measure-first probe for the hyperball_rounds_1_4 spool build
(VERDICT r11 target #3): time each component in isolation — the ws
spool (sym edges + self-loops), round-1 register build, and each merge
round — and dump the merge plan so the join strategy is visible.

Usage: python tools/hb_probe.py   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from manipula_o_de_dataframes_spark import queries as Q  # noqa: E402
from manipula_o_de_dataframes_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("hb_probe")
    spark.sparkContext.setLogLevel("ERROR")
    from manipula_o_de_dataframes_spark.operators.spool import spool

    # warm the JVM + the edges_uv spool (its build is a separate,
    # already-charged line item in the bench)
    t0 = time.perf_counter()
    Q._edges_uv(spark, sf_dir)
    print(f"edges_uv spool (prereq, separate line item): {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    _, ws = Q._hb_sym_edges(spark, sf_dir)
    ws = spool(ws)
    t_ws = time.perf_counter() - t0
    print(f"ws spool (sym+self, distinct nodes): {t_ws:.2f}s")

    t0 = time.perf_counter()
    b1 = spool(Q._hb_b1(ws))
    t_b1 = time.perf_counter() - t0
    print(f"round-1 build (md5 registers + 16-max agg): {t_b1:.2f}s")

    prev = b1
    for r in (2, 3, 4):
        merged = Q._hb_merge_round(ws, prev)
        if r == 2:
            print("=== merge round plan (round 2) ===")
            merged.explain("formatted")
        t0 = time.perf_counter()
        prev = spool(merged)
        print(f"round-{r} merge+spool: {time.perf_counter()-t0:.2f}s")


if __name__ == "__main__":
    main()
