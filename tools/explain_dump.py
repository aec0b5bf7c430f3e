"""Dump `.explain("formatted")` for named queries into plans/<round>/.

Usage: python tools/explain_dump.py <suffix> <query> [<query> ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS   (default 32).

Writes plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<suffix>.txt (round dir
defaults to r11; suffix = "before" / "after").
Spools are built first so the captured plan is the warm, serving-shape
plan — the same condition bench.py times.
"""

from __future__ import annotations

import os
import sys

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from manipula_o_de_dataframes_spark.queries import (  # noqa: E402
    QUERIES,
    _doc_clusters,
    _edges_sym_deg,
    _event_transition_census,
    _edges_uv,
    _hb_round_regs,
    _minhash_sig8,
    _nation_week_rev,
    _obs_customer_frame,
    _order_spans,
    _bpe_top_merges,
    _pair_support,
    _weekly_nation_census,
    _pq_codes_spooled,
)
from manipula_o_de_dataframes_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    assert suffix in ("before", "after"), suffix
    assert names and all(n in QUERIES for n in names), sorted(
        set(names) - set(QUERIES)
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for build in (
        _edges_uv,
        _edges_sym_deg,
        _event_transition_census,
        lambda s, d: _hb_round_regs(s, d, 4),
        _doc_clusters,
        _minhash_sig8,
        _nation_week_rev,
        _pq_codes_spooled,
        _bpe_top_merges,
        _pair_support,
        _weekly_nation_census,
        _obs_customer_frame,
        _order_spans,
    ):
        build(spark, sf_dir)
    out_dir = os.path.join(
        _REPO_DIR, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r11")
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
