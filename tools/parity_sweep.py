"""Pre-flight the driver's correctness gate at an arbitrary SF.

The pytest gate runs every query at sf0.001; the driver grades at
sf0.01. Float-fragile formulations can be green at one scale and red
at the other (more rows → more chances to land on a rounding
boundary), so this sweep replays the EXACT driver condition locally:

    SPARK_GRAFT_CPUS=8 python tools/parity_sweep.py [sf_dir] [names...]

Prints one line per query (OK / RED + issues) and a summary; exit 1 on
any red. Used before each round's close — the r4 `join_skew_profile`
red would have been caught by exactly this run.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from manipula_o_de_dataframes_spark.oracles import ORACLES  # noqa: E402
from manipula_o_de_dataframes_spark.parity import compare, run_oracle  # noqa: E402
from manipula_o_de_dataframes_spark.queries import NO_ORACLE, QUERIES  # noqa: E402
from manipula_o_de_dataframes_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("parity-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    # SPARK_GRAFT_TZ=America/Sao_Paulo replays the sweep under a
    # non-UTC session (the driver's session config is unknown; the
    # r5 keyset_page tz bug was visible ONLY under a shifted zone).
    tz = os.environ.get("SPARK_GRAFT_TZ")
    if tz:
        spark.conf.set("spark.sql.session.timeZone", tz)
        print(f"session timezone overridden: {tz}")
    reds: list[str] = []
    t_all = time.perf_counter()
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            if name in NO_ORACLE:
                n = df.count()
                issues = [] if n > 0 else ["rows-only check: 0 rows"]
            else:
                issues = compare(df, run_oracle(ORACLES[name], sf_dir))
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            issues = [f"EXC {type(exc).__name__}: {exc}"]
        dt = time.perf_counter() - t0
        if issues:
            reds.append(name)
            print(f"RED  {name} ({dt:.1f}s): " + " | ".join(issues), flush=True)
        else:
            print(f"ok   {name} ({dt:.1f}s)", flush=True)
        if i % 8 == 7:
            spark.sparkContext._jvm.System.gc()
    print(
        f"SUMMARY sf_dir={sf_dir} total={len(names)} red={len(reds)} "
        f"wall={time.perf_counter() - t_all:.0f}s "
        + (("REDS: " + ",".join(reds)) if reds else "ALL GREEN"),
        flush=True,
    )
    return 1 if reds else 0


if __name__ == "__main__":
    sys.exit(main())
