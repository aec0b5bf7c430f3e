"""Registry-wide dtype scan: Spark schema vs DuckDB oracle pandas dtypes.

The driver's value hash is dtype-/rendering-sensitive: a Spark bigint
column meeting a float64 oracle column hash-mismatches even when every
value is equal. The r5 red (`km_survival`) was exactly this — DuckDB's
HUGEINT (from un-CAST SUM arithmetic) surfaces as float64 in `.df()`
while Spark emits bigint. This scan finds every such skew across the
whole registry. Spark column types come from the plan's schema — for
LAZY queries that means no Spark execution, but building the plan for
eager queries DOES run real work (global_rank_scaled spools+observes at
build time; the q_stream_* harnesses drain full micro-batch pipelines),
so a full scan is heavier than a schema peek (r6 ADVICE). The oracle
runs at a small SF in DuckDB.

Rule: Spark integral type + oracle float64 column containing no NaN
=> SKEW (the oracle needs a CAST ... AS BIGINT, or the query is wrong).
If the oracle column has NaN, both sides render as float64 in pandas
(Spark nullable ints widen too), so that case is not a skew.
The reverse (Spark float/double + oracle int64) is also a skew.

    SPARK_GRAFT_CPUS=8 python tools/dtype_scan.py [sf_dir] [names...]

Exit 1 on any skew.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import types as T  # noqa: E402

from manipula_o_de_dataframes_spark.oracles import ORACLES  # noqa: E402
from manipula_o_de_dataframes_spark.parity import run_oracle  # noqa: E402
from manipula_o_de_dataframes_spark.queries import NO_ORACLE, QUERIES  # noqa: E402
from manipula_o_de_dataframes_spark.session import get_spark  # noqa: E402

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOATING = (T.FloatType, T.DoubleType)


def scan_one(spark, name: str, sf_dir: str) -> list[str]:
    df = QUERIES[name](spark, sf_dir)
    spark_types = {f.name: f.dataType for f in df.schema.fields}
    pdf = run_oracle(ORACLES[name], sf_dir)
    skews: list[str] = []
    for col, styp in spark_types.items():
        if col not in pdf.columns:
            skews.append(f"{col}: missing from oracle result")
            continue
        odt = pdf[col].dtype
        o_float = np.issubdtype(odt, np.floating)
        o_int = np.issubdtype(odt, np.integer)
        if isinstance(styp, _INTEGRAL) and o_float:
            if not pdf[col].isna().any():
                skews.append(f"{col}: spark={styp.simpleString()} oracle={odt} (no NaN)")
        elif isinstance(styp, _FLOATING) and o_int:
            skews.append(f"{col}: spark={styp.simpleString()} oracle={odt}")
    return skews


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or [n for n in QUERIES if n not in NO_ORACLE]
    spark = get_spark("dtype-scan")
    spark.sparkContext.setLogLevel("ERROR")
    bad: dict[str, list[str]] = {}
    t0 = time.perf_counter()
    for i, name in enumerate(names):
        try:
            skews = scan_one(spark, name, sf_dir)
        except Exception as exc:  # noqa: BLE001 — scan must finish
            skews = [f"EXC {type(exc).__name__}: {exc}"]
        if skews:
            bad[name] = skews
            print(f"[{i + 1}/{len(names)}] SKEW {name}: {'; '.join(skews)}", flush=True)
        elif (i + 1) % 25 == 0:
            print(f"[{i + 1}/{len(names)}] ... ok so far", flush=True)
    dt = time.perf_counter() - t0
    print(f"\nscanned {len(names)} queries in {dt:.1f}s; {len(bad)} with dtype skew")
    for name, skews in bad.items():
        print(f"  {name}: {'; '.join(skews)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
