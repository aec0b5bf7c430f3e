"""Local replica of the driver's correctness gate.

Runs each Spark query and its DuckDB oracle on the same parquet tables
and compares row count, column names, and order-insensitive values —
exactly (not approximately): the goal is hash-level parity, so floats
must match bit-for-bit. Used by tests/test_oracle_parity.py and usable
standalone for debugging a single query.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from .sources.io import TPCH_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].map(lambda x: None if x is None or x != x else str(x))
    return out.sort_values(by=list(out.columns), na_position="first").reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions; empty list = parity."""
    issues: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        return [f"columns differ: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"]
    if len(sp) != len(oracle_df):
        issues.append(f"row count: spark={len(sp)} oracle={len(oracle_df)}")
        return issues
    a, b = _canon(sp), _canon(oracle_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        # The driver's value hash is dtype-/rendering-sensitive: a bigint
        # Spark column meeting a float64 oracle column hash-mismatches even
        # when every value is equal (r5's km_survival red — DuckDB HUGEINT
        # division surfacing as float64). Flag int-vs-float skew outright
        # instead of silently widening both sides to float64.
        a_float = np.issubdtype(a[c].dtype, np.floating)
        b_float = np.issubdtype(b[c].dtype, np.floating)
        a_int = np.issubdtype(a[c].dtype, np.integer)
        b_int = np.issubdtype(b[c].dtype, np.integer)
        if (a_float and b_int) or (a_int and b_float):
            issues.append(
                f"col {c}: DTYPE-SKEW spark={a[c].dtype} oracle={b[c].dtype} "
                "(driver hash is dtype-sensitive; CAST the oracle or the query)"
            )
            continue
        if a_float or b_float:
            af = a[c].astype("float64").to_numpy()
            bf = b[c].astype("float64").to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            exact = (af == bf) | both_nan
            if not exact.all():
                close = np.isclose(af, bf, rtol=1e-9, atol=1e-12, equal_nan=True)
                kind = "CLOSE-BUT-NOT-EXACT" if close.all() else "DIVERGENT"
                i = int(np.argmin(exact))
                issues.append(
                    f"col {c}: {int((~exact).sum())}/{len(af)} float mismatches ({kind}); "
                    f"e.g. row {i}: spark={af[i]!r} oracle={bf[i]!r}"
                )
        else:
            eq = pd.Series(av).fillna("\0NULL") == pd.Series(bv).fillna("\0NULL")
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                issues.append(
                    f"col {c}: {int((~eq).sum())}/{len(av)} mismatches; "
                    f"e.g. row {i}: spark={av[i]!r} oracle={bv[i]!r}"
                )
    return issues
