"""ABC / Pareto customer classification — the reference's flagship.

Reference: classificar_clientes_abc (análise_produtos_clientes.py:50-116
and manipulacao-analise-comercial.py:443-498 — two syntactic variants,
identical semantics): rank customers by total quoted value, compute
percent-of-total and cumulative percent over the descending order, bucket
A/B/C at 80%/95%, rank with SQL-RANK tie semantics (pandas
method='min').

Testdata mapping (FIXTURES.md §4): customer=Cliente, quoted value =
lineitem.l_extendedprice via orders⋈lineitem.

Plan shape & scale: facts join on o_orderkey (the big join — AQE/sort-
merge, co-partitioned by key), ONE hash aggregate with map-side partial
sums down to |customers| rows, then the global windows (pct, cumsum,
rank) run on that small aggregate — the documented safe place for an
unpartitioned window (SURVEY §4.2). Sums are exact DECIMAL so the
distributed result is bit-identical to any single-node oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.formatting import MONEY
from ..operators.windows import abc_bucket, with_pct_and_cum, with_pct_and_cum_scaled
from ..sources.io import read_table, read_table_parallel


def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # Fan the fact scan out across cores (single-row-group testdata);
    # orders broadcasts, so the join + partial sum run fully parallel
    # and only tiny per-customer partials reach the second exchange.
    lineitem = read_table_parallel(spark, sf_dir, "lineitem", by=("l_orderkey",)).select(
        "l_orderkey", "l_extendedprice"
    )
    customer = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")

    fact = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).select(
        F.col("o_custkey").alias("cliente"),
        F.col("l_extendedprice").cast(MONEY).alias("val"),
    )
    totals = fact.groupBy("cliente").agg(F.sum("val").alias("total_dec"))

    return _finish_abc(with_pct_and_cum(totals, "total_dec", tiebreak="cliente"), customer)


def abc_classification_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship with the two-pass cumulative sum — no global window.

    Same semantics, bit-identical output (exact decimal arithmetic), so
    it shares abc_classification's oracle. This is the plan to run when
    the windowed input itself is huge (SURVEY §7 hard-4): range-bucketed
    parallel windows + broadcast prefix offsets instead of one
    single-partition sort.
    """
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = read_table_parallel(spark, sf_dir, "lineitem", by=("l_orderkey",)).select(
        "l_orderkey", "l_extendedprice"
    )
    customer = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    fact = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).select(
        F.col("o_custkey").alias("cliente"),
        F.col("l_extendedprice").cast(MONEY).alias("val"),
    )
    totals = fact.groupBy("cliente").agg(F.sum("val").alias("total_dec"))
    return _finish_abc(
        with_pct_and_cum_scaled(
            totals, "total_dec", tiebreak="cliente", rank_col="ranking"
        ),
        customer,
    )


def _finish_abc(with_pct: DataFrame, customer: DataFrame) -> DataFrame:
    cols = {"abc": abc_bucket("percentual_acumulado")}
    if "ranking" not in with_pct.columns:
        cols["ranking"] = F.rank().over(Window.orderBy(F.col("total_dec").desc())).cast("long")
    ranked = with_pct.withColumns(cols)
    return ranked.join(customer, ranked.cliente == customer.c_custkey).select(
        "cliente",
        F.col("c_name").alias("nome_cliente"),
        F.col("total_dec").cast("double").alias("valor_total"),
        "percentual",
        "percentual_acumulado",
        "abc",
        "ranking",
    )
