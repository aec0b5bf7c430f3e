"""Pending-proposal consolidation (EP2).

Reference: processar_arquivos_pendentes + exibir_analise_pendentes
(analise_pendentes.py:17-51, 53-125): union N weekly snapshots, filter
Status Processo == 'PENDENTE', tag each with a week label, then
count / count-distinct / sum per week.

Two surfaces:
- ``pending_by_week`` — the oracle-checked batch query on testdata:
  orders with o_orderstatus = 'P' ('PENDENTE'), week = ISO week start
  of o_orderdate (the snapshot-label analog), per-week metrics.
- the file-snapshot variant with positional "Semana -N" labels lives in
  ``sources.read_ordered_snapshots`` + ``streaming.pending_stream``.

Plan: filter pushes to the parquet scan (PushedFilters), one hash
aggregate with partial combine; countDistinct is exact (reference uses
nunique). At 100 TB this is scan + one small shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.formatting import dsum
from ..sources.io import read_table


def pending_by_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    pending = orders.filter(F.col("o_orderstatus") == "P")
    week = F.date_format(F.date_trunc("week", F.col("o_orderdate")), "yyyy-MM-dd")
    return (
        pending.withColumn("semana", week)
        .groupBy("semana")
        .agg(
            F.count(F.lit(1)).alias("n_pendentes"),
            F.countDistinct("o_custkey").alias("n_clientes"),
            dsum("o_totalprice").alias("valor_total"),
        )
    )
