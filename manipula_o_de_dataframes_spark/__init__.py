"""manipula_o_de_dataframes_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine with the query and data-processing
capabilities of the reference repo ``tiago-cappi/Manipula-o-de-dataframes``
(a pandas/Streamlit commercial-analytics toolkit), re-expressed as lazy
Spark DataFrame plans so Catalyst/Tungsten/AQE pick the physical strategy.

Layout
------
- ``session``    : SparkSession builder (AQE on, sane shuffle partitions).
- ``sources``    : scan/sink adapters (parquet-first; ordered multi-file
                   ingest with labels; Excel adapter behind an import-try).
- ``operators``  : the relational operator library (SURVEY.md §2) —
                   cleaning, filters, joins, aggregates, windows, sorting,
                   set ops, pagination, quality diagnostics, dedup,
                   similarity search, multimodal plumbing.
- ``functions``  : scalar expression builders (formatting, dates, text
                   analytics, vector math).
- ``plans``      : the reference's three end-to-end pipelines (ABC
                   classification, product×client history, pending
                   consolidation) as composed lazy DataFrame plans.
- ``streaming``  : Structured Streaming variant of the weekly-snapshot
                   ingest (no reference semantics to match; batch is the
                   source of truth).

Scale posture: every operator is a declarative DataFrame plan — filters
and projections push to the parquet scan, small dimensions broadcast,
aggregations get map-side partial combine, and "first/keep-first" sites
pin an explicit total order so results are deterministic under any
partitioning (pandas got that for free from row order; Spark must not
rely on it).
"""

__version__ = "0.1.0"
