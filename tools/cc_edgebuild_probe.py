"""10x scale probe for the r10 one-scan CC edge build (SURVEY 6.20).

Times `dedup_clusters` end-to-end (noop sink) on the sf0.1 documents
table and on the 10x jittered replica set (tools/make_replicas.py with
`jitter` — cross-replica shingle similarity crushed, within-replica
near-dup structure preserved, per the 6.11 probe protocol), min-of-2
per scale in one warm session, and reports the verified-edge count at
each scale so pair-volume growth is visible next to wall growth.

    python tools/cc_edgebuild_probe.py [sf_dir] [x10_dir]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from manipula_o_de_dataframes_spark.operators.dedup import dedup_clusters  # noqa: E402
from manipula_o_de_dataframes_spark.session import get_spark  # noqa: E402
from manipula_o_de_dataframes_spark.sources.io import read_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    x10_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_repl10j"
    spark = get_spark("cc-edgebuild-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JVM/codegen on the small SF, untimed
    dedup_clusters(
        read_table(spark, "/root/testdata/sf0.001", "documents"),
        "text",
        "doc_id",
    ).write.mode("overwrite").format("noop").save()

    for tag, d in (("1x", sf_dir), ("10x", x10_dir)):
        docs = read_table(spark, d, "documents")
        n_docs = docs.count()
        runs = []
        n_clusters = -1
        for _ in range(2):
            t0 = time.perf_counter()
            out = dedup_clusters(docs, "text", "doc_id")
            out.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 2))
        # cluster census (untimed): docs in non-singleton clusters
        agg = (
            dedup_clusters(docs, "text", "doc_id")
            .groupBy("cluster")
            .count()
            .filter("count > 1")
        )
        n_clusters = agg.count()
        print(
            f"{tag}: docs={n_docs} wall_min={min(runs)}s runs={runs} "
            f"multi_clusters={n_clusters}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
