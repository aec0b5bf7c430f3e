"""Build an N× disjoint-key replica of an sf dir for scale probes.

Usage: python tools/make_replicas.py [src_sf_dir] [out_dir] [n] [jitter]

Each replica shifts every key column by replica_idx * KEY_STRIDE so
key spaces stay disjoint while FK structure (order→lineitem,
customer→orders, part/supplier refs, doc/vec ids) is preserved —
the §6.8 protocol: the graph/corpus grows N× in nodes AND edges.
Non-key columns (timestamps, amounts, text) are left identical, so
disjoint copies of the same structure double as a determinism check
for structure-dependent queries. Writes parquet per table.

Pass a 4th arg `jitter` to perturb documents.text per replica:
every SECOND token is replaced by a replica-tagged token, which
crushes CROSS-replica shingle similarity (the §6.11 lesson —
identical-copy replicas make pair-emitting near-dup probes measure
output explosion, not scale) while preserving WITHIN-replica near-dup
structure (aligned texts get the same positional perturbation, so
their mutual Jaccard survives). Use jittered replicas for
near-dup/banding probes, plain ones for everything else.
"""

from __future__ import annotations

import os
import sys

import duckdb

KEY_STRIDE = 10_000_000

SHIFTS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_replicas"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    jitter = len(sys.argv) > 4 and sys.argv[4] == "jitter"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, keys in SHIFTS.items():
        path = os.path.join(src, f"{table}.parquet")
        if not os.path.exists(path):
            continue
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{path}'").fetchall()]
        selects = []
        for i in range(n):
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + {i * KEY_STRIDE} AS {c}")
                elif jitter and table == "documents" and c == "text":
                    exprs.append(
                        "array_to_string(list_transform(string_split(text, ' '),"
                        f" (t, ix) -> CASE WHEN ix % 2 = 0 THEN 'j{i}x' ||"
                        " CAST(ix AS VARCHAR) ELSE t END), ' ') AS text"
                    )
                else:
                    exprs.append(c)
            selects.append(f"SELECT {', '.join(exprs)} FROM '{path}'")
        q = " UNION ALL ".join(selects)
        dest = os.path.join(out, f"{table}.parquet")
        con.sql(f"COPY ({q}) TO '{dest}' (FORMAT PARQUET)")
        rows = con.sql(f"SELECT COUNT(*) FROM '{dest}'").fetchone()[0]
        print(f"{table}: {rows} rows -> {dest}", flush=True)


if __name__ == "__main__":
    main()
