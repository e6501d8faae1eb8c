"""Build an ~sf1 dataset by replicating sf0.1 tenfold with key-offset
remapping (referential integrity preserved: each copy shifts every
surrogate key by copy_idx * key_stride, so joins fan out exactly as a
genuinely larger scale factor would).  Dimension tables (nation/region) are
copied as-is; nationkey references stay valid.

Usage: python tools_make_sf1.py [dst_dir] [src_dir] [copies]
Defaults: /tmp/spark_graft_sf1 /root/testdata/sf0.1 10

Idempotent: skips the build if dst already has a _DONE marker.
"""

from __future__ import annotations

import os
import sys

import duckdb

# (table, {col: stride}) — stride chosen >= max key + headroom so copies
# never collide.  Timestamps are left untouched: event-time density per
# user rises 10x, which is exactly the harder regime windows/as-of must
# survive at scale.
KEYED = {
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 100_000,
    },
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}
COPY_AS_IS = ["nation", "region"]


def _fingerprint(src: str, copies: int) -> str:
    """Source identity for the _DONE marker: a stale cache built from a
    previous fixture generation (or another src) must trigger a
    rebuild, not silently mislabel the sf1 numbers."""
    parts = [os.path.abspath(src), str(copies)]
    for t in sorted(list(KEYED) + COPY_AS_IS):
        st = os.stat(f"{src}/{t}.parquet")
        parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def build(dst: str, src: str, copies: int) -> None:
    marker = os.path.join(dst, "_DONE")
    fp = _fingerprint(src, copies)
    try:
        with open(marker) as f:
            if f.read().strip() == fp:
                return
    except OSError:
        pass
    import shutil

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, strides in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(copies):
            proj = ", ".join(
                f"{c} + {i * strides[c]} AS {c}" if c in strides else c
                for c in cols
            )
            selects.append(
                f"SELECT {proj} FROM read_parquet('{src}/{t}.parquet')"
            )
        union = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({union}) TO '{dst}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 200000)"
        )
    with open(marker, "w") as f:
        f.write(fp)


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(dst, src, copies)
    print(dst)
