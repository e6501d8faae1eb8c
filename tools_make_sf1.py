"""Build an ~sf1 dataset by replicating sf0.1 tenfold with key-offset
remapping (referential integrity preserved: each copy shifts every
surrogate key by copy_idx * key_stride, so joins fan out exactly as a
genuinely larger scale factor would).  Dimension tables (nation/region) are
copied as-is; nationkey references stay valid.

Text and embeddings are PERTURBED per copy (copy 0 stays verbatim):
a genuinely larger corpus has mostly *different* documents, but a
verbatim 10x replication makes every doc a 10-way exact duplicate —
inflating near-dup density ~100x in pair space, which is what pushed
the dedup families' SQL oracles (recursive-CTE closure, banded pair
enumeration, exact-Jaccard ground truth) quadratic at sf1.  Replica
k>0 of a document replaces every 4th token (phase keyed on the strided
doc_id) with an md5-derived pseudo-token, driving replica-vs-original
Jaccard to ~0.1 — below near-dup thresholds — while keeping token
counts, n_chars conventions, and corpus statistics realistic;
embeddings get deterministic per-dim sin-noise (~0.4 sigma) so replica
vectors stop being exact SRP-bucket twins.  The perturbation is pure
DuckDB SQL at build time; Spark and the oracle both read the same
parquet, so engine portability is not involved.

Usage: python tools_make_sf1.py [dst_dir] [src_dir] [copies]
Defaults: /tmp/spark_graft_sf1 /root/testdata/sf0.1 10

Idempotent: skips the build if dst already has a _DONE marker.
"""

from __future__ import annotations

import os
import sys

import duckdb

#: Bust caches when the builder's logic changes — the file-stat
#: fingerprint alone cannot see code changes.
BUILDER_VERSION = 3

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
    parts = [f"v{BUILDER_VERSION}", os.path.abspath(src), str(copies)]
    for t in sorted(list(KEYED) + COPY_AS_IS):
        st = os.stat(f"{src}/{t}.parquet")
        parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def _documents_select(src: str, i: int, stride: int) -> str:
    """Copy i of documents: i=0 verbatim; i>0 replaces every 4th token
    (phase keyed on the strided doc_id, so each copy's edits differ;
    period 4 > the 3-token shingle width, so a small fraction of
    shingles survives — replicas read as weakly-related documents, not
    duplicates and not noise) with a 7-char md5 pseudo-token, then
    recomputes n_chars to keep the fixture's n_chars == len(text)
    invariant."""
    if i == 0:
        return f"SELECT * FROM read_parquet('{src}/documents.parquet')"
    off = i * stride
    text_expr = (
        "array_to_string(list_transform(string_split(text, ' '), "
        f"(t, j) -> CASE WHEN (j + doc_id + {i}) % 4 = 0 "
        f"THEN 'w' || substr(md5(t || ':' || CAST(doc_id + {off} AS VARCHAR)), 1, 6) "
        "ELSE t END), ' ')"
    )
    return (
        f"SELECT doc_id, text, lang, source, len(text) AS n_chars FROM ("
        f"SELECT doc_id + {off} AS doc_id, {text_expr} AS text, lang, source "
        f"FROM read_parquet('{src}/documents.parquet'))"
    )


def _embeddings_select(src: str, i: int, stride: int) -> str:
    """Copy i of embeddings: i=0 verbatim; i>0 adds deterministic
    per-dimension sin-noise (amplitude 0.05 ~ 0.4 sigma of the fixture's
    value distribution) so replica vectors land in different SRP/IVF
    buckets instead of being bit-identical twins."""
    if i == 0:
        return f"SELECT * FROM read_parquet('{src}/embeddings.parquet')"
    off = i * stride
    emb_expr = (
        "CAST(list_transform(embedding, (x, j) -> "
        f"x + 0.05 * sin(CAST((vec_id + {off}) * 131 + j * 37 + {i} * 17 "
        "AS DOUBLE))) AS FLOAT[])"
    )
    return (
        f"SELECT vec_id + {off} AS vec_id, {emb_expr} AS embedding, label "
        f"FROM read_parquet('{src}/embeddings.parquet')"
    )


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
        if t == "documents":
            selects = [
                _documents_select(src, i, strides["doc_id"])
                for i in range(copies)
            ]
        elif t == "embeddings":
            selects = [
                _embeddings_select(src, i, strides["vec_id"])
                for i in range(copies)
            ]
        else:
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
