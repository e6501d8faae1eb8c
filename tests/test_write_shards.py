"""Training-shard writer (pipeline_write_shards).

The writer's contract: a SEEDED deterministic shuffle — two
independent builds must produce byte-identical shard assignment (same
sequence -> same shard at the same position), fixed-size rank blocks,
and complete coverage (every packed sequence lands in exactly one
shard).
"""

import os

SF_DIR = "/root/testdata/sf0.001"


def _build(spark, root):
    from durablestreams_spark.operators.pipeline_llm import _write_shards

    return _write_shards(spark, SF_DIR, root=root).select(
        "shard_out", "rank", "key", "shard", "seq_id", "n_tokens_in"
    )


def test_rerun_is_byte_identical(spark, tmp_path):
    """Two independent builds (separate artifact roots, no shared
    cache) must produce the identical (shard, position, identity)
    assignment — the reproducibility property that lets a training
    run be resumed or audited from the seed alone."""
    a = sorted(map(tuple, _build(spark, str(tmp_path / "a")).collect()))
    b = sorted(map(tuple, _build(spark, str(tmp_path / "b")).collect()))
    assert a == b
    assert len(a) > 0


def test_shards_cover_exactly_the_packed_sequences(spark, tmp_path):
    """No sequence dropped, duplicated, or invented: the written rows'
    (shard, seq_id) multiset equals pipeline_pack_sequences' output,
    and ranks are the contiguous 1..M permutation."""
    from durablestreams_spark.analytics.core import all_queries

    rows = _build(spark, str(tmp_path / "c")).collect()
    packed = all_queries()["pipeline_pack_sequences"].fn(
        spark, SF_DIR
    ).collect()
    assert sorted((r.shard, r.seq_id) for r in rows) == sorted(
        (p.shard, p.seq_id) for p in packed
    )
    ranks = sorted(r.rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_shards_are_fixed_size_rank_blocks(spark, tmp_path):
    """Shard i holds exactly the ranks in block i of size
    ceil(M / WRITE_SHARDS) — fixed-count shards, contiguous in the
    shuffled order (the WebDataset layout)."""
    from durablestreams_spark.operators.pipeline_llm import WRITE_SHARDS

    rows = _build(spark, str(tmp_path / "d")).collect()
    m = len(rows)
    chunk = -(-m // WRITE_SHARDS)
    for r in rows:
        assert r.shard_out == (r.rank - 1) // chunk


def test_artifact_is_partitioned_per_shard(spark, tmp_path):
    """The written layout is one parquet partition directory per
    output shard (the shard FILES a trainer consumes), not a single
    blob."""
    root = str(tmp_path / "e")
    df = _build(spark, root)
    shard_ids = {r.shard_out for r in df.select("shard_out").collect()}
    dirs = {
        d
        for d in os.listdir(os.path.join(root, "shards.parquet"))
        if d.startswith("shard_out=")
    }
    assert dirs == {f"shard_out={s}" for s in shard_ids}
