"""Crash-debris and corruption recovery: the states a kill -9 or a
bad copy can leave on disk must never change what a reader sees.

The commit protocol (manifest.py:commit — tmp write + fsync + atomic
os.link + dir fsync) means our OWN writer leaves only two kinds of
debris: a stray ``*.tmp`` in the manifest dir (killed before link)
and an unreferenced segment file (killed between segment write and
manifest commit).  Checkpoint corruption additionally models bitrot /
truncated external copies of DERIVED data."""

import json
import os

from durablestreams_spark.manifest import CHECKPOINT_INTERVAL
from durablestreams_spark.stream import StreamCatalog


def _produce_n(s, n, start=0):
    for i in range(start, start + n):
        s.produce([{"i": i}])


def test_stray_tmp_files_ignored(tmp_path):
    """Kill before os.link leaves a fsynced .tmp in the manifest dir;
    recovery must ignore it entirely."""
    s = StreamCatalog(str(tmp_path)).stream("t")
    _produce_n(s, 3)
    mdir = s.manifest.dir
    with open(os.path.join(mdir, "tmpabc123.tmp"), "w") as f:
        f.write('{"add": [{"name": "ghost.parquet"')  # torn JSON
    s2 = StreamCatalog(str(tmp_path)).stream("t")
    recs = s2.consume("-", limit=10)
    assert [r.data["i"] for r in recs] == [0, 1, 2]
    assert "ghost.parquet" not in s2.refresh().active


def test_unreferenced_segment_invisible_until_committed(tmp_path):
    """Kill between segment write and manifest commit leaves a parquet
    file no commit references; readers must not see it (and orphan
    purge reclaims it later — tests/test_compaction.py)."""
    s = StreamCatalog(str(tmp_path)).stream("t")
    _produce_n(s, 3)
    orphan = os.path.join(
        s.segments_dir, "99999999999999999999-crash.parquet"
    )
    with open(orphan, "wb") as f:
        f.write(b"PAR1 not really parquet")
    s2 = StreamCatalog(str(tmp_path)).stream("t")
    recs = s2.consume("-", limit=10)
    assert [r.data["i"] for r in recs] == [0, 1, 2]


def test_corrupt_latest_checkpoint_falls_back(tmp_path):
    """A truncated NEWEST checkpoint must be skipped: recovery falls
    back to the previous checkpoint (or full replay) and the folded
    state is identical to the uncorrupted one."""
    s = StreamCatalog(str(tmp_path)).stream("t")
    # two checkpoint generations plus a tail
    _produce_n(s, 2 * CHECKPOINT_INTERVAL + 3)
    before = s.manifest.load()
    cps = sorted(
        fn for fn in os.listdir(s.manifest.dir)
        if fn.endswith(".checkpoint.json")
    )
    assert len(cps) >= 2, cps
    latest = os.path.join(s.manifest.dir, cps[-1])
    blob = open(latest).read()
    with open(latest, "w") as f:
        f.write(blob[: len(blob) // 2])  # truncate: invalid JSON
    after = s.manifest.load()
    assert after.version == before.version
    assert sorted(after.active) == sorted(before.active)
    # end-to-end: a fresh catalog handle reads every record
    s2 = StreamCatalog(str(tmp_path)).stream("t")
    recs = s2.consume("-", limit=10_000)
    assert len(recs) == 2 * CHECKPOINT_INTERVAL + 3


def test_all_checkpoints_corrupt_full_replay(tmp_path):
    """Even with EVERY checkpoint unreadable, the commit log alone
    reconstructs the state (checkpoints are pure derived data)."""
    s = StreamCatalog(str(tmp_path)).stream("t")
    _produce_n(s, CHECKPOINT_INTERVAL + 2)
    before = s.manifest.load()
    for fn in os.listdir(s.manifest.dir):
        if fn.endswith(".checkpoint.json"):
            with open(os.path.join(s.manifest.dir, fn), "w") as f:
                f.write("{ torn")
    after = s.manifest.load()
    assert after.version == before.version
    assert sorted(after.active) == sorted(before.active)


def test_checkpoint_fallback_respects_as_of(tmp_path):
    """VERSION AS OF through a corrupt checkpoint still time-travels
    to the exact requested version."""
    s = StreamCatalog(str(tmp_path)).stream("t")
    _produce_n(s, CHECKPOINT_INTERVAL + 2)
    want = CHECKPOINT_INTERVAL - 1
    snap_before = s.manifest.load(as_of=want)
    for fn in os.listdir(s.manifest.dir):
        if fn.endswith(".checkpoint.json"):
            with open(os.path.join(s.manifest.dir, fn), "w") as f:
                f.write("not json")
    snap_after = s.manifest.load(as_of=want)
    assert snap_after.version == snap_before.version == want
    assert sorted(snap_after.active) == sorted(snap_before.active)
