"""Fixture-fingerprinted cache markers for /tmp-cached graded builds.

Several graded log queries (re)build a stream from the events table
once per scale-factor directory and cache it under /tmp behind a
marker file.  A content-free marker is a correctness trap: the driver
has regenerated /root/testdata twice already (rounds 2 and 3), and a
stale cache would serve the OLD event set while the DuckDB oracle
reads the new parquet — a guaranteed, confusing hash mismatch.  The
marker therefore records a fingerprint of the source fixture (size +
mtime + footer row count — O(footer), no data read) and the cache is
rebuilt whenever it no longer matches.

The fingerprint must ALSO change when the BUILDER changes, not just
the source: round 5 changed the retention builder's segment geometry
(exact_segments=True) without bumping its cache key, so hosts with a
pre-change cache kept serving the old geometry against an oracle that
assumed the new one.  Call sites therefore fold their
geometry-affecting builder parameters into the marker via ``params``;
changing a builder knob invalidates every existing cache
automatically.
"""

from __future__ import annotations

import os


def fixture_fingerprint(sf_dir: str, name: str = "events", params: str = "") -> str:
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{name}.parquet"
    st = os.stat(path)
    n = pq.read_metadata(path).num_rows
    base = f"{st.st_size}:{st.st_mtime_ns}:{n}"
    return f"{base}:{params}" if params else base


def marker_current(
    marker: str, sf_dir: str, name: str = "events", params: str = ""
) -> bool:
    try:
        with open(marker) as f:
            return f.read().strip() == fixture_fingerprint(sf_dir, name, params)
    except OSError:
        return False


def write_marker(
    marker: str, sf_dir: str, name: str = "events", params: str = ""
) -> None:
    with open(marker, "w") as f:
        f.write(fixture_fingerprint(sf_dir, name, params))
