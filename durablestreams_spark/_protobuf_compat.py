"""Locate a usable ``google.protobuf`` runtime for Spark 4's
``transformWithStateInPandas`` (TWS).

TWS Python workers speak a protobuf protocol to the JVM state server
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``); without the
``google.protobuf`` runtime the worker dies with an opaque "driver
worker crashed".  The package is not always installed — but hosts
that carry the Google Cloud SDK ship a vanilla, BSD-licensed,
pure-Python copy of the public protobuf runtime inside the App Engine
platform bundle.  This module finds such a copy and wires it up for
BOTH the driver process and Spark's Python workers:

- ``sys.path`` gains the runtime dir (driver-side imports);
- ``PYTHONPATH`` gains it too, so worker processes — which build
  their ``sys.path`` from the environment they are spawned with —
  can import it;
- ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true`` — protobuf's
  own documented escape hatch — tolerates a one-minor-version skew
  between Spark's gencode (e.g. 6.33) and the found runtime (e.g.
  6.32); the wire format is stable across that gap;
- ``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python`` pins the
  pure-Python implementation (the bundles carry no C extension).

When a SparkSession already exists, its JVM env predates these
settings, so ``enable_protobuf_runtime(spark)`` also injects the
variables into ``sc.environment`` — Python workers are spawned with
the function's captured env vars (the worker-daemon cache is keyed on
them), so later-created workers see the runtime without a JVM
restart.

No file outside the repo is modified; everything is sys.path/env
plumbing against read-only public files.
"""

from __future__ import annotations

import os
import sys

#: Known public pure-Python protobuf runtime bundles, probed in order.
#: Each entry is a directory that directly contains ``google/protobuf``
#: with plain ``google.protobuf`` import paths (NOT the rewritten
#: ``cloudsdk.google.protobuf`` copies, which cannot be aliased in).
CANDIDATE_RUNTIMES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_ENV_VARS = (
    "PYTHONPATH",
    "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK",
    "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
)


def _runtime_importable() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def enable_protobuf_runtime(spark=None) -> bool:
    """Make ``google.protobuf`` importable in the driver and in Spark
    Python workers, returning True on success.

    Idempotent; safe to call before or after SparkSession creation
    (pass ``spark`` to retrofit an already-running session's worker
    environment).

    Setting ``SPARK_GRAFT_FORCE_NO_PROTOBUF=1`` makes discovery report
    failure unconditionally — the deliberate way to exercise every
    caller's ``applyInPandasWithState`` fallback branch on hosts that
    DO carry a runtime, so fallback correctness never silently depends
    on host contents (see
    ``tests/test_streaming.py::test_tws_queries_fall_back_without_protobuf``)."""
    if os.environ.get("SPARK_GRAFT_FORCE_NO_PROTOBUF") == "1":
        return False
    found = _runtime_importable()
    if not found:
        for root in CANDIDATE_RUNTIMES:
            if not os.path.isfile(
                os.path.join(root, "google", "protobuf", "__init__.py")
            ):
                continue
            os.environ.setdefault(
                "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
            )
            os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
            prev = os.environ.get("PYTHONPATH", "")
            if root not in prev.split(os.pathsep):
                os.environ["PYTHONPATH"] = (
                    root + (os.pathsep + prev if prev else "")
                )
            if root not in sys.path:
                sys.path.insert(0, root)
            if _runtime_importable():
                found = True
                break
            # clean up the failed candidate's sys.path entry
            if root in sys.path:
                sys.path.remove(root)
    if found and spark is not None:
        env = spark.sparkContext.environment
        for var in _ENV_VARS:
            if var in os.environ:
                env[var] = os.environ[var]
    return found
