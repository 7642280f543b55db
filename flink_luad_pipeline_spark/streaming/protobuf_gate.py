"""Locate a usable ``google.protobuf`` runtime for transformWithState.

The transformWithStateInPandas state-server protocol is protobuf-based
(``pyspark/sql/streaming/proto/StateMessage_pb2.py`` on the driver,
``stateful_processor_api_client`` on every Python worker). This
container has no ``protobuf`` pip package, but ships a pure-Python
protobuf runtime inside the (public) Google Cloud SDK's bundled
App Engine platform — vendoring-by-path is enough, since the runtime
is pure Python.

Two wrinkles handled here:

- the bundled runtime predates the gencode pyspark ships (6.32 vs
  6.33); protobuf's own documented escape hatch
  (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true``) waives the
  strictly-newer-runtime rule. The 6.32↔6.33 wire format for the
  StateMessage schema is unchanged (no new field presence semantics),
  so this is safe for the gated test; a real deployment would
  ``pip install protobuf`` and never enter this code path.
- Python WORKERS import protobuf too, and their environment is
  snapshotted per (exec, envVars) daemon — so the path and the flag
  must reach them via ``sc.environment`` (picked up at the next
  daemon spawn), not just the driver's ``sys.path``.
"""

from __future__ import annotations

import os
import sys

# Public, well-known locations that bundle a pure-Python protobuf
# runtime. Extend as needed; first hit wins.
_VENDOR_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_FLAG = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"


def _importable() -> bool:
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except Exception:
        return False


def ensure_protobuf(spark=None) -> bool:
    """Make ``google.protobuf`` importable on the driver and (via
    worker env) on Python workers. Returns True when usable. Safe to
    call repeatedly; a no-op when protobuf is properly installed."""
    if _importable():
        return True
    for root in _VENDOR_CANDIDATES:
        if not os.path.isdir(os.path.join(root, "google", "protobuf")):
            continue
        os.environ[_FLAG] = "true"
        if root not in sys.path:
            sys.path.insert(0, root)
        # expose to python workers: PYTHONPATH for fresh processes,
        # sc.environment for the worker-daemon spawn path
        pythonpath = os.environ.get("PYTHONPATH", "")
        if root not in pythonpath.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                root + ((os.pathsep + pythonpath) if pythonpath else "")
            )
        if spark is not None:
            env = spark.sparkContext.environment
            wp = env.get("PYTHONPATH", os.environ["PYTHONPATH"])
            if root not in wp.split(os.pathsep):
                wp = root + os.pathsep + wp
            env["PYTHONPATH"] = wp
            env[_FLAG] = "true"
        if _importable():
            return True
    return _importable()
