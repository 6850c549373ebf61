"""protobuf availability glue for the Spark-4 ``transformWithStateInPandas``
path.

pyspark's stateful-processor daemon speaks to the JVM over a protobuf
socket protocol (StateMessage.proto), so ``google.protobuf`` must be
importable in the PYTHON SUBPROCESSES Spark spawns.  This container has no
protobuf wheel and no network, but the (public) google-cloud-sdk install
vendors a complete pure-Python protobuf runtime under its appengine
platform directory.  :func:`enable_protobuf_compat`:

1. no-ops when ``google.protobuf`` already imports (real cluster images);
2. otherwise prepends (a) the vendored runtime directory and (b) the
   ``_pbshim`` directory (a ``sitecustomize`` relaxing the one-minor-version
   gencode/runtime gate — see its docstring) to BOTH ``sys.path`` and the
   ``PYTHONPATH`` env var, so the daemon and workers inherit them.

It must run BEFORE the JVM gateway launches (the daemon inherits the
driver's env), which is why ``session.get_spark`` calls it first thing.

Discovered empirically this round: with the shim, the full
transformWithStateInPandas round-trip (ValueState + MapState, RocksDB
state store, availableNow multi-batch) runs green in this sandbox —
closing the round-3 "blocked: no protobuf in container" item for real.
"""

from __future__ import annotations

import os
import sys

# public google-cloud-sdk vendored pure-Python protobuf runtime locations
VENDOR_PATHS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")


def _prepend(path: str) -> None:
    if path not in sys.path:
        sys.path.insert(0, path)
    existing = os.environ.get("PYTHONPATH", "")
    if path not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = path + (
            os.pathsep + existing if existing else ""
        )


def enable_protobuf_compat() -> bool:
    """Make ``google.protobuf`` importable in this process and every
    subprocess; returns True when protobuf is (now) available."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    for vendor in VENDOR_PATHS:
        if os.path.isdir(os.path.join(vendor, "google", "protobuf")):
            _prepend(vendor)
            _prepend(_SHIM_DIR)
            try:
                import google.protobuf  # noqa: F401
            except ImportError:
                return False
            # apply the version-gate shim in THIS process too (subprocesses
            # get it via sitecustomize)
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "_wcs_pbshim", os.path.join(_SHIM_DIR, "sitecustomize.py")
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return True
    return False


def tws_available() -> bool:
    """True when the transformWithStateInPandas stack can run here:
    protobuf importable (possibly via the vendor fallback) and the
    stateful-processor API present in this pyspark."""
    if not enable_protobuf_compat():
        return False
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError:
        return False
    return True
