"""protobuf availability glue for the Spark-4 ``transformWithStateInPandas``
path.

pyspark's stateful-processor daemon speaks to the JVM over a protobuf
socket protocol (StateMessage.proto), so ``google.protobuf`` must be
importable in the PYTHON SUBPROCESSES Spark spawns.  This container has no
protobuf wheel and no network, but the (public) google-cloud-sdk install
vendors a complete pure-Python protobuf runtime under its appengine
platform directory.

Two distinct concerns, deliberately separated since round 5:

1. **This process** — :func:`enable_protobuf_compat` makes
   ``google.protobuf`` importable here (``sys.path`` only) and applies the
   one-minor version-gate relaxation in-process.  It does NOT touch
   ``os.environ`` any more: the round-4 shape mutated ``PYTHONPATH``
   process-wide, which leaked the ``_pbshim`` sitecustomize into every
   unrelated subprocess the hosting environment spawned (ADVICE r4).
2. **Spark's subprocesses** — the TWS daemon and python workers inherit
   the env of the JVM, which is captured once at gateway launch.  The
   session factory wraps its ``getOrCreate`` in :func:`scoped_pythonpath`
   so the JVM (and only the JVM) captures the vendor paths, then the
   driver env is restored.  A hosting process that created its own
   SparkSession before importing this repo (the driver harness, a
   notebook) has a JVM WITHOUT those paths — :func:`daemon_will_have_protobuf`
   detects that case so callers can fail over to a subprocess job
   (``jobs/tws.py``) whose own JVM launches with the right env.

Discovered empirically in round 4: with the shim, the full
transformWithStateInPandas round-trip (ValueState + MapState, RocksDB
state store, availableNow multi-batch) runs green in this sandbox.
"""

from __future__ import annotations

import contextlib
import os
import sys

# public google-cloud-sdk vendored pure-Python protobuf runtime locations
VENDOR_PATHS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")


def _sys_prepend(path: str) -> None:
    if path not in sys.path:
        sys.path.insert(0, path)


def _vendor_dir() -> str | None:
    for vendor in VENDOR_PATHS:
        if os.path.isdir(os.path.join(vendor, "google", "protobuf")):
            return vendor
    return None


def protobuf_native() -> bool:
    """True when ``google.protobuf`` imports from a real install (not our
    vendor fallback) — the no-op fast path on proper cluster images."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False
    pb_file = getattr(sys.modules["google.protobuf"], "__file__", "") or ""
    return not any(pb_file.startswith(v + os.sep) for v in VENDOR_PATHS)


def pb_env_entries() -> list[str]:
    """PYTHONPATH entries a SUBPROCESS needs for ``google.protobuf`` — the
    vendor runtime plus the version-gate sitecustomize shim.  Empty when a
    real protobuf install is present (nothing to inject)."""
    if protobuf_native():
        return []
    vendor = _vendor_dir()
    if vendor is None:
        return []
    return [vendor, _SHIM_DIR]


@contextlib.contextmanager
def scoped_pythonpath(extra: list[str] | None = None):
    """Temporarily prepend the protobuf vendor entries (plus ``extra``) to
    ``os.environ['PYTHONPATH']``; restore the exact prior value on exit.
    Wrap JVM/gateway launches in this so Spark's subprocess tree inherits
    the paths without leaking them into the hosting process env."""
    entries = list(extra or []) + pb_env_entries()
    prior = os.environ.get("PYTHONPATH")
    parts = (prior or "").split(os.pathsep) if prior else []
    new = [e for e in entries if e not in parts] + parts
    if new:
        os.environ["PYTHONPATH"] = os.pathsep.join(new)
    try:
        yield
    finally:
        if prior is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = prior


def enable_protobuf_compat() -> bool:
    """Make ``google.protobuf`` importable in THIS process (sys.path only);
    returns True when protobuf is (now) available.  Subprocess propagation
    is the session factory's job via :func:`scoped_pythonpath`."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    vendor = _vendor_dir()
    if vendor is None:
        return False
    _sys_prepend(vendor)
    _sys_prepend(_SHIM_DIR)
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False
    # apply the version-gate shim in THIS process too (Spark subprocesses
    # get it via the scoped PYTHONPATH at JVM launch)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_wcs_pbshim", os.path.join(_SHIM_DIR, "sitecustomize.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return True


def daemon_will_have_protobuf(spark) -> bool:
    """True when the TWS daemon spawned by ``spark``'s JVM will be able to
    import ``google.protobuf``: either a real install exists (visible to
    any python), or the JVM's OWN env (captured at gateway launch — the
    env the daemon inherits) carries the vendor + shim paths.  A hosting
    process that launched its JVM before importing this repo returns
    False here; run the job via ``jobs/tws.py`` in a subprocess instead."""
    if protobuf_native():
        return True
    vendor = _vendor_dir()
    if vendor is None:
        return False
    try:
        jvm_pp = spark._jvm.java.lang.System.getenv("PYTHONPATH") or ""
    except Exception:  # pragma: no cover - no JVM reflection available
        return False
    parts = jvm_pp.split(os.pathsep)
    return vendor in parts and _SHIM_DIR in parts


def tws_available() -> bool:
    """True when the transformWithStateInPandas stack can run from this
    process at all: protobuf importable (possibly via the vendor fallback)
    and the stateful-processor API present in this pyspark."""
    if not enable_protobuf_compat():
        return False
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError:
        return False
    return True
