"""Auto-imported (via PYTHONPATH) in every Python subprocess Spark spawns
— workers and the transformWithState driver daemon.  Relaxes protobuf's
strict gencode<=runtime version gate: this container has no installed
protobuf, so :mod:`web_crawler_spark.streaming.pbcompat` falls back to the
pure-Python runtime vendored by the (public) google-cloud-sdk, whose
version (6.32) trails the gencode version pyspark 4.1.2 ships for
StateMessage.proto (6.33) by one minor release.  The proto uses no
6.33-only feature; without the shim the daemon refuses to start on the
version check alone.  On any host with a real protobuf install this file
is never put on PYTHONPATH (pbcompat's fast path) and nothing changes."""

# Python imports only the FIRST sitecustomize on sys.path, so being first
# would silently shadow any host-level sitecustomize.  Chain-import the next
# one (if any) so host customizations still run (ADVICE r4).
try:
    import os as _os
    import sys as _sys

    _here = _os.path.dirname(_os.path.abspath(__file__))
    for _p in _sys.path:
        if not _p or _os.path.abspath(_p) == _here:
            continue
        _cand = _os.path.join(_p, "sitecustomize.py")
        if _os.path.isfile(_cand):
            import importlib.util as _ilu

            _spec = _ilu.spec_from_file_location("_wcs_chained_sitecustomize", _cand)
            _mod = _ilu.module_from_spec(_spec)
            _spec.loader.exec_module(_mod)
            break
except Exception:  # pragma: no cover - chaining is best-effort
    pass

try:
    from google.protobuf import runtime_version as _rv

    _orig = _rv.ValidateProtobufRuntimeVersion

    def _lenient(*args, **kwargs):
        try:
            _orig(*args, **kwargs)
        except _rv.VersionError:
            pass

    _rv.ValidateProtobufRuntimeVersion = _lenient
except Exception:  # pragma: no cover - no protobuf at all; nothing to relax
    pass
