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
