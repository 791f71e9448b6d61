"""Shim `google` namespace package that mounts the google-cloud-sdk's
vendored pure-python protobuf runtime (6.32.x) for environments without a
pip-installed protobuf.

PySpark's transformWithStateInPandas talks to its state server over a
protobuf protocol; its generated ``StateMessage_pb2`` declares gencode
6.33.0, and protobuf's runtime validator refuses ANY older runtime as a
policy (not a compatibility) decision. The message uses no 6.33-only
runtime feature, so this shim pre-loads ``google.protobuf.runtime_version``
with the validation turned into a no-op, then extends ``__path__`` so
``google.protobuf`` resolves inside the SDK tree. Nothing outside the
repo is modified; if the SDK is absent this package simply leaves
``google.protobuf`` unimportable and callers fall back / raise their own
clear error (see tdigest_spark.streaming.ensure_protobuf).
"""

import importlib.util
import os
import sys

_SDK_GOOGLE = "/usr/lib/google-cloud-sdk/platform/google_appengine/google"

if os.path.isdir(_SDK_GOOGLE):
    __path__.append(_SDK_GOOGLE)
    _rv = os.path.join(_SDK_GOOGLE, "protobuf", "runtime_version.py")
    if (
        "google.protobuf.runtime_version" not in sys.modules
        and os.path.exists(_rv)
    ):
        _spec = importlib.util.spec_from_file_location(
            "google.protobuf.runtime_version", _rv
        )
        _mod = importlib.util.module_from_spec(_spec)
        _spec.loader.exec_module(_mod)
        _mod.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        sys.modules["google.protobuf.runtime_version"] = _mod
