"""Route ``google.protobuf`` to a protobuf runtime already present in
the container when none is pip-installed.

Why this exists: Spark 4's ``transformWithStateInPandas`` runs a
Python state-server whose wire protocol is protobuf
(``pyspark.sql.streaming.proto.StateMessage_pb2``), but this
container's site-packages has no ``google.protobuf``. The publicly
distributed Google Cloud SDK under ``/usr/lib/google-cloud-sdk``
vendors a complete pure-Python protobuf runtime (6.32.0 at last
check) — nothing is copied into this repo; this package only extends
the import path to point at it.

Put THIS directory's parent (``tools/protobuf_shim``) on
``sys.path``/``PYTHONPATH`` ahead of the SDK trees and
``import google.protobuf`` resolves into the vendored runtime while
the SDK's own ``google/__init__.py`` (App Engine bootstrap) never
executes.

The one behavioral patch: pyspark's generated ``*_pb2.py`` files were
emitted by protoc 6.33 and the runtime's
``ValidateProtobufRuntimeVersion`` hard-fails on ANY gencode>runtime
skew. 6.33-gencode on a 6.32 runtime is one minor version apart —
protobuf's wire format and the ``internal.builder`` API used by the
gencode are stable across that gap (verified: serialize/parse
roundtrip plus the full transformWithState parity test in
tests/test_streaming.py pass) — so the check is relaxed to a no-op
HERE, scoped to this shim; an environment with a real protobuf
install never loads this file.

Enabled automatically by tests/conftest.py (and only when
``google.protobuf`` is not otherwise importable); see
wd2duckdb_spark/streaming/transform_state.py for the operator this
unblocks.
"""

import os as _os

_VENDORED = "/usr/lib/google-cloud-sdk/platform/google_appengine/google"
if _os.path.isdir(_os.path.join(_VENDORED, "protobuf")):
    __path__.append(_VENDORED)
    from google.protobuf import runtime_version as _rv

    _orig_validate = _rv.ValidateProtobufRuntimeVersion

    def _validate_allow_small_minor_skew(
        gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
    ):
        """Suppress ONLY the verified-compatible skew: same major,
        gencode minor at most one ahead of the runtime (the 6.33-gencode
        / 6.32-runtime gap this shim exists for). Any other mismatch —
        a major-version jump after a pyspark or Cloud-SDK upgrade —
        re-runs the real validator so it fails with the clear version
        error instead of an opaque wire/builder error later (ADVICE r5
        item 3)."""
        if (
            gen_domain == _rv.DOMAIN
            and gen_major == _rv.MAJOR
            and 0 <= gen_minor - _rv.MINOR <= 1
        ):
            return
        _orig_validate(
            gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
        )

    _rv.ValidateProtobufRuntimeVersion = _validate_allow_small_minor_skew
