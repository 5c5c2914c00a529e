"""The shim's version-validator patch must be NARROW (ADVICE r5 item
3): suppress only the verified same-major, ≤1-minor gencode/runtime
skew; any other mismatch re-raises the runtime's own clear
VersionError instead of failing later with opaque wire errors."""

from __future__ import annotations

import pytest

rv = pytest.importorskip("google.protobuf.runtime_version")


def _shim_active() -> bool:
    return (
        getattr(rv.ValidateProtobufRuntimeVersion, "__name__", "")
        == "_validate_allow_small_minor_skew"
    )


pytestmark = pytest.mark.skipif(
    not _shim_active(),
    reason="real protobuf installed — shim validator not in play",
)


def test_allows_one_minor_ahead():
    # the 6.33-gencode-on-6.32-runtime gap the shim exists for
    rv.ValidateProtobufRuntimeVersion(
        rv.DOMAIN, rv.MAJOR, rv.MINOR + 1, 0, "", "test.proto"
    )


def test_allows_exact_match():
    rv.ValidateProtobufRuntimeVersion(
        rv.DOMAIN, rv.MAJOR, rv.MINOR, rv.PATCH, rv.SUFFIX, "test.proto"
    )


def test_rejects_major_skew():
    with pytest.raises(rv.VersionError):
        rv.ValidateProtobufRuntimeVersion(
            rv.DOMAIN, rv.MAJOR + 1, 0, 0, "", "test.proto"
        )


def test_rejects_wide_minor_skew():
    # two+ minors ahead is outside the verified band → the real
    # validator runs and raises (runtime older than gencode)
    with pytest.raises(rv.VersionError):
        rv.ValidateProtobufRuntimeVersion(
            rv.DOMAIN, rv.MAJOR, rv.MINOR + 2, 0, "", "test.proto"
        )
