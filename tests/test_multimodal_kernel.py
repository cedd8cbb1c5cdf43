"""Import-gated real image kernel (round-4 verdict task 8): when PIL is
importable the SAME mapInPandas contract must run real decode; in this
codec-less container the deterministic fake keeps the plumbing tested.
The skipif-gated test keeps the env-stub honest if a future container
ships codecs — it will then actually execute."""
from __future__ import annotations

import sys
import types

import pytest
from pyspark.sql import functions as F

from document_ai_spark.operators.multimodal import (
    FEATURE_TYPE,
    extract_features,
    fake_features,
    pil_features,
    resolve_feature_kernel,
)


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def test_kernel_resolution_gates_on_import(monkeypatch):
    """resolve_feature_kernel: real kernel iff PIL imports — simulated
    both ways so the gate logic is tested even without codecs."""
    if not _pil_available():
        assert resolve_feature_kernel() is fake_features
        # simulate a codec-equipped executor
        pil = types.ModuleType("PIL")
        pil_image = types.ModuleType("PIL.Image")
        pil.Image = pil_image
        monkeypatch.setitem(sys.modules, "PIL", pil)
        monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)
        assert resolve_feature_kernel() is pil_features
    else:
        assert resolve_feature_kernel() is pil_features


def _media_df(spark, payloads):
    return spark.createDataFrame(
        [(f"m{i}", "image/png", p) for i, p in enumerate(payloads)],
        "media_ref string, mime string, payload binary")


def test_custom_kernel_same_contract(spark):
    """Any kernel with the (bytes) -> (mean, std) signature runs through
    the identical mapInPandas contract and yields the identical schema —
    the property that makes the PIL swap a zero-code-change event."""
    df = _media_df(spark, [b"\x00\x10\x20", b""])
    fake = extract_features(df, kernel=fake_features)

    def custom(data: bytes):
        return (float(len(data)), 0.5)

    real_like = extract_features(df, kernel=custom)
    assert fake.schema == real_like.schema == FEATURE_TYPE
    rows = {r["media_ref"]: r for r in real_like.collect()}
    assert rows["m0"]["feat_mean"] == 3.0
    # md5 side-channel identical regardless of kernel
    frows = {r["media_ref"]: r for r in fake.collect()}
    assert rows["m0"]["feat_hash"] == frows["m0"]["feat_hash"]


@pytest.mark.skipif(not _pil_available(),
                    reason="image codecs not shipped in this container; "
                           "test activates on a codec-equipped cluster")
def test_pil_kernel_real_decode_parity(spark):
    """With codecs present: the resolver picks the PIL kernel, a real
    PNG decodes, and the output schema/row-shape equals the fake path's
    (values differ — pixels, not bytes — by design)."""
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("L", (4, 4), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    df = _media_df(spark, [png])
    out = extract_features(df).collect()          # resolver path
    assert len(out) == 1
    r = out[0]
    assert r["feat_mean"] == 128.0 and r["feat_std"] == 0.0
    fake_out = extract_features(df, kernel=fake_features).collect()[0]
    assert r.asDict().keys() == fake_out.asDict().keys()
    assert r["feat_hash"] == fake_out["feat_hash"]
