"""Multimodal plumbing: binary payload columns + Arrow-batched feature
extraction (real plumbing, stubbed decode per the environment)."""

from __future__ import annotations

import pytest

from emission_project_spark.catalog.tables import load_table
from emission_project_spark.extensions.multimodal import (
    attach_payload,
    decode_image,
    extract_features,
    fake_image_decoder,
    payload_meta,
)


def test_payload_meta(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    meta = payload_meta(attach_payload(docs)).collect()
    assert len(meta) == 20
    assert all(r.n_bytes > 0 and len(r.content_md5) == 32 for r in meta)


def test_extract_features_with_fake_decoder(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    feats = extract_features(attach_payload(docs), decoder=fake_image_decoder, partitions=2)
    rows = feats.collect()
    assert len(rows) == 10
    assert all(r.ok and 1 <= r.width <= 640 and 1 <= r.n_frames <= 16 for r in rows)


def test_extract_features_stub_decoder_flags_not_ok(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(3)
    rows = extract_features(attach_payload(docs)).collect()  # real (stub) decoder
    assert len(rows) == 3
    assert all((not r.ok) and r.width is None for r in rows)


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00")


def test_decode_image_dispatches_to_installed_decoder(monkeypatch):
    """decode_image probes PIL at call time: with a stand-in module
    installed it must decode through it (proving the dispatch), and the
    NotImplementedError fallback only fires when the import fails."""
    import sys
    import types

    from emission_project_spark.extensions import multimodal as mm

    class _FakeImage:
        width, height, n_frames = 320, 240, 5

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake_pil = types.ModuleType("PIL")
    fake_pil_image = types.ModuleType("PIL.Image")
    fake_pil_image.open = lambda buf: _FakeImage()
    fake_pil.Image = fake_pil_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_pil_image)
    assert mm.decode_image(b"\x89PNG") == (320, 240, 5)


def test_extract_features_quarantines_corrupt_payloads(spark, sf_dir):
    """Triage contract: a decoder blowing up on one payload must mark
    that row ok=False, not kill the job (corrupt media is routine at
    corpus scale)."""

    def flaky(payload: bytes):
        if len(payload) % 2 == 0:
            raise ValueError("corrupt image")
        return (10, 10, 1)

    docs = load_table(spark, sf_dir, "documents").limit(8)
    rows = extract_features(attach_payload(docs), decoder=flaky).collect()
    assert len(rows) == 8
    assert {r.ok for r in rows} == {True, False}
    assert all(r.width == 10 for r in rows if r.ok)
    assert all(r.width is None for r in rows if not r.ok)
