"""Multimodal plumbing: schema, actor stages, stubbed decode."""

import pyarrow as pa
import pytest

from ferenda_ray.stages import multimodal as mm


def test_media_table_schema():
    t = mm.make_media_table(5, "image")
    assert t.schema.equals(mm.MEDIA_SCHEMA)
    assert t.num_rows == 5
    # deterministic payloads
    t2 = mm.make_media_table(5, "image")
    assert t.column("payload").to_pylist() == t2.column("payload").to_pylist()


def test_decode_stub_raises_without_fake():
    d = mm.DecodeImage(fake=False)
    with pytest.raises(NotImplementedError):
        d(mm.make_media_table(1))


def test_fake_decode_pipeline(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(mm.make_media_table(6, "image"))
    out = {r["media_id"]: r for r in
           mm.decode_images(ds, fake=True).take_all()}
    assert len(out) == 6
    for r in out.values():
        assert r["decoded"] and len(r["features"]) == 3
        assert all(0 <= f <= 255 for f in r["features"])
    # determinism across runs
    out2 = {r["media_id"]: r["features"] for r in
            mm.decode_images(rd.from_arrow(mm.make_media_table(6, "image")),
                             fake=True).take_all()}
    assert {k: v["features"] for k, v in out.items()} == out2


def test_sample_frames(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(mm.make_media_table(3, "video"))
    rows = mm.sample_frames(ds, n_frames=4).take_all()
    assert len(rows) == 12
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_ms"])
    for mid, offs in by_id.items():
        assert sorted(offs) == offs and len(offs) == 4
        assert all(0 <= o <= 1000 + mid for o in offs)
