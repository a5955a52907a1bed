"""Host IO pipeline: prefetching loader + async PNG writer.

The reference overlaps loads with 12 DataLoader workers
(/root/reference/attack/DSGN/pgd_attack.py:79) and flags PNG writes as its
dominant non-compute cost (pgd_attack.py:357-374); this framework's
equivalents are `KittiStereoDataset.batches(prefetch=...)` and
`data.dataset.AsyncImageWriter`. These tests pin that the overlapped paths
produce byte-identical results to the synchronous ones.
"""
import os

import numpy as np
import pytest

from eval_driving_safety_tpu.data.dataset import (AsyncImageWriter,
                                                  KittiStereoDataset,
                                                  save_attacked_images)
from eval_driving_safety_tpu.data.kitti import load_image, save_image


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_io")
    rng = np.random.RandomState(7)
    for d in ("image_2", "image_3"):
        os.makedirs(root / d)
    for i in range(7):
        img = rng.rand(48, 160, 3).astype(np.float32)
        save_image(str(root / "image_2" / f"{i:06d}.png"), img)
        save_image(str(root / "image_3" / f"{i:06d}.png"), img * 0.5)
    return root


def _collect(ds, **kw):
    return [[(s.frame_id, s.im_left.sum(), s.im_right.sum())
             for s in chunk] for chunk in ds.batches(2, **kw)]


def test_prefetch_matches_synchronous(image_root):
    ds = KittiStereoDataset(str(image_root))
    sync = _collect(ds, prefetch=0)
    for depth in (1, 2, 4):
        assert _collect(ds, prefetch=depth) == sync
    # drop_remainder drops the trailing odd batch in both paths
    sync_dr = _collect(ds, prefetch=0, drop_remainder=True)
    assert _collect(ds, prefetch=3, drop_remainder=True) == sync_dr
    assert len(sync_dr) == len(sync) - 1


def test_prefetch_abandoned_generator_shuts_down(image_root):
    ds = KittiStereoDataset(str(image_root))
    gen = ds.batches(2, prefetch=2)
    next(gen)
    gen.close()  # must not hang on the executor


def test_async_writer_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    imgs = rng.rand(6, 32, 64, 3).astype(np.float32)
    with AsyncImageWriter(workers=3, compress_level=0) as w:
        for i in range(6):
            w.put(str(tmp_path / f"{i}.png"), imgs[i], crop_hw=(30, 60))
        w.flush()
        for i in range(6):
            got = load_image(str(tmp_path / f"{i}.png"))
            # save_image quantizes by truncation (uint8 cast)
            want = np.floor(imgs[i, :30, :60] * 255) / 255.0
            np.testing.assert_allclose(got, want, atol=1e-6)


def test_async_writer_transform_runs_on_worker(tmp_path):
    img = np.full((8, 8, 3), 0.25, np.float32)
    with AsyncImageWriter(workers=1) as w:
        w.put(str(tmp_path / "t.png"), img, transform=lambda a: a * 2.0)
    got = load_image(str(tmp_path / "t.png"))
    np.testing.assert_allclose(got, 0.5, atol=1 / 255)


def test_async_writer_error_surfaces_at_flush(tmp_path):
    w = AsyncImageWriter(workers=1)
    w.put(str(tmp_path / "bad.png"), np.zeros((4, 4, 3)),
          transform=lambda a: (_ for _ in ()).throw(ValueError("boom")))
    with pytest.raises(ValueError, match="boom"):
        w.flush()


def test_png_store_level_bit_identical(tmp_path):
    """compress_level=0 (the sweep default) must preserve pixels exactly."""
    # smooth gradient: compresses well at level 6, so the size ordering
    # below is unambiguous
    yy, xx = np.mgrid[:40, :80]
    img = np.stack([yy / 40.0, xx / 80.0, (yy + xx) / 120.0],
                   -1).astype(np.float32)
    save_image(str(tmp_path / "l0.png"), img, compress_level=0)
    save_image(str(tmp_path / "l6.png"), img, compress_level=6)
    a = load_image(str(tmp_path / "l0.png"))
    b = load_image(str(tmp_path / "l6.png"))
    np.testing.assert_array_equal(a, b)
    # store really is store: bigger file, same pixels
    assert os.path.getsize(tmp_path / "l0.png") > \
        os.path.getsize(tmp_path / "l6.png")


def test_save_attacked_images_async_matches_sync(tmp_path):
    rng = np.random.RandomState(1)
    batch = {
        "frame_ids": ["000001", "000002"],
        "orig_hw": [(20, 50), (24, 60)],
    }
    advl = rng.rand(2, 32, 64, 3).astype(np.float32)
    advr = rng.rand(2, 32, 64, 3).astype(np.float32)
    ident = lambda x: x
    save_attacked_images(batch, advl, advr, str(tmp_path / "sync"), ident)
    with AsyncImageWriter(workers=2) as w:
        save_attacked_images(batch, advl, advr, str(tmp_path / "async"),
                             ident, writer=w)
    for sub in ("image_2", "image_3"):
        for fid in batch["frame_ids"]:
            a = load_image(str(tmp_path / "sync" / sub / (fid + ".png")))
            b = load_image(str(tmp_path / "async" / sub / (fid + ".png")))
            np.testing.assert_array_equal(a, b)
