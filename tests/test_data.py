"""Data pipeline tests: SRPack roundtrip (raw + jpeg), native batched reads,
folder dataset, prepare CLI logic, prefetching iterator."""

import os

import numpy as np
import pytest

from stylerenderer_tpu.data import (
    ImageFolderDataset,
    SRPackDataset,
    SRPackReader,
    SRPackWriter,
    prefetch_batches,
    prepare,
    to_train_tensor,
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(10):
        arr = rng.randint(0, 255, (37 + i, 41, 3), np.uint8)
        Image.fromarray(arr).save(d / f"img_{i:03d}.png")
    (d / "sub").mkdir()
    Image.fromarray(rng.randint(0, 255, (20, 20, 3), np.uint8)).save(
        d / "sub" / "extra.jpg"
    )
    (d / "notes.txt").write_text("not an image")
    return str(d)


def test_srpack_raw_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    sizes = [8, 16]
    imgs = [
        [rng.randint(0, 255, (s, s, 3), np.uint8) for s in sizes] for _ in range(5)
    ]
    w = SRPackWriter(str(tmp_path / "p.srpack"), sizes, "raw")
    for rec in imgs:
        w.add(rec)
    assert w.finalize() == 5

    r = SRPackReader(str(tmp_path / "p.srpack"))
    assert r.n_items == 5
    assert r.sizes == sizes
    np.testing.assert_array_equal(r.decode(8, 2), imgs[2][0])
    np.testing.assert_array_equal(r.decode(16, 4), imgs[4][1])
    batch = r.read_batch_raw(16, np.asarray([0, 3, 1]))
    np.testing.assert_array_equal(batch[0], imgs[0][1])
    np.testing.assert_array_equal(batch[1], imgs[3][1])
    np.testing.assert_array_equal(batch[2], imgs[1][1])
    # out-of-range raises
    with pytest.raises(IndexError):
        r.read_batch_raw(16, np.asarray([99]))
    r.close()


def test_srpack_jpeg_roundtrip(tmp_path):
    from PIL import Image
    import io

    # smooth gradient (JPEG on noise has huge error even at q100)
    g = np.linspace(0, 255, 16)
    img = np.stack(
        [np.add.outer(g, g) / 2, np.tile(g, (16, 1)), np.tile(g[:, None], (1, 16))],
        -1,
    ).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="jpeg", quality=100)
    w = SRPackWriter(str(tmp_path / "j.srpack"), [16], "jpeg")
    w.add([buf.getvalue()])
    w.finalize()
    r = SRPackReader(str(tmp_path / "j.srpack"))
    dec = r.decode(16, 0)
    assert dec.shape == (16, 16, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 10  # lossy


def test_image_folder_dataset(image_dir):
    ds = ImageFolderDataset(image_dir, resolution=16)
    assert len(ds) == 11  # 10 pngs + 1 jpg, txt skipped
    x = ds[0]
    assert x.shape == (16, 16, 3) and x.dtype == np.uint8
    b = ds.read_batch([0, 5])
    assert b.shape == (2, 16, 16, 3)


def test_prepare_and_multires_dataset(image_dir, tmp_path):
    n = prepare(image_dir, str(tmp_path / "data.srpack"), sizes=[8, 16],
                n_workers=1, codec="raw")
    assert n == 11
    ds = SRPackDataset(str(tmp_path / "data.srpack"), resolution=16)
    assert len(ds) == 11
    assert ds[3].shape == (16, 16, 3)
    with pytest.raises(ValueError):
        SRPackDataset(str(tmp_path / "data.srpack"), resolution=64)


def test_prefetch_batches(image_dir, tmp_path):
    prepare(image_dir, str(tmp_path / "d2.srpack"), sizes=[8], n_workers=1)
    ds = SRPackDataset(str(tmp_path / "d2.srpack"), resolution=8)
    it = prefetch_batches(ds, 4, seed=0, train=True)
    batches = [next(it) for _ in range(5)]
    for b in batches:
        assert b.shape == (4, 8, 8, 3)
        assert b.dtype == np.float32
        assert b.min() >= -1.0 and b.max() <= 1.0
    # eval mode terminates after one epoch
    it = prefetch_batches(ds, 4, train=False, drop_last=True)
    n = sum(1 for _ in it)
    assert n == 2  # 11 // 4


def test_to_train_tensor_range():
    x = np.asarray([[[[0, 127, 255]]]], np.uint8)
    t = to_train_tensor(x)
    np.testing.assert_allclose(t.reshape(-1), [-1.0, -0.00392157, 1.0], atol=1e-5)


def test_device_prefetch(image_dir, tmp_path):
    import jax
    from stylerenderer_tpu.data import device_prefetch

    prepare(image_dir, str(tmp_path / "d3.srpack"), sizes=[8], n_workers=1)
    ds = SRPackDataset(str(tmp_path / "d3.srpack"), resolution=8)
    it = device_prefetch(prefetch_batches(ds, 4, seed=0, train=True), depth=2)
    batches = [next(it) for _ in range(3)]
    for b in batches:
        assert isinstance(b, jax.Array)
        assert b.shape == (4, 8, 8, 3)


def test_synth_dataset_roundtrip(tmp_path):
    """data/synth.py: rendered shaded-face shard reads back as valid images
    (the training-demo data source, scripts/train_demo.py)."""
    from stylerenderer_tpu.data.srpack import SRPackReader
    from stylerenderer_tpu.data.synth import write_synth_dataset
    from stylerenderer_tpu.face3d import synthetic_face

    face, tri = synthetic_face(8, 16, 4, 2)
    path = str(tmp_path / "synth.srpack")
    n = write_synth_dataset(path, 6, size=16, batch=4, face=face, tri=tri)
    assert n == 6
    r = SRPackReader(path)
    assert r.n_items == 6
    imgs = r.read_batch_raw(16, np.arange(6))
    assert imgs.shape == (6, 16, 16, 3) and imgs.dtype == np.uint8
    # shaded faces on a solid background: nonzero variance
    assert imgs.std() > 1.0
