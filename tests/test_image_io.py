import os

import numpy as np
import pytest

from xmipp3_tpu.core.image import Image, load_image, save_image


IMGDIR = "image"


def _p(res, name):
    return os.path.join(res, IMGDIR, name)


def test_read_spider_single(reference_resources):
    img = Image(_p(reference_resources, "singleImage.spi"))
    assert img.data.shape == (3, 3)


def test_spider_byteswap(reference_resources):
    a = Image(_p(reference_resources, "singleImage.spi")).data
    b = Image(_p(reference_resources, "singleImage_swap.spi")).data
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_read_mrc_matches_spider(reference_resources):
    a = Image(_p(reference_resources, "singleImage.spi")).data
    m = Image(_p(reference_resources, "singleImage.mrc")).data
    np.testing.assert_allclose(np.squeeze(m), a, atol=1e-4)


def test_read_raw_inf(reference_resources):
    a = Image(_p(reference_resources, "singleImage.spi")).data
    r = Image(_p(reference_resources, "singleImage.raw")).data
    np.testing.assert_allclose(r, a, atol=1e-4)


def test_read_tiff(reference_resources):
    t = Image(_p(reference_resources, "singleImage.tif")).data
    assert t.shape == (3, 3)


def test_read_spider_stack(reference_resources):
    stk = Image.read_stack(_p(reference_resources, "smallStack.stk"))
    assert stk.ndim == 3 and stk.shape[0] >= 2
    sl = Image("1@" + _p(reference_resources, "smallStack.stk")).data
    np.testing.assert_allclose(sl, stk[0])


def test_read_mrcs_stack(reference_resources):
    stk = Image.read_stack(_p(reference_resources, "smallStack.mrcs"))
    spd = Image.read_stack(_p(reference_resources, "smallStack.stk"))
    assert stk.shape == spd.shape
    np.testing.assert_allclose(stk, spd, atol=1e-4)


def test_read_spider_volume(reference_resources):
    vol = Image(_p(reference_resources, "smallVolume.vol")).data
    assert vol.ndim == 3


def test_header_only(reference_resources):
    img = Image()
    img.read(_p(reference_resources, "smallStack.stk"), header_only=True)
    assert img.data is None
    assert img.header.n_images >= 2


def test_mrc_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((8, 16, 16)).astype(np.float32)
    fn = str(tmp_path / "stack.mrcs")
    save_image(fn, data, sampling=1.5)
    img = Image(fn)
    np.testing.assert_allclose(img.data, data, rtol=1e-6)
    assert img.header.sampling == pytest.approx(1.5)
    one = Image(f"3@{fn}").data
    np.testing.assert_allclose(one, data[2], rtol=1e-6)


def test_mrc_volume_roundtrip(tmp_path):
    data = np.arange(4 * 4 * 4, dtype=np.float32).reshape(4, 4, 4)
    fn = str(tmp_path / "vol.mrc")
    save_image(fn, data)
    v = load_image(fn)
    np.testing.assert_allclose(v, data)
    assert v.ndim == 3


def test_spider_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.standard_normal((5, 12, 12)).astype(np.float32)
    fn = str(tmp_path / "stack.stk")
    save_image(fn, data)
    np.testing.assert_allclose(Image.read_stack(fn), data, rtol=1e-6)
    vol = rng.standard_normal((6, 6, 6)).astype(np.float32)
    fnv = str(tmp_path / "v.vol")
    save_image(fnv, vol)
    np.testing.assert_allclose(load_image(fnv), vol, rtol=1e-6)
