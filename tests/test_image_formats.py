"""Extended image-format codecs (core/image_formats.py): Imagic (against the
reference fixtures), EM, SER, DM3, HDF5, JPEG/PNG."""
import os
import struct

import numpy as np
import pytest

from xmipp3_tpu.core.image import Image


def test_imagic_reference_fixtures(reference_resources):
    d = os.path.join(reference_resources, "image")
    one = Image(os.path.join(d, "singleImage.img"))
    assert np.squeeze(one.data).shape == (3, 3)
    stk = Image(os.path.join(d, "smallStack.img"))
    assert stk.data.shape == (4, 64, 64)
    # n@stack addressing
    s2 = Image("2@" + os.path.join(d, "smallStack.img"))
    np.testing.assert_allclose(np.squeeze(s2.data), stk.data[1])
    # .hed addressing resolves to the same pair
    hed = Image(os.path.join(d, "smallStack.hed"))
    np.testing.assert_allclose(hed.data, stk.data)


def test_imagic_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(5, 16, 16)).astype(np.float32)
    fn = str(tmp_path / "out.img")
    Image(data).write(fn)
    back = Image(fn)
    np.testing.assert_allclose(back.data, data, atol=1e-6)
    hdr = Image()
    hdr.read(fn, header_only=True)
    assert hdr.header.shape == (5, 1, 16, 16)


def test_em_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    for shape in [(24, 20), (6, 12, 10)]:
        data = rng.normal(size=shape).astype(np.float32)
        fn = str(tmp_path / f"v{len(shape)}.em")
        Image(data).write(fn)
        np.testing.assert_allclose(np.squeeze(Image(fn).data), data,
                                   atol=1e-6)


def test_ser_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    data = rng.normal(size=(3, 18, 22)).astype(np.float32)
    fn = str(tmp_path / "series.ser")
    Image(data).write(fn)
    back = Image(fn)
    assert back.data.shape == (3, 18, 22)
    np.testing.assert_allclose(back.data, data, atol=1e-6)


def test_hdf5_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    data = rng.normal(size=(4, 12, 12)).astype(np.float32)
    fn = str(tmp_path / "x.h5")
    Image(data).write(fn)
    np.testing.assert_allclose(Image(fn).data, data, atol=1e-6)


def test_jpeg_png(tmp_path):
    yy, xx = np.mgrid[0:32, 0:32]
    data = (np.sin(xx / 3.0) + np.cos(yy / 5.0)).astype(np.float32)
    for ext in ("png", "jpg"):
        fn = str(tmp_path / f"g.{ext}")
        Image(data).write(fn)
        back = np.squeeze(Image(fn).data)
        assert back.shape == (32, 32)
        # 8-bit quantized, normalized range; structure must correlate
        c = np.corrcoef(back.ravel(), data.ravel())[0, 1]
        assert c > 0.98


def _write_minimal_dm3(fn, img):
    """Hand-build a minimal spec-conforming DM3: root dir with
    ImageList.[0].ImageData.{Data, Dimensions.[0..1]}."""
    ny, nx = img.shape

    def tag_data_simple(name, value, code):
        body = b"%%%%" + struct.pack(">i", 1) + struct.pack(">i", code)
        body += struct.pack("<" + {3: "i", 6: "f"}[code], value)
        return (b"\x15" + struct.pack(">h", len(name)) + name.encode()
                + body)

    def tag_data_array(name, arr):
        body = b"%%%%" + struct.pack(">i", 3)
        body += struct.pack(">3i", 20, 6, arr.size)   # array of float32
        body += arr.astype("<f4").tobytes()
        return (b"\x15" + struct.pack(">h", len(name)) + name.encode()
                + body)

    def tag_dir(name, children):
        inner = b"\x01\x00" + struct.pack(">i", len(children)) \
            + b"".join(children)
        return (b"\x14" + struct.pack(">h", len(name)) + name.encode()
                + inner)

    dims = tag_dir("Dimensions", [tag_data_simple("", nx, 3),
                                  tag_data_simple("", ny, 3)])
    imgdata = tag_dir("ImageData", [tag_data_array("Data", img.ravel()),
                                    dims])
    entry = tag_dir("", [imgdata])
    imglist = tag_dir("ImageList", [entry])
    root = b"\x01\x00" + struct.pack(">i", 1) + imglist
    with open(fn, "wb") as f:
        f.write(struct.pack(">i", 3))
        f.write(struct.pack(">i", len(root)))
        f.write(struct.pack(">i", 1))          # little-endian data
        f.write(root)


def test_dm3_reader(tmp_path):
    rng = np.random.default_rng(4)
    img = rng.normal(size=(14, 10)).astype(np.float32)
    fn = str(tmp_path / "m.dm3")
    _write_minimal_dm3(fn, img)
    back = np.squeeze(Image(fn).data)
    assert back.shape == (14, 10)
    np.testing.assert_allclose(back, img, atol=1e-6)


def test_tiff_compressed_strips(tmp_path):
    """PackBits / LZW / Deflate TIFF strips decode exactly (validated
    against PIL-written files — independent encoder)."""
    PILImage = pytest.importorskip("PIL.Image")
    arr = (np.arange(64 * 48).reshape(48, 64) % 251).astype(np.uint8)
    for comp in ("tiff_lzw", "packbits", "tiff_deflate"):
        p = str(tmp_path / f"c_{comp}.tif")
        PILImage.fromarray(arr).save(p, compression=comp)
        got = np.squeeze(Image(p).data)
        assert np.array_equal(got, arr.astype(np.float32)), comp
