"""Transliteration of the reference Image gtest suites
(applications/tests/function_tests/test_image_main.cpp,
test_image_generic_main.cpp) against the reference's own fixture files
(resources/test/image/): cross-format parity of the same picture, stack
slice addressing, volume-stack dimensions, byte-swap handling, corrupted
file detection, IMAGIC/MRC/TIF/INF write-read roundtrips."""
import numpy as np
import pytest

from xmipp3_tpu.core.errors import XmippError
from xmipp3_tpu.core.image import Image, save_image

REF = "/root/reference/src/xmipp/resources/test/image"


def _load(name):
    return np.squeeze(Image(f"{REF}/{name}").data).astype(np.float32)


def test_single_image_cross_format_parity():
    """The same 3x3 picture stored by the reference in SPIDER, MRC, TIFF,
    IMAGIC and RAW+INF must decode identically (readMRC / writeTIFimage /
    writeIMAGICimage / writeINFimage fixtures)."""
    base = _load("singleImage.spi")
    assert base.shape == (3, 3)
    for ext in ("mrc", "tif", "img", "raw"):
        got = _load(f"singleImage.{ext}")
        assert np.abs(got - base).max() == 0.0, ext


def test_byte_swapped_spider_decodes_identically():
    # readMapSwapFile (test_image_generic_main.cpp:74-82)
    base = _load("singleImage.spi")
    swapped = _load("singleImage_swap.spi")
    assert np.abs(swapped - base).max() == 0.0


def test_stack_slice_addressing_matches_full_read():
    # readImageFromStackMetadata (test_image_main.cpp:126-139)
    full = Image(f"{REF}/smallStack.stk").data
    assert full.shape == (4, 64, 64)
    for n in range(1, 5):
        sl = np.squeeze(Image(f"{n}@{REF}/smallStack.stk").data)
        assert np.array_equal(sl, full[n - 1]), n


def test_volume_stack_dimensions_and_slices():
    # movePointerTo (test_image_main.cpp:386-410): 4 volumes of 4 slices
    vs = Image(f"{REF}/smallVolumeStack.stk")
    assert vs.data.shape == (4, 4, 64, 64)
    x, y, z, n = vs.getDimensions()  # binding order (x, y, z, n)
    assert (n, z, y, x) == (4, 4, 64, 64)
    v2 = np.squeeze(Image(f"2@{REF}/smallVolumeStack.stk").data)
    assert np.array_equal(v2, vs.data[1])


def test_corrupted_stack_is_detected():
    # checkImageFileSize (test_image_main.cpp:412-417)
    Image(f"{REF}/smallVolumeStack.stk")  # sane file reads fine
    with pytest.raises((XmippError, ValueError, OSError)):
        Image(f"{REF}/smallVolumeStackCorrupted.stk")


@pytest.mark.parametrize("ext", ["spi", "mrc", "mrcs", "img", "tif", "raw"])
def test_write_read_roundtrip_per_format(tmp_path, ext):
    # writeIMAGICimage / writeMRCimage / writeTIFimage / writeINFimage
    img = _load("singleImage.spi")
    fn = str(tmp_path / f"rt.{ext}")
    save_image(fn, img)
    back = np.squeeze(Image(fn).data)
    assert np.allclose(back, img, atol=1e-6)


def test_imagic_stack_roundtrip(tmp_path):
    # writeIMAGICstack (test_image_main.cpp:207-218)
    stack = Image(f"{REF}/smallStack.stk").data
    fn = str(tmp_path / "stk.img")
    save_image(fn, stack)
    back = Image(fn).data
    assert back.shape == stack.shape
    assert np.allclose(back, stack, atol=1e-5)


def test_mrc_volume_stack_roundtrip(tmp_path):
    # writeMRCVOLstack (test_image_main.cpp:248-263)
    vs = Image(f"{REF}/smallVolumeStack.stk").data
    fn = str(tmp_path / "vols.mrcs")
    save_image(fn, vs.reshape(-1, 64, 64))
    back = Image(fn).data
    assert np.allclose(back.reshape(vs.shape), vs, atol=1e-5)


def test_tiff_writer_decodes_with_independent_reader(tmp_path):
    """Our TIFF writer must produce files an independent decoder (PIL)
    accepts — guards against reader/writer sharing the same bug."""
    PILImage = pytest.importorskip("PIL.Image")
    img = _load("singleImage.spi")
    stack = np.stack([img, img * 2.0])
    fn = str(tmp_path / "pages.tif")
    save_image(fn, stack)
    pim = PILImage.open(fn)
    pim.seek(0)
    assert np.array_equal(np.array(pim), img)
    pim.seek(1)
    assert np.array_equal(np.array(pim), img * 2.0)


def test_preview_nearest_scaling():
    """readPreview (test_image_main.cpp:333-347): NEAREST scale of
    smallVolume to 32x32 per slice."""
    from xmipp3_tpu.ops.resize import scale_to_size_nearest
    vol = np.squeeze(Image(f"{REF}/smallVolume.vol").data)
    small = np.asarray(scale_to_size_nearest(vol, (vol.shape[0], 32, 32)))
    assert small.shape == (vol.shape[0], 32, 32)
    # nearest-neighbor: every output pixel must be an exact input value
    assert np.isin(small.ravel()[:500], vol.ravel()).all()
