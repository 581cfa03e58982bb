"""Spec-based byte fixtures for exotic format READERS.

Round-1 honesty gap: DM3/DM4/SER/PIF/EM were validated only by
write-our-own-read-our-own roundtrips. These tests construct files
byte-by-byte from the PUBLIC format specifications (independent of our
writers) and assert the readers decode them correctly — reader-vs-spec
validation without reference-produced binaries (none are publicly
available)."""
import struct

import numpy as np

from xmipp3_tpu.core.image_formats import read_em, read_ser


class TestEMSpecBytes:
    """EM format (TOM toolbox spec): 512-byte header — byte 0 machine
    code, byte 3 data type, int32 dims at offsets 4/8/12, 80-byte
    comment, 40 int32 params, 256 bytes user data; then raw data."""

    def _build(self, data, machine, endian, tcode):
        nz, ny, nx = data.shape
        hdr = bytearray(512)
        hdr[0] = machine
        hdr[3] = tcode
        struct.pack_into(endian + "3i", hdr, 4, nx, ny, nz)
        hdr[16:16 + 22] = b"spec fixture comment\x00\x00"
        return bytes(hdr) + data.astype(
            data.dtype.newbyteorder(endian)).tobytes()

    def test_little_endian_float32(self, tmp_path):
        rng = np.random.default_rng(0)
        vol = rng.standard_normal((3, 4, 5)).astype(np.float32)
        fn = str(tmp_path / "le.em")
        with open(fn, "wb") as f:
            f.write(self._build(vol, machine=6, endian="<", tcode=5))
        hdr, data = read_em(fn)
        assert data.shape == (3, 4, 5)
        assert np.abs(data - vol).max() < 1e-6

    def test_big_endian_int16(self, tmp_path):
        rng = np.random.default_rng(1)
        vol = rng.integers(-1000, 1000, (2, 6, 7)).astype(np.int16)
        fn = str(tmp_path / "be.em")
        with open(fn, "wb") as f:
            f.write(self._build(vol, machine=0, endian=">", tcode=2))
        hdr, data = read_em(fn)
        assert data.shape == (2, 6, 7)
        assert np.abs(data - vol.astype(np.float32)).max() < 1e-6

    def test_single_slice_byte_data(self, tmp_path):
        vol = np.arange(20, dtype=np.uint8).reshape(1, 4, 5)
        fn = str(tmp_path / "b.em")
        with open(fn, "wb") as f:
            f.write(self._build(vol, machine=6, endian="<", tcode=1))
        hdr, data = read_em(fn)
        assert data.shape == (4, 5)
        assert np.abs(data - vol[0]).max() < 1e-6


class TestSERSpecBytes:
    """FEI TIA .ser (ES Vision series spec): little-endian; file header
    (ByteOrder 0x4949, SeriesID 0x0197, version), DataTypeID/TagTypeID,
    TotalElements/ValidElements, OffsetArrayOffset, NumberDimensions,
    dimension records; element offset array; per-element 2D records:
    CalOffX f64, CalDeltaX f64, CalElemX i32, CalOffY f64, CalDeltaY
    f64, CalElemY i32, DataType i16, ArraySizeX i32, ArraySizeY i32,
    then row-major data."""

    def _element(self, img, dtype_code, np_dtype):
        sy, sx = img.shape
        rec = struct.pack("<ddi", 0.0, 1.0, 0)
        rec += struct.pack("<ddi", 0.0, 1.0, 0)
        rec += struct.pack("<h", dtype_code)
        rec += struct.pack("<2i", sx, sy)
        rec += img.astype(np_dtype).tobytes()
        return rec

    def test_two_image_series_float32(self, tmp_path):
        rng = np.random.default_rng(2)
        imgs = rng.standard_normal((2, 6, 8)).astype(np.float32)
        # version 0x0210 -> 32-bit offsets
        head = struct.pack("<3h", 0x4949, 0x0197, 0x0210)
        head += struct.pack("<4i", 0x4122, 0x4152, 2, 2)
        # dimension record per spec: DimensionSize i32, CalOff f64,
        # CalDelta f64, CalElem i32, DescriptionLength i32 (+0 bytes),
        # UnitsLength i32 (+0 bytes)
        dim = struct.pack("<i", 2) + struct.pack("<2d", 0.0, 1.0)
        dim += struct.pack("<i", 0) + struct.pack("<i", 0)
        dim += struct.pack("<i", 0)
        arr_off = len(head) + 4 + 4 + len(dim)
        elems = [self._element(im, 7, "<f4") for im in imgs]  # 7 = float32
        off0 = arr_off + 2 * 4
        offsets = [off0, off0 + len(elems[0])]
        blob = head + struct.pack("<i", arr_off) + struct.pack("<i", 1)
        blob += dim
        blob += np.asarray(offsets, "<i4").tobytes()
        blob += elems[0] + elems[1]
        fn = str(tmp_path / "series.ser")
        with open(fn, "wb") as f:
            f.write(blob)
        hdr, data = read_ser(fn)
        assert data.shape == (2, 6, 8)
        assert np.abs(data - imgs).max() < 1e-6

    def test_int16_element(self, tmp_path):
        rng = np.random.default_rng(3)
        img = rng.integers(-500, 500, (5, 9)).astype(np.int16)
        head = struct.pack("<3h", 0x4949, 0x0197, 0x0210)
        head += struct.pack("<4i", 0x4122, 0x4152, 1, 1)
        dim = struct.pack("<i", 1) + struct.pack("<2d", 0.0, 1.0)
        dim += struct.pack("<3i", 0, 0, 0)
        arr_off = len(head) + 8 + len(dim)
        blob = head + struct.pack("<2i", arr_off, 1) + dim
        blob += np.asarray([arr_off + 4], "<i4").tobytes()
        blob += self._element(img, 5, "<i2")                  # 5 = int16
        fn = str(tmp_path / "one.ser")
        with open(fn, "wb") as f:
            f.write(blob)
        hdr, data = read_ser(fn)
        assert data.shape == (5, 9)
        assert np.abs(data - img.astype(np.float32)).max() < 1e-6


class TestDM3SpecBytes:
    """Gatan DM3 (public tag-tree spec): big-endian headers (version,
    root length, byte order), nested tag directories (kind 0x14) and data
    tags (kind 0x15 with '%%%%' marker + definition longs), little-endian
    tag data when byteorder == 1."""

    def _data_tag(self, name, defn, payload):
        t = bytes([0x15]) + struct.pack(">h", len(name)) + name.encode()
        t += b"%%%%" + struct.pack(">i", len(defn))
        t += b"".join(struct.pack(">i", d) for d in defn)
        return t + payload

    def _dir_tag(self, name, inner, ntags):
        t = bytes([0x14]) + struct.pack(">h", len(name)) + name.encode()
        t += bytes([1, 0]) + struct.pack(">i", ntags) + inner
        return t

    def test_minimal_image_tree(self, tmp_path):
        from xmipp3_tpu.core.image_formats import read_dm
        rng = np.random.default_rng(4)
        img = rng.standard_normal((5, 6)).astype(np.float32)
        data_tag = self._data_tag(
            "Data", [20, 6, img.size], img.astype("<f4").tobytes())
        dims_inner = (
            self._data_tag("", [3], struct.pack("<i", 6))     # x first
            + self._data_tag("", [3], struct.pack("<i", 5)))
        dims_dir = self._dir_tag("Dimensions", dims_inner, 2)
        imagedata = self._dir_tag("ImageData", data_tag + dims_dir, 2)
        entry = self._dir_tag("", imagedata, 1)               # [0]
        imagelist = self._dir_tag("ImageList", entry, 1)
        root = bytes([1, 0]) + struct.pack(">i", 1) + imagelist
        blob = struct.pack(">3i", 3, len(root), 1) + root
        fn = str(tmp_path / "spec.dm3")
        with open(fn, "wb") as f:
            f.write(blob)
        hdr, data = read_dm(fn)
        assert data.shape == (5, 6)
        assert np.abs(data - img).max() < 1e-6


class TestDM4SpecBytes:
    """Gatan DM4 (public spec): like DM3 but version 4, 64-bit lengths
    (root length, tag-directory counts, definition longs) and an extra
    8-byte total-size field per tag."""

    def _data_tag(self, name, defn, payload):
        inner = b"%%%%" + struct.pack(">q", len(defn))
        inner += b"".join(struct.pack(">q", d) for d in defn)
        inner += payload
        t = bytes([0x15]) + struct.pack(">h", len(name)) + name.encode()
        t += struct.pack(">q", len(inner)) + inner
        return t

    def _dir_tag(self, name, inner, ntags):
        body = bytes([1, 0]) + struct.pack(">q", ntags) + inner
        t = bytes([0x14]) + struct.pack(">h", len(name)) + name.encode()
        t += struct.pack(">q", len(body)) + body
        return t

    def test_minimal_image_tree_64bit(self, tmp_path):
        from xmipp3_tpu.core.image_formats import read_dm
        rng = np.random.default_rng(7)
        img = rng.standard_normal((4, 7)).astype(np.float32)
        data_tag = self._data_tag(
            "Data", [20, 6, img.size], img.astype("<f4").tobytes())
        dims_inner = (
            self._data_tag("", [3], struct.pack("<i", 7))      # x first
            + self._data_tag("", [3], struct.pack("<i", 4)))
        dims_dir = self._dir_tag("Dimensions", dims_inner, 2)
        imagedata = self._dir_tag("ImageData", data_tag + dims_dir, 2)
        entry = self._dir_tag("", imagedata, 1)
        imagelist = self._dir_tag("ImageList", entry, 1)
        root = bytes([1, 0]) + struct.pack(">q", 1) + imagelist
        blob = struct.pack(">i", 4) + struct.pack(">q", len(root))
        blob += struct.pack(">i", 1) + root
        fn = str(tmp_path / "spec.dm4")
        with open(fn, "wb") as f:
            f.write(blob)
        hdr, data = read_dm(fn)
        assert data.shape == (4, 7)
        assert np.abs(data - img).max() < 1e-6


class TestPIFSpecBytes:
    """PIF fixtures constructed byte-by-byte from the documented layout
    (512-byte file header: magic ints (8,8) LE at 0-8, ASCII FLOATSCALE at
    8-24, image count at 24, (htype, nx, ny, nz, mode) at 64-84; one
    512-byte header per image, then the scaled integer/float pixel data) —
    independent of write_pif, so reader and writer cannot share a bug."""

    def _file_header(self, scale, n_imgs, nx, ny, nz, mode):
        hdr = bytearray(512)
        hdr[0:8] = struct.pack("<2i", 8, 8)
        hdr[8:24] = f"{scale:.8g}".encode().ljust(16, b"\x00")
        hdr[24:32] = struct.pack("<2i", n_imgs, 0)
        hdr[64:84] = struct.pack("<5i", 1, nx, ny, nz, mode)
        return bytes(hdr)

    def test_int16_stack_with_floatscale(self, tmp_path):
        from xmipp3_tpu.core.image_formats import read_pif
        vals1 = np.arange(12, dtype="<i2").reshape(3, 4) - 5
        vals2 = (np.arange(12, dtype="<i2").reshape(3, 4) * 3).astype("<i2")
        blob = self._file_header(0.25, 2, 4, 3, 1, 1)
        for v in (vals1, vals2):
            blob += bytes(512) + v.tobytes()
        fn = str(tmp_path / "spec.pif")
        with open(fn, "wb") as f:
            f.write(blob)
        hdr, data = read_pif(fn)
        assert data.shape == (2, 3, 4)
        # FLOATSCALE multiplies the stored integers
        assert np.allclose(data[0], vals1.astype(np.float32) * 0.25)
        assert np.allclose(data[1], vals2.astype(np.float32) * 0.25)
        # idx selection is 1-based
        _, one = read_pif(fn, idx=2)
        assert np.allclose(one, vals2.astype(np.float32) * 0.25)

    def test_float32_volume(self, tmp_path):
        from xmipp3_tpu.core.image_formats import read_pif
        rng = np.random.default_rng(11)
        vol = rng.standard_normal((2, 3, 4)).astype("<f4")
        blob = self._file_header(1.0, 1, 4, 3, 2, 7)
        blob += bytes(512) + vol.tobytes()
        fn = str(tmp_path / "vol.pif")
        with open(fn, "wb") as f:
            f.write(blob)
        hdr, data = read_pif(fn)
        assert data.shape == (2, 3, 4)
        assert np.abs(data - vol).max() < 1e-6

    def test_bad_magic_rejected(self, tmp_path):
        import pytest

        from xmipp3_tpu.core.errors import XmippError
        from xmipp3_tpu.core.image_formats import read_pif
        fn = str(tmp_path / "bad.pif")
        with open(fn, "wb") as f:
            f.write(b"\x00" * 512)
        with pytest.raises(XmippError):
            read_pif(fn)
