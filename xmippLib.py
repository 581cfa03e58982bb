"""xmippLib — compatibility shim for the reference's Python binding.

The reference exposes a C-extension `xmippLib` (bindings/python/
xmippmodule.cpp:1524-1531: types FileName, Image, MDQuery, MetaData, Program,
SymList, FourierProjector + ~60 free functions and MDL_* label constants).
Scripts written against it (applications/scripts/*, the test harness
tests/test.py:174-200 comparators) can import this module unchanged for the
covered surface; label constants are carried as their STAR string names
(scripts treat them opaquely).
"""
from __future__ import annotations

import os as _os

import numpy as _np

from xmipp3_tpu.core.filename import FileName as _FileName
from xmipp3_tpu.core.funcs import compare_two_files
from xmipp3_tpu.core.image import Image as _CoreImage
from xmipp3_tpu.core.metadata import (MetaData as _CoreMetaData,
                                      compare_two_metadata_files)
from xmipp3_tpu.core.labels import LABELS as _LABELS
from xmipp3_tpu.core.sym import SymList as _CoreSymList

# ---------------------------------------------------------------------------
# MDL label constants (string-valued; accepted by MetaData methods)
# ---------------------------------------------------------------------------

def _const_name(label: str) -> str:
    out = ["MDL_"]
    prev_lower = False
    for ch in label:
        if ch.isupper() and prev_lower:
            out.append("_")
        out.append(ch.upper())
        prev_lower = ch.islower()
    return "".join(out).replace("__", "_")


_EXPLICIT = {
    "image": "MDL_IMAGE", "imageRef": "MDL_IMAGE_REF",
    "imageOriginal": "MDL_IMAGE_ORIGINAL", "itemId": "MDL_ITEM_ID",
    "gatherId": "MDL_GATHER_ID", "enabled": "MDL_ENABLED",
    "angleRot": "MDL_ANGLE_ROT", "angleTilt": "MDL_ANGLE_TILT",
    "anglePsi": "MDL_ANGLE_PSI", "shiftX": "MDL_SHIFT_X",
    "shiftY": "MDL_SHIFT_Y", "shiftZ": "MDL_SHIFT_Z", "flip": "MDL_FLIP",
    "ref": "MDL_REF", "ref3d": "MDL_REF3D", "maxCC": "MDL_MAXCC",
    "cost": "MDL_COST", "weight": "MDL_WEIGHT", "xcoor": "MDL_XCOOR",
    "ycoor": "MDL_YCOOR", "zcoor": "MDL_ZCOOR",
    "micrograph": "MDL_MICROGRAPH", "micrographId": "MDL_MICROGRAPH_ID",
    "sampling_rate": "MDL_SAMPLINGRATE", "ctfModel": "MDL_CTF_MODEL",
    "ctfDefocusU": "MDL_CTF_DEFOCUSU", "ctfDefocusV": "MDL_CTF_DEFOCUSV",
    "ctfDefocusAngle": "MDL_CTF_DEFOCUS_ANGLE",
    "ctfVoltage": "MDL_CTF_VOLTAGE", "ctfQ0": "MDL_CTF_Q0",
    "ctfSphericalAberration": "MDL_CTF_CS",
    "ctfSamplingRate": "MDL_CTF_SAMPLING_RATE",
    "classCount": "MDL_CLASS_COUNT", "count": "MDL_COUNT",
    "order_": "MDL_ORDER", "resolutionFreq": "MDL_RESOLUTION_FREQ",
    "resolutionFRC": "MDL_RESOLUTION_FRC",
    "resolutionFreqReal": "MDL_RESOLUTION_FREQREAL",
    "neighbor": "MDL_NEIGHBOR", "symmetry": "MDL_SYMMETRY",
}

_name_to_label = {}
for _label in _LABELS:
    _const = _EXPLICIT.get(_label, _const_name(_label))
    globals()[_const] = _label
    _name_to_label[_const] = _label
MDL_UNDEFINED = ""


def label2Str(label) -> str:
    return str(label)


def str2Label(s: str) -> str:
    return s


def labelType(label):
    from xmipp3_tpu.core.labels import label_type
    return label_type(str(label)).value


def isValidLabel(label) -> bool:
    return str(label) in _LABELS


# ---------------------------------------------------------------------------
# types
# ---------------------------------------------------------------------------

class FileName(str):
    def compose(self, prefix, path=None, ext=None):
        """Reference compose forms: (root, number, ext) -> root000001.ext;
        (number, path) -> 000001@path; (block, path) -> block@path. The
        reference binding mutates in place; str is immutable in Python, so
        the composed name is RETURNED (callers must take the result)."""
        if ext is not None:
            return FileName(f"{prefix}{int(path):06d}.{ext}")
        if path is None:
            return FileName(str(prefix))
        if isinstance(prefix, int):
            return FileName(f"{prefix:06d}@{path}")
        return FileName(f"{prefix}@{path}")

    def isMetaData(self):
        from xmipp3_tpu.core.metadata_program import is_metadata_file
        return is_metadata_file(str(self))

    def exists(self):
        return _FileName(str(self)).exists()

    def getExtension(self):
        return _FileName(str(self)).ext

    def removeBlockName(self):
        return FileName(_FileName(str(self)).path)

    def getBlockName(self):
        return _FileName(str(self)).block or ""

    def isInStack(self):
        return _FileName(str(self)).slice_index is not None


class Image:
    DT_FLOAT = "float32"

    def __init__(self, filename=None):
        self._img = _CoreImage()
        if filename is not None:
            self.read(filename)

    def read(self, filename, header_only=False):
        self._img.read(str(filename), header_only=header_only)
        return self

    def readApplyGeo(self, filename, md=None, objId=None):
        """Read + apply the row's 2-D registration geometry, reference
        readApplyGeo semantics (ops/geo.read_apply_geo; psi/shift/flip
        pulled from the metadata row when given)."""
        self.read(filename)
        if md is None or objId is None:
            return self
        from xmipp3_tpu.ops.geo import read_apply_geo
        row = md.getRow(objId) if hasattr(md, "getRow") else md
        psi = float(row.get("anglePsi", 0.0) or 0.0)
        sx = float(row.get("shiftX", 0.0) or 0.0)
        sy = float(row.get("shiftY", 0.0) or 0.0)
        flip = bool(row.get("flip", False))
        data = _np.asarray(self._img.data, _np.float32)
        out = read_apply_geo(data[None], _np.array([psi]), _np.array([sx]),
                             _np.array([sy]), _np.array([flip]))
        self._img = _CoreImage(_np.asarray(out)[0])
        return self

    def convertPSD(self):
        """In-place xmipp2PSD: 10*log10(1+PSD), centered (reference
        Image convertPSD binding, xmippmodule.cpp:1169-1193 area)."""
        d = _np.asarray(self._img.data, _np.float64)
        d = _np.fft.fftshift(10.0 * _np.log10(1.0 + _np.abs(d)))
        self._img = _CoreImage(d.astype(_np.float32))

    def write(self, filename):
        self._img.write(str(filename))

    def getData(self):
        return self._img.data

    def setData(self, data):
        self._img = _CoreImage(_np.asarray(data, _np.float32))

    def getDimensions(self):
        return self._img.getDimensions()

    def equal(self, other, tolerance=1e-3):
        return self._img.equal(other._img if isinstance(other, Image)
                               else _CoreImage(other), tolerance)

    def computeStats(self):
        d = self._img.data
        return (float(d.mean()), float(d.std()), float(d.min()),
                float(d.max()))

    def getPixel(self, *idx):
        return float(self._img.data[tuple(int(i) for i in idx)])

    def setDataType(self, dt):
        pass

    def resize(self, *dims):
        self._img = _CoreImage(_np.zeros(tuple(int(d) for d in dims[::-1]),
                                         _np.float32))

    def applyCTF(self, ctfparam, Ts, absPhase=False):
        from xmipp3_tpu.ops.ctf import CTFDescription, apply_ctf
        ctf = CTFDescription.from_metadata(str(ctfparam))
        ctf.sampling_rate = Ts
        self._img = _CoreImage(
            _np.asarray(apply_ctf(self._img.data, ctf, absPhase)))

    def __add__(self, other):
        out = Image()
        out.setData(self._img.data + (other._img.data if isinstance(
            other, Image) else other))
        return out

    def inplaceAdd(self, other):
        self.setData(self._img.data + (other._img.data if isinstance(
            other, Image) else other))


class MetaData(_CoreMetaData):
    def __init__(self, filename=None):
        if filename is not None and not isinstance(filename,
                                                   (_CoreMetaData, MetaData)):
            super().__init__(str(filename))
        elif isinstance(filename, _CoreMetaData):
            super().__init__(filename.df)
        else:
            super().__init__()

    def read(self, filename, *a, **kw):  # type: ignore[override]
        return super().read(str(filename))

    def write(self, filename, *a, **kw):  # type: ignore[override]
        return super().write(str(filename))

    def getValue(self, label, objId):
        return super().getValue(str(label), objId)

    def setValue(self, label, value, objId):
        return super().setValue(str(label), value, objId)

    def containsLabel(self, label):
        return super().containsLabel(str(label))

    # -- reference binding surface (tests/test_binding.py contracts) ------
    def __eq__(self, other):
        if not isinstance(other, _CoreMetaData):
            return NotImplemented
        a, b = self.df, other.df
        if sorted(a.columns) != sorted(b.columns) or len(a) != len(b):
            return False
        for col in a.columns:
            x = a[col].to_numpy()
            y = b[col].to_numpy()
            if x.dtype.kind in "fiu" and y.dtype.kind in "fiu":
                if not _np.allclose(x.astype(float), y.astype(float),
                                    rtol=1e-5, atol=1e-6):
                    return False
            elif not all(" ".join(str(u).split()) == " ".join(str(v).split())
                         for u, v in zip(x, y)):
                return False
        return True

    def __ne__(self, other):
        eq = self.__eq__(other)
        return NotImplemented if eq is NotImplemented else not eq

    __hash__ = None

    def importObjects(self, other, query=None):
        """Copy the rows of `other` that satisfy `query` (MDValueEQ etc.)."""
        df = other.df
        if query is not None:
            df = df[query.mask(df)]
        self._df = df.reset_index(drop=True).copy()

    def operate(self, expression: str):
        """In-place column arithmetic, e.g. "angleRot=3*angleRot,
        anglePsi=2*anglePsi" (reference MDSql operate contract)."""
        for stmt in expression.split(","):
            target, expr = (t.strip() for t in stmt.split("=", 1))
            self._df[target] = self._df.eval(expr)

    def joinNatural(self, md1, md2):
        """Natural join on all shared columns (reference joinNatural)."""
        import pandas as pd
        common = [c for c in md1.df.columns if c in md2.df.columns]
        self._df = pd.merge(md1.df, md2.df, on=common).reset_index(drop=True)

    def intersection(self, other, label):
        """Keep rows whose `label` value appears in `other` (in place)."""
        label = str(label)
        keep = self._df[label].isin(set(other.df[label]))
        self._df = self._df[keep].reset_index(drop=True)

    def fillConstant(self, label, value):
        return super().fillConstant(str(label), value)

    def removeLabel(self, label):
        return super().removeLabel(str(label))


def existsBlockInMetaDataFile(path) -> bool:
    """True if "block@file" names an existing block (reference helper)."""
    from xmipp3_tpu.core.filename import as_filename
    fn = as_filename(str(path))
    if fn.block is None:
        return _os.path.exists(fn.path)
    if not _os.path.exists(fn.path):
        return False
    return fn.block in _CoreMetaData.blocksInFile(fn.path)


class MDQuery:
    def __init__(self, expr: str = ""):
        self.expr = expr

    def mask(self, df):
        return df.eval(self.expr)


class MDValueEQ(MDQuery):
    def __init__(self, label, value):
        self.label = str(label)
        self.value = value

    def mask(self, df):
        if self.label not in df.columns:
            import numpy as np
            return _np.zeros(len(df), bool)
        return df[self.label] == self.value


class MDValueRange(MDQuery):
    def __init__(self, label, vmin, vmax):
        self.label = str(label)
        self.vmin, self.vmax = vmin, vmax

    def mask(self, df):
        col = df[self.label]
        return (col >= self.vmin) & (col <= self.vmax)


class SymList:
    def __init__(self, sym: str = "c1"):
        self._s = _CoreSymList(sym)

    def readSymmetryFile(self, sym):
        self._s = _CoreSymList(str(sym))

    def getSymmetryMatrices(self, sym=None):
        s = self._s if sym is None else _CoreSymList(str(sym))
        return [m.tolist() for m in s.sym_matrices()]

    def getTrueSymsNo(self):
        return self._s.true_sym_no

    def computeDistance(self, md, projdir_mode=False, check_mirrors=True,
                        object_rotation=False):
        raise NotImplementedError


class FourierProjector:
    def __init__(self, volume, padding=2.0, max_freq=0.5, spline_degree=1):
        from xmipp3_tpu.ops.project import FourierProjector as _FP
        data = volume.getData() if isinstance(volume, Image) else \
            _np.asarray(volume)
        self._p = _FP(_np.squeeze(data), pad_factor=padding)

    def projectVolume(self, rot, tilt, psi):
        img = Image()
        img.setData(_np.asarray(self._p.project_euler(
            [rot], [tilt], [psi]))[0])
        return img


DT_FLOAT = "float32"
DT_DOUBLE = "float64"
DT_INT = "int32"
DT_UCHAR = "uint8"


def projectVolumeDouble(vol, rot, tilt, psi):
    """Real-space projection (reference projectVolumeDouble binding)."""
    from xmipp3_tpu.ops.project import project_real_space
    data = vol.getData() if isinstance(vol, Image) else _np.asarray(vol)
    img = Image()
    img.setData(_np.asarray(project_real_space(
        _np.squeeze(data).astype(_np.float32), [rot], [tilt], [psi]))[0])
    return img


class Program:
    """Param-DSL access for XmippScript (bindings/python/xmipp_base.py:52)."""

    def __init__(self, runWithoutArgs=False):
        from xmipp3_tpu.core.program import XmippProgram as _P
        self._p = _P()

    def addUsageLine(self, line, verbatim=False):
        self._p.addUsageLine(line, verbatim)

    def addParamsLine(self, line):
        self._p.addParamsLine(line)

    def addExampleLine(self, line, verbatim=True):
        self._p.addExampleLine(line, verbatim)

    def read(self, argv):
        self._p.read(list(argv))

    def checkParam(self, name):
        return self._p.checkParam(name)

    def getParam(self, name, idx=0):
        return self._p.getParam(name, idx)

    def getListParam(self, name):
        return self._p.getListParam(name)


# ---------------------------------------------------------------------------
# free functions (most used by scripts/tests)
# ---------------------------------------------------------------------------

def compareTwoFiles(fn1, fn2, offset=0):
    return compare_two_files(str(fn1), str(fn2), int(offset))


def compareTwoMetadataFiles(fn1, fn2):
    return compare_two_metadata_files(str(fn1), str(fn2))


def compareTwoImageTolerance(fn1, fn2, tolerance=1e-3):
    a = _CoreImage(str(fn1))
    b = _CoreImage(str(fn2))
    return a.equal(b, tolerance)


def getImageSize(filename):
    img = _CoreImage()
    img.read(str(filename), header_only=True)
    n, z, y, x = img.header.shape
    return (x, y, z, n)


def getBlocksInMetaDataFile(filename):
    return _CoreMetaData.blocksInFile(str(filename))


def createEmptyFile(filename, xdim, ydim, zdim=1, ndim=1):
    from xmipp3_tpu.core.image import save_image
    shape = ([ndim] if ndim > 1 else []) + \
        ([zdim] if zdim > 1 else []) + [ydim, xdim]
    save_image(str(filename), _np.zeros(shape, _np.float32))


def activateMathExtensions():
    pass


def Euler_angles2matrix(rot, tilt, psi):
    from xmipp3_tpu.core.geometry import euler_matrix
    return _np.asarray(euler_matrix(rot, tilt, psi))


def Euler_matrix2angles(A):
    from xmipp3_tpu.core.geometry import matrix_to_euler
    return matrix_to_euler(_np.asarray(A))


def Euler_direction(rot, tilt, psi):
    return Euler_angles2matrix(rot, tilt, psi)[2]


def gaussian1D(x, sigma, mu=0.0):
    return _np.exp(-0.5 * ((x - mu) / sigma) ** 2) / (
        sigma * _np.sqrt(2 * _np.pi))


def _ctf_grid(c1, xdim):
    """Full-FFT frequency grid in 1/Å (reference FFT_IDX2DIGFREQ / Tm)."""
    f = _np.fft.fftfreq(xdim) / c1.sampling_rate
    fy, fx = _np.meshgrid(f, f, indexing="ij")
    return fx, fy


def errorBetween2CTFs(md1, md2, Xdim=256, minFreq=0.05, maxFreq=0.25):
    """Sum over the Xdim^2 Fourier grid of |CTF2 - CTF1| (pure, no damping)
    within the [minFreq, maxFreq]/Tm annulus — the reference
    errorBetween2CTFs (data/ctf.cpp:107); golden 5045.79 for the binding
    test's parameter pair at Xdim=256."""
    from xmipp3_tpu.ops.ctf import CTFDescription
    c1 = CTFDescription.from_metadata(md1)
    c2 = CTFDescription.from_metadata(md2)
    fx, fy = _ctf_grid(c1, int(Xdim))
    r = _np.sqrt(fx ** 2 + fy ** 2)
    keep = (r >= minFreq / c1.sampling_rate) & \
           (r <= maxFreq / c1.sampling_rate)
    v1 = _np.asarray(c1.pure_at(fx, fy, damped=False), _np.float64)
    v2 = _np.asarray(c2.pure_at(fx, fy, damped=False), _np.float64)
    return float(_np.abs(v2 - v1)[keep].sum())


def errorMaxFreqCTFs(md1, phaseRad=_np.pi / 2):
    """Resolution (A) where the astigmatic phase difference reaches
    phaseRad: 1/sqrt(phaseRad / (K1 |dfU - dfV|)) (data/ctf.cpp)."""
    from xmipp3_tpu.ops.ctf import CTFDescription
    c1 = CTFDescription.from_metadata(md1)
    K1 = c1.side_info()["K1"]
    # reference DeltafU/V are the NEGATED defoci (readFromMetadataRow)
    return float(1.0 / _np.sqrt(
        phaseRad / (K1 * abs(c1.defocusU - c1.defocusV))))


def errorMaxFreqCTFs2D(md1, md2, Xdim=256, phaseRad=_np.pi / 2):
    """Resolution (A) up to which two CTFs agree in phase within phaseRad:
    the fraction of grid points with |chi1 - chi2| < phaseRad converts to a
    max agreeing frequency (data/ctf.cpp errorMaxFreqCTFs2D)."""
    from xmipp3_tpu.ops.ctf import CTFDescription
    c1 = CTFDescription.from_metadata(md1)
    c2 = CTFDescription.from_metadata(md2)
    fx, fy = _ctf_grid(c1, int(Xdim))
    a1 = _np.asarray(c1.argument_at(fx, fy), _np.float64)
    a2 = _np.asarray(c2.argument_at(fx, fy), _np.float64)
    counter = float((_np.abs(a2 - a1) < phaseRad).sum())
    total = _np.pi * Xdim * Xdim / 4.0
    max_freq_A = 1.0 / (2.0 * c1.sampling_rate)
    res_inv = max_freq_A if counter > total else counter * max_freq_A / total
    return float(1.0 / res_inv)
