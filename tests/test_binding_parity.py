"""Parity with the reference Python binding test suite
(src/xmipp/tests/test_binding.py) on its own pythoninterface fixtures.
Deviations from the reference are noted inline (FileName.compose returns
instead of mutating — Python str is immutable)."""
import os

import numpy as np
import pytest

import xmippLib
from xmippLib import (FileName, Image, MDValueEQ, MetaData,
                      Euler_angles2matrix, Euler_matrix2angles,
                      existsBlockInMetaDataFile, label2Str)


@pytest.fixture(scope="module")
def pyiface(reference_resources):
    return os.path.join(reference_resources, "pythoninterface")


def test_euler_angles2matrix():
    a = np.array([[0.70710678, 0.70710678, -0.],
                  [-0.70710678, 0.70710678, 0.],
                  [0., 0., 1.]])
    b = np.asarray(Euler_angles2matrix(45., 0., 0.))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_euler_matrix2angles_golden():
    # the reference binding test's golden values for arange(16)[:3,:3]
    A = np.arange(16.0).reshape(4, -1)[:3, :3]
    rot1, tilt1, psi1 = Euler_matrix2angles(A)
    assert rot1 == pytest.approx(48.36646, abs=1e-4)
    assert tilt1 == pytest.approx(32.31153, abs=1e-4)
    assert psi1 == pytest.approx(108.43494, abs=1e-4)
    # integer input must behave the same
    D = [[0, 1, 2], [4, 5, 6], [8, 9, 10]]
    rot1, tilt1, psi1 = Euler_matrix2angles(D)
    assert rot1 == pytest.approx(48.36646, abs=1e-4)


def test_filename_compose():
    # reference compose returns in place; ours returns the new name
    assert str(FileName("").compose("kk", 1, "xmp")) == "kk000001.xmp"
    assert str(FileName("").compose(1, "kk.xmp")) == "000001@kk.xmp"
    assert str(FileName("").compose("jj", "kk.xmp")) == "jj@kk.xmp"


def test_filename_is_in_stack_and_metadata(pyiface):
    assert FileName("1@.xmp").isInStack()
    assert not FileName("1.xmp").isInStack()
    assert not FileName(os.path.join(pyiface, "smallStack.stk")).isMetaData()
    assert FileName(os.path.join(pyiface, "test.xmd")).isMetaData()


def test_image_stats_golden(pyiface):
    """The reference test_Image_computeStatistics golden values on
    1@smallStack.stk (test_binding.py:321)."""
    img = Image("1@" + os.path.join(pyiface, "smallStack.stk"))
    mean, dev, mn, mx = img.computeStats()
    assert mean == pytest.approx(-0.000360, abs=1e-5)
    assert dev == pytest.approx(0.105687, abs=1e-5)
    assert mn == pytest.approx(-0.415921, abs=1e-5)
    assert mx == pytest.approx(0.637052, abs=1e-5)
    assert img.equal(img)


def test_image_read_dimensions(pyiface):
    img = Image(os.path.join(pyiface, "singleImage.spi"))
    x, y, z, n = img.getDimensions()
    assert (x, y) == (3, 3)


def test_metadata_import_objects(pyiface):
    """importObjects with MDValueEQ(ref3d, -1) must reproduce the
    reference's importObject.xmd fixture."""
    md = MetaData(os.path.join(pyiface, "test.xmd"))
    out = MetaData()
    out.importObjects(md, MDValueEQ("ref3d", -1))
    expected = MetaData(os.path.join(pyiface, "importObject.xmd"))
    assert out == expected


def test_metadata_operate():
    md = MetaData()
    for rot, tilt, psi in ((1., 2., 3.), (11., 12., 13.)):
        i = md.addObject()
        md.setValue("angleRot", rot, i)
        md.setValue("angleTilt", tilt, i)
        md.setValue("anglePsi", psi, i)
    md2 = MetaData(md)
    md.operate("angleRot=3*angleRot,anglePsi=2*anglePsi")
    for i in md2:
        md2.setValue("angleRot", md2.getValue("angleRot", i) * 3., i)
        md2.setValue("anglePsi", md2.getValue("anglePsi", i) * 2., i)
    assert md == md2


def test_metadata_join_natural():
    md, md2, mdout = MetaData(), MetaData(), MetaData()
    for i in range(1, 4):
        oid = md.addObject()
        md.setValue("image", f"{i:06d}@proj.stk", oid)
        md.setValue("ctfModel", "CTFs/10.ctfparam", oid)
        md.setValue("count", i * 10, oid)
    for i in range(1, 3):
        oid = md2.addObject()
        md2.setValue("image", f"{i:06d}@proj.stk", oid)
        md2.setValue("ctfModel", "CTFs/10.ctfparam", oid)
        md2.setValue("anglePsi", 1., oid)
    mdout.joinNatural(md, md2)
    assert mdout.size() == 2
    assert mdout.getValue("count", 1) == 20
    assert mdout.getValue("anglePsi", 0) == 1.0


def test_metadata_intersection():
    md, md2 = MetaData(), MetaData()
    for i in range(1, 4):
        oid = md.addObject()
        md.setValue("image", f"{i:06d}@proj.stk", oid)
        md.setValue("count", i * 10, oid)
    for i in range(1, 3):
        oid = md2.addObject()
        md2.setValue("image", f"{i:06d}@proj.stk", oid)
    md.intersection(md2, "image")
    assert md.size() == 2
    assert list(md.getColumn("count")) == [10, 20]


def test_exists_block_in_metadata_file(pyiface):
    path = os.path.join(pyiface, "testBlock.xmd")
    assert existsBlockInMetaDataFile("b2@" + path)
    assert not existsBlockInMetaDataFile("nonexisting@" + path)


def _ctf_md(**kw):
    md = MetaData()
    i = md.addObject()
    for k, v in kw.items():
        md.setValue(k, v, i)
    return md


def test_error_between_2ctfs_golden():
    """Reference golden 5045.79 (test_binding.py:134) — exact match pins
    the full astigmatic CTF forward model."""
    md1 = _ctf_md(ctfSamplingRate=1., ctfVoltage=200., ctfDefocusU=18306.25,
                  ctfDefocusV=16786.47, ctfDefocusAngle=30.1,
                  ctfSphericalAberration=2., ctfQ0=0.07)
    md2 = _ctf_md(ctfSamplingRate=1., ctfVoltage=200., ctfDefocusU=17932.7,
                  ctfDefocusV=16930.3, ctfDefocusAngle=45.,
                  ctfSphericalAberration=2., ctfQ0=0.07)
    e = xmippLib.errorBetween2CTFs(md1, md2, 256, 0.05, 0.25)
    assert e == pytest.approx(5045.79, abs=0.5)


def test_error_max_freq_ctfs_golden():
    md1 = _ctf_md(ctfSamplingRate=2., ctfVoltage=300., ctfDefocusU=6000.,
                  ctfDefocusV=7500., ctfDefocusAngle=45.,
                  ctfSphericalAberration=2., ctfQ0=0.1)
    r = xmippLib.errorMaxFreqCTFs(md1, np.pi / 2.)
    assert r == pytest.approx(7.6852355, abs=1e-2)


def test_error_max_freq_ctfs_2d_golden():
    md1 = _ctf_md(ctfSamplingRate=2., ctfVoltage=300., ctfDefocusU=10000.,
                  ctfDefocusV=5400., ctfDefocusAngle=45.,
                  ctfSphericalAberration=2., ctfQ0=0.1)
    md2 = _ctf_md(ctfSamplingRate=2., ctfVoltage=300., ctfDefocusU=5000.,
                  ctfDefocusV=5000., ctfDefocusAngle=45.,
                  ctfSphericalAberration=2., ctfQ0=0.1)
    r = xmippLib.errorMaxFreqCTFs2D(md1, md2)
    assert r == pytest.approx(13.921659, abs=1e-2)


def test_project_volume_double(pyiface):
    """projectVolumeDouble + FourierProjector on the reference progVol.vol:
    the (0,0,0) projection equals the volume's z-sum."""
    vol = Image(os.path.join(pyiface, "progVol.vol"))
    proj = xmippLib.projectVolumeDouble(vol, 0., 0., 0.)
    zsum = np.squeeze(vol.getData()).sum(axis=0)
    got = np.squeeze(proj.getData())
    assert np.corrcoef(got.ravel(), zsum.ravel())[0, 1] > 0.999
    fp = xmippLib.FourierProjector(vol, 2.0, 0.5, 1)
    fproj = np.squeeze(fp.projectVolume(0., 0., 0.).getData())
    assert np.corrcoef(fproj.ravel(), zsum.ravel())[0, 1] > 0.99
