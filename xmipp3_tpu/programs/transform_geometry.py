"""xmipp_transform_geometry — rotate/shift/scale/flip images and volumes.

Contract: reference data/transform_geometry.{h,cpp} (grammar mirrored from its
defineParams; "--rotate: positive angle is a clockwise rotation").
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.geometry import euler_matrix
from xmipp3_tpu.core.metadata_program import XmippMetadataProgram
from xmipp3_tpu.ops.geo import (apply_affine_2d, apply_affine_3d,
                                alignment_matrices_2d)


class ProgTransformGeometry(XmippMetadataProgram):
    name = "xmipp_transform_geometry"
    apply_geo = True

    def defineProcessParams(self):
        self.addUsageLine("Apply geometric transformations to images/volumes.")
        self.addParamsLine("== Transformations ==")
        self.addParamsLine("[--rotate <ang=0>]   : Inplane rotation in 2D images (positive=clockwise)")
        self.addParamsLine("[--rotate_volume <rotation_type>] : Rotation of volumes")
        self.addParamsLine("         where <rotation_type>")
        self.addParamsLine("             euler <rot> <tilt> <psi>  : ZYZ Euler rotation")
        self.addParamsLine("             axis <ang> <x=0> <y=0> <z=1> : Rotate around axis")
        self.addParamsLine("[--scale <factor=1>]   : Scaling factor")
        self.addParamsLine(" alias -s;")
        self.addParamsLine("[--shift <x=0> <y=0> <z=0>] : Shift by x, y, z")
        self.addParamsLine("[--flip]               : Flip images (2D)")
        self.addParamsLine("[--interp <interpolation_type=spline>] : Interpolation")
        self.addParamsLine("      where <interpolation_type>")
        self.addParamsLine("        spline : cubic B-spline")
        self.addParamsLine("        linear : bilinear/trilinear")
        self.addParamsLine("[--inverse]            : Apply inverse transformation")
        self.addParamsLine("[--dont_wrap]          : Do not wrap around borders")

    def readProcessParams(self):
        self.ang = self.getDoubleParam("--rotate") if self.checkParam("--rotate") else 0.0
        self.scale = self.getDoubleParam("--scale") if self.checkParam("--scale") else 1.0
        if self.checkParam("--shift"):
            self.shift = [self.getDoubleParam("--shift", i) for i in range(3)]
        else:
            self.shift = [0.0, 0.0, 0.0]
        self.flip = self.checkParam("--flip")
        self.order = 3 if (not self.checkParam("--interp") or
                           self.getParam("--interp") == "spline") else 1
        self.inverse = self.checkParam("--inverse")
        self.wrap = not self.checkParam("--dont_wrap")
        self.rotate_volume = (self.getListParam("--rotate_volume")
                              if self.checkParam("--rotate_volume") else None)

    def _volume_matrix(self):
        toks = self.rotate_volume
        if toks[0] == "euler":
            return np.asarray(euler_matrix(*[float(t) for t in toks[1:4]]))
        if toks[0] == "axis":
            ang = np.deg2rad(float(toks[1]))
            axis = np.array([float(t) for t in toks[2:5]], np.float64)
            axis = axis / np.linalg.norm(axis)
            K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                          [-axis[1], axis[0], 0]])
            return (np.eye(3) + np.sin(ang) * K +
                    (1 - np.cos(ang)) * (K @ K)).astype(np.float32)
        raise ValueError(toks[0])

    def processBatch(self, imgs, rows):
        B = imgs.shape[0]
        if imgs.ndim == 4 or (self.rotate_volume is not None):
            # volume path
            M = self._volume_matrix() if self.rotate_volume else np.eye(3)
            if self.inverse:
                M = np.linalg.inv(M)
            out = [np.asarray(apply_affine_3d(v, M[None], wrap=self.wrap))[0]
                   for v in imgs]
            return np.stack(out)
        # 2D path: note CLI "positive=clockwise" maps to -ang in our
        # math convention (apply_alignment rotates CCW for positive psi)
        ang = np.full(B, -self.ang, np.float32)
        A = np.asarray(alignment_matrices_2d(
            ang, np.full(B, self.shift[0], np.float32),
            np.full(B, self.shift[1], np.float32),
            flip=np.full(B, self.flip) if self.flip else None,
            scale=np.full(B, self.scale, np.float32)))
        if self.inverse:
            A = np.linalg.inv(A)
        return np.asarray(apply_affine_2d(imgs, A, order=self.order,
                                          wrap=self.wrap))


PROGRAM = ProgTransformGeometry
