"""xmipp_image_operate — arithmetic on images/stacks.

Contract: reference reconstruction/image_operate.{h,cpp} binary/unary op set.
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.errors import ErrCode, XmippError
from xmipp3_tpu.core.image import Image
from xmipp3_tpu.core.metadata_program import XmippMetadataProgram, is_metadata_file

_BINARY = {"plus": np.add, "minus": np.subtract, "mult": np.multiply,
           "divide": np.divide, "min": np.minimum, "max": np.maximum,
           "dot_product": None}
_UNARY = {"sqrt": np.sqrt, "abs": np.abs, "log": np.log, "log10": np.log10,
          "exp": np.exp, "square": np.square, "pow": None, "reset": None,
          "radial_avg": None}


class ProgImageOperate(XmippMetadataProgram):
    name = "xmipp_image_operate"

    def defineProcessParams(self):
        self.addUsageLine("Apply arithmetic operations to images.")
        self.addParamsLine("== Binary operations ==")
        self.addParamsLine("[--plus <file_or_value>]   : Add")
        self.addParamsLine("[--minus <file_or_value>]  : Subtract")
        self.addParamsLine("[--mult <file_or_value>]   : Multiply")
        self.addParamsLine("[--divide <file_or_value>] : Divide")
        self.addParamsLine("[--min <file_or_value>]    : Minimum")
        self.addParamsLine("[--max <file_or_value>]    : Maximum")
        self.addParamsLine("== Unary operations ==")
        self.addParamsLine("[--sqrt]    : Square root")
        self.addParamsLine("[--abs]     : Absolute value")
        self.addParamsLine("[--log]     : Natural log")
        self.addParamsLine("[--log10]   : Log10")
        self.addParamsLine("[--exp]     : Exponential")
        self.addParamsLine("[--square]  : Square")
        self.addParamsLine("[--pow <value=2>] : Power")
        self.addParamsLine("[--reset]   : Set to zero")

    def readProcessParams(self):
        self.op = None
        self.operand = None
        for name in _BINARY:
            if self.checkParam("--" + name):
                self.op = name
                arg = self.getParam("--" + name)
                try:
                    self.operand = float(arg)
                except ValueError:
                    self.operand = Image.read_stack(arg)
                break
        if self.op is None:
            for name in _UNARY:
                if self.checkParam("--" + name):
                    self.op = name
                    if name == "pow":
                        self.operand = self.getDoubleParam("--pow")
                    break
        if self.op is None:
            raise XmippError(ErrCode.ARG_MISSING, "an operation is required")

    def processBatch(self, imgs, rows):
        op = self.op
        if op in _BINARY:
            other = self.operand
            if isinstance(other, np.ndarray):
                o = np.squeeze(other)
                if o.ndim == imgs.ndim - 1:
                    o = o[None]
            else:
                o = other
            with np.errstate(divide="ignore", invalid="ignore"):
                out = _BINARY[op](imgs, o)
            return np.nan_to_num(out, posinf=0.0, neginf=0.0)
        if op == "pow":
            return np.power(imgs, self.operand)
        if op == "reset":
            return np.zeros_like(imgs)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = _UNARY[op](imgs)
        return np.nan_to_num(out, posinf=0.0, neginf=0.0)


PROGRAM = ProgImageOperate
