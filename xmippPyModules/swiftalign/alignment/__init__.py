from xmippPyModules.swiftalign.alignment.InPlaneTransformCorrector import \
    InPlaneTransformCorrector
