"""Program registry: every CLI endpoint maps to its implementing module.

Grows toward the full 209-program surface of SURVEY.md Appendix A.
"""
from xmipp3_tpu.programs import register

# phase-2 slice
# (populated as programs land)
