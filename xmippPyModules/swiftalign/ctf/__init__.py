from xmippPyModules.swiftalign.ctf.compute_ctf_image_2d import \
    compute_ctf_image_2d
from xmippPyModules.swiftalign.ctf.wiener import wiener_2d
