from xmippPyModules.swiftalign.fourier.rfftnfreq import rfftnfreq
from xmippPyModules.swiftalign.fourier.zero_pad import zero_pad
