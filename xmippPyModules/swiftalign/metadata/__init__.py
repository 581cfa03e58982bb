from xmippPyModules.swiftalign.metadata.labels import *  # noqa: F401,F403
from xmippPyModules.swiftalign.metadata.read import read
from xmippPyModules.swiftalign.metadata.utils import sort_by_image_filename
from xmippPyModules.swiftalign.metadata.write import write
