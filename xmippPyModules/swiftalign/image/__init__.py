from xmippPyModules.swiftalign.image.Path import Path, parse_path
from xmippPyModules.swiftalign.image.read import read, read_data
from xmippPyModules.swiftalign.image.write import write
