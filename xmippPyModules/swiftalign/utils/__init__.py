from xmippPyModules.swiftalign.utils.LruCache import LruCache
from xmippPyModules.swiftalign.utils.progress_bar import progress_bar
