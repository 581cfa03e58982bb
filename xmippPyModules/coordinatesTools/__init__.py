from xmippPyModules.coordinatesTools.coordinatesTools import (
    readPosCoordsFromFName, writeCoordsListToPosFname)
