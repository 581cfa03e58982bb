from xmipp3_tpu.core.errors import ErrCode, XmippError
from xmipp3_tpu.core.filename import FileName, as_filename
from xmipp3_tpu.core.metadata import MetaData, Row, compare_two_metadata_files
from xmipp3_tpu.core.image import Image, load_image, save_image

__all__ = [
    "ErrCode", "XmippError", "FileName", "as_filename",
    "MetaData", "Row", "compare_two_metadata_files",
    "Image", "load_image", "save_image",
]
