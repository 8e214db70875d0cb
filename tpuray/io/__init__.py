from tpuray.io.obj import load_obj, transform_matrix  # noqa: F401
from tpuray.io.hdr import read_hdr, write_hdr  # noqa: F401
from tpuray.io.image import read_bmp, write_bmp  # noqa: F401
