from mccnn_tpu.data.bin_io import fromfile, tofile  # noqa: F401
from mccnn_tpu.data.png16 import read_png16, write_png16  # noqa: F401
from mccnn_tpu.data.pfm import write_pfm, read_pfm  # noqa: F401
