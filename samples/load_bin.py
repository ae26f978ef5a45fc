"""mmap the predict-mode outputs (README's output contract: left/right
cost volumes (1, disp_max, H, W) and disp (1, 1, H, W), raw float32,
NaN at invalid cells). Adjust the shape to your -disp_max and image."""

import numpy as np

D, H, W = 70, 370, 1226

left = np.memmap("../left.bin", dtype=np.float32, shape=(1, D, H, W))
right = np.memmap("../right.bin", dtype=np.float32, shape=(1, D, H, W))
disp = np.memmap("../disp.bin", dtype=np.float32, shape=(1, 1, H, W))
