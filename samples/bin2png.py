#!/usr/bin/env python
"""Visualize predict-mode outputs (the reference's samples/bin2png.lua):
WTA-argmin the two cost volumes and scale the disparity map to PNG."""

import numpy as np
from PIL import Image

D, H, W = 70, 370, 1226


def save(name, arr):
    img = np.clip(arr / D, 0, 1)
    Image.fromarray((img * 255).astype(np.uint8)).save(name)
    print(f"Writing {name}")


left = np.fromfile("left.bin", np.float32).reshape(D, H, W)
right = np.fromfile("right.bin", np.float32).reshape(D, H, W)
disp = np.fromfile("disp.bin", np.float32).reshape(H, W)

save("left.png", np.nanargmin(np.where(np.isnan(left), np.inf, left), 0) + 1.0)
save("right.png", np.nanargmin(np.where(np.isnan(right), np.inf, right), 0) + 1.0)
save("disp.png", disp)
