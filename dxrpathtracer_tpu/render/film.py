"""Image output (host side): PNG/NPY export of rendered frames.

The reference displays via swap-chain present and can save screenshots through
DirectXTex (Textures.cpp:483-562 DDS/PNG export); here the film is just a numpy
array written with PIL.
"""

import numpy as np


def to_uint8(img):
    return np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def write_png(path, img):
    from PIL import Image
    Image.fromarray(to_uint8(img)).save(path)


def write_npy(path, img):
    np.save(path, np.asarray(img, np.float32))


def rmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))
