"""Image output (host side): PNG/NPY/EXR export of rendered frames.

The reference displays via swap-chain present and can save screenshots through
DirectXTex (Textures.cpp:483-562 DDS/PNG export) and vendors TinyEXR for HDR;
here LDR film is a numpy array written with PIL and HDR film goes through the
from-scratch EXR codec in render/exr.py.
"""

import numpy as np

from .exr import read_exr, write_exr  # noqa: F401 (re-exported film API)


def to_uint8(img):
    return np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def write_png(path, img):
    from PIL import Image
    Image.fromarray(to_uint8(img)).save(path)


def write_npy(path, img):
    np.save(path, np.asarray(img, np.float32))


def write_image(path, img):
    """Dispatch on extension: .npy (raw f32), .exr (HDR), else PNG (LDR)."""
    path = str(path)
    if path.endswith(".npy"):
        write_npy(path, img)
    elif path.endswith(".exr"):
        write_exr(path, np.asarray(img, np.float32))
    else:
        write_png(path, img)


def rmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))
