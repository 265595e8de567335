"""EXR codec tests: round-trips over all supported modes, plus a
cross-validation against OpenCV's independent OpenEXR implementation
(reference vendors TinyEXR; Textures.cpp:483-562 is the export path)."""

import os

import numpy as np
import pytest

from dxrpathtracer_tpu.render.exr import read_exr, write_exr
from dxrpathtracer_tpu.render.film import write_image


def _hdr(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((h, w, c)).astype(np.float32) ** 2 * 10.0
    img[0, 0] = 0.0
    img[-1, -1] = 65000.0  # HDR range
    return img


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
@pytest.mark.parametrize("pixel_type", ["float", "half"])
def test_roundtrip(tmp_path, compression, pixel_type):
    img = _hdr(37, 21, 3)  # odd sizes exercise the zip interleave halves
    p = str(tmp_path / f"rt_{compression}_{pixel_type}.exr")
    write_exr(p, img, compression=compression, pixel_type=pixel_type)
    out, names = read_exr(p)
    assert names == ["R", "G", "B"]
    if pixel_type == "float":
        np.testing.assert_array_equal(out, img)
    else:
        np.testing.assert_allclose(out, img.astype(np.float16), rtol=1e-3,
                                   atol=1e-6)


def test_roundtrip_rgba_and_mono(tmp_path):
    rgba = _hdr(16, 16, 4)
    p = str(tmp_path / "rgba.exr")
    write_exr(p, rgba)
    out, names = read_exr(p)
    assert names == ["R", "G", "B", "A"]
    np.testing.assert_array_equal(out, rgba)

    mono = _hdr(9, 33, 1)[..., 0]
    p = str(tmp_path / "y.exr")
    write_exr(p, mono)
    out, names = read_exr(p)
    assert names == ["Y"]
    np.testing.assert_array_equal(out[..., 0], mono)


def test_zip_chunking_tall(tmp_path):
    """ZIP = 16-scanline chunks; 40 rows => 2 full chunks + 8-row tail."""
    img = _hdr(40, 8, 3, seed=3)
    p = str(tmp_path / "tall.exr")
    write_exr(p, img, compression="zip")
    out, _ = read_exr(p)
    np.testing.assert_array_equal(out, img)


def test_write_image_dispatch(tmp_path):
    img = _hdr(8, 8, 3)
    p = str(tmp_path / "x.exr")
    write_image(p, img)
    out, _ = read_exr(p)
    np.testing.assert_array_equal(out, img)


# A real TinyEXR-written file (vendored reference implementation,
# SampleFramework12/v1.02/TinyEXR.cpp compiled standalone): 8x6 RGB, HALF
# channels, ZIP compression, pixels = default_rng(7).standard_normal((6,8,3))*4.
# Pins the ImfZip byte order (reorder THEN delta-predict) against an
# independent implementation without needing an EXR library at test time —
# the previous codec round-tripped internally but wrote files every external
# tool decoded as garbage (ADVICE.md round 2, high).
_TINYEXR_GOLDEN_B64 = (
    "di8xAQIAAABjaGFubmVscwBjaGxpc3QANwAAAEIAAQAAAAAAAAABAAAAAQAAAEcAAQAAAAAAAAAB"
    "AAAAAQAAAFIAAQAAAAAAAAABAAAAAQAAAABjb21wcmVzc2lvbgBjb21wcmVzc2lvbgABAAAAA2Rh"
    "dGFXaW5kb3cAYm94MmkAEAAAAAAAAAAAAAAABwAAAAUAAABkaXNwbGF5V2luZG93AGJveDJpABAA"
    "AAAAAAAAAAAAAAcAAAAFAAAAbGluZU9yZGVyAGxpbmVPcmRlcgABAAAAAHBpeGVsQXNwZWN0UmF0"
    "aW8AZmxvYXQABAAAAAAAgD9zY3JlZW5XaW5kb3dDZW50ZXIAdjJmAAgAAAAAAAAAAAAAAHNjcmVl"
    "bldpbmRvd1dpZHRoAGZsb2F0AAQAAAAAAABBAEEBAAAAAAAAAAAAACsBAAB4AQEgAd/+YwxxVkdV"
    "jHnx/pb6HG5IaniWE8RIUYtrA7cUIrXq2rTYuvAZVX9NgaTLUNkyfEDKaQQlpiu0hC2IRTLKKbhz"
    "GHUqv8ypwPGqLF9zYqvUtrsPglwMUbUvrmKb/Vv0SZWHDPL0vDzyl4Ph0x6WhAuWD+Norj4nBNvZ"
    "Oreuv0Tjg3ThTb9+4pAXQKrHxEyjE9q65Id8/vKQiPWAAwZ6BIKAgNgm8A32iwZ0ju4Mf370kXIC"
    "eY0Ff3R9jncHhnxuh42C/H70jfcCi4IBbI2E+oEEfQCDdgd5Cv//A/iBeXIY/AP2hwl3BwB95JoC"
    "+4B+hW8WAn1//YL0B36D/wxyAIqA/wKD8Qd5B3ASdQYJ/IL4CP5+hP4AhG6PbwMSgfp2jfSHrPWN"
    "QQ=="
)


def test_decode_tinyexr_golden(tmp_path):
    """Decode a file produced by the reference's vendored TinyEXR."""
    import base64
    p = str(tmp_path / "tinyexr_golden.exr")
    with open(p, "wb") as f:
        f.write(base64.b64decode(_TINYEXR_GOLDEN_B64))
    out, names = read_exr(p)
    assert names == ["R", "G", "B"]
    rng = np.random.default_rng(7)
    expect = (rng.standard_normal((6, 8, 3)) * 4).astype(np.float32)
    np.testing.assert_array_equal(out, expect.astype(np.float16).astype(np.float32))


def _cv2_or_skip():
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    cv2 = pytest.importorskip("cv2")
    return cv2


def test_cross_validate_cv2_reads_ours(tmp_path):
    cv2 = _cv2_or_skip()
    img = _hdr(24, 31, 3, seed=1)
    for compression in ("none", "zip", "zips"):
        p = str(tmp_path / f"ours_{compression}.exr")
        write_exr(p, img, compression=compression)
        got = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        if got is None:
            pytest.skip("cv2 built without OpenEXR")
        got = got[:, :, ::-1]  # cv2 returns BGR
        np.testing.assert_array_equal(got, img)


def test_cross_validate_we_read_cv2(tmp_path):
    cv2 = _cv2_or_skip()
    img = _hdr(18, 25, 3, seed=2)
    p = str(tmp_path / "cv2.exr")
    try:
        ok = cv2.imwrite(p, img[:, :, ::-1].copy(),
                         [cv2.IMWRITE_EXR_TYPE, cv2.IMWRITE_EXR_TYPE_FLOAT])
    except cv2.error:
        ok = False
    if not ok:
        pytest.skip("cv2 built without OpenEXR")
    out, names = read_exr(p)
    np.testing.assert_array_equal(out, img)
