"""DDS/BC decoder tests: hand-built blocks with known texels, real reference
content (SunTemple BC4U opacity trees, 1x1 defaults, DFG LUT), and
cross-validation against Pillow's independent S3TC decoder where available."""

import struct
from pathlib import Path

import numpy as np
import pytest

from dxrpathtracer_tpu.scene.dds import load_dds

REF = Path("/root/reference/Content")


def _dds_bytes(width, height, fourcc=None, payload=b"", bit_count=0,
               masks=(0, 0, 0, 0), pf_flags=None):
    if fourcc is not None:
        pf = struct.pack("<2I4s5I", 32, 0x4, fourcc, 0, 0, 0, 0, 0)
    else:
        pf = struct.pack("<2I4s5I", 32, pf_flags, b"\0\0\0\0", bit_count, *masks)
    header = struct.pack("<4s7I", b"DDS ", 124, 0x1007, height, width, 0, 0, 1)
    header += b"\0" * 44 + pf + struct.pack("<5I", 0x1000, 0, 0, 0, 0)
    return header + payload


def test_bc1_four_color_block(tmp_path):
    # c0 = pure red (0xF800), c1 = pure blue (0x001F), c0 > c1 -> 4-color mode
    # indices: texel i uses palette entry i % 4
    bits = sum((i % 4) << (2 * i) for i in range(16))
    block = struct.pack("<HHI", 0xF800, 0x001F, bits)
    p = tmp_path / "bc1.dds"
    p.write_bytes(_dds_bytes(4, 4, fourcc=b"DXT1", payload=block))
    img = load_dds(p).data
    assert img.shape == (4, 4, 4)
    flat = img.reshape(16, 4)
    np.testing.assert_allclose(flat[0], [1, 0, 0, 1], atol=1e-6)   # c0
    np.testing.assert_allclose(flat[1], [0, 0, 1, 1], atol=1e-6)   # c1
    np.testing.assert_allclose(flat[2], [2 / 3, 0, 1 / 3, 1], atol=1e-6)
    np.testing.assert_allclose(flat[3], [1 / 3, 0, 2 / 3, 1], atol=1e-6)


def test_bc1_three_color_transparent(tmp_path):
    # c0 <= c1 -> 3-color mode; index 3 = transparent black
    bits = sum(3 << (2 * i) for i in range(16))
    block = struct.pack("<HHI", 0x001F, 0xF800, bits)
    p = tmp_path / "bc1t.dds"
    p.write_bytes(_dds_bytes(4, 4, fourcc=b"DXT1", payload=block))
    img = load_dds(p).data
    np.testing.assert_allclose(img, 0.0, atol=1e-6)  # all transparent black


def test_bc4_eight_point_ramp(tmp_path):
    # r0=255 > r1=0 -> 8-point palette; texel i uses entry i % 8
    bits = sum((i % 8) << (3 * i) for i in range(16))
    block = struct.pack("<BB", 255, 0) + bits.to_bytes(6, "little")
    p = tmp_path / "bc4.dds"
    p.write_bytes(_dds_bytes(4, 4, fourcc=b"BC4U", payload=block))
    img = load_dds(p).data
    assert img.shape == (4, 4, 1)
    flat = img.reshape(16)
    expect = [1.0, 0.0] + [(8 - i) / 7.0 for i in range(2, 8)]
    np.testing.assert_allclose(flat[:8], expect, atol=1e-6)
    # 6-point mode: r0 < r1, entries 6/7 are the 0/1 extremes
    block = struct.pack("<BB", 0, 255) + bits.to_bytes(6, "little")
    p.write_bytes(_dds_bytes(4, 4, fourcc=b"BC4U", payload=block))
    flat = load_dds(p).data.reshape(16)
    assert flat[6] == 0.0 and flat[7] == 1.0


def test_bc3_alpha_and_bc5(tmp_path):
    # BC3 = BC4 alpha + BC1 color (forced 4-color); BC5 = 2x BC4
    abits = sum(0 << (3 * i) for i in range(16))
    ablock = struct.pack("<BB", 128, 0) + abits.to_bytes(6, "little")
    cbits = 0
    cblock = struct.pack("<HHI", 0x07E0, 0x07E0, cbits)  # pure green
    p = tmp_path / "bc3.dds"
    p.write_bytes(_dds_bytes(4, 4, fourcc=b"DXT5", payload=ablock + cblock))
    img = load_dds(p).data
    np.testing.assert_allclose(img[..., 3], 128 / 255.0, atol=1e-6)
    np.testing.assert_allclose(img[..., 1], 1.0, atol=1e-6)

    p = tmp_path / "bc5.dds"
    p.write_bytes(_dds_bytes(4, 4, fourcc=b"ATI2", payload=ablock + ablock))
    img = load_dds(p).data
    assert img.shape == (4, 4, 2)
    np.testing.assert_allclose(img, 128 / 255.0, atol=1e-6)


def test_uncompressed_masked_rgba(tmp_path):
    px = np.arange(16, dtype=np.uint32)
    payload = (px | (px << 8) | (px << 16) | (0xFF << 24)).astype("<u4").tobytes()
    p = tmp_path / "rgba.dds"
    p.write_bytes(_dds_bytes(4, 4, payload=payload, bit_count=32,
                             masks=(0xFF, 0xFF00, 0xFF0000, 0xFF000000),
                             pf_flags=0x41))
    img = load_dds(p).data
    assert img.shape == (4, 4, 4)
    np.testing.assert_allclose(img.reshape(16, 4)[:, 0],
                               np.arange(16) / 255.0, atol=1e-6)
    np.testing.assert_allclose(img[..., 3], 1.0)


def test_partial_edge_blocks(tmp_path):
    """6x3 BC4: 2x1 blocks, image cropped from the 8x4 block grid."""
    bits = sum(0 << (3 * i) for i in range(16))
    block = struct.pack("<BB", 200, 0) + bits.to_bytes(6, "little")
    p = tmp_path / "edge.dds"
    p.write_bytes(_dds_bytes(6, 3, fourcc=b"BC4U", payload=block * 2))
    img = load_dds(p).data
    assert img.shape == (3, 6, 1)
    np.testing.assert_allclose(img, 200 / 255.0, atol=1e-6)


# ---------------------------------------------------------------------------
# real reference content

@pytest.mark.skipif(not REF.exists(), reason="reference content absent")
def test_reference_defaults():
    img = load_dds(REF / "Textures/DefaultBaseColor.dds").data
    assert img.shape[0] == 1 and img.shape[1] == 1
    np.testing.assert_allclose(img[0, 0, :3], 192 / 255.0, atol=1e-6)
    img = load_dds(REF / "Textures/DefaultNormalMap.dds").data
    np.testing.assert_allclose(img[0, 0, 2], 1.0, atol=1e-2)
    img = load_dds(REF / "Textures/DefaultRoughness.dds").data
    np.testing.assert_allclose(img[0, 0, 0], 64 / 255.0, atol=1e-6)


@pytest.mark.skipif(not REF.exists(), reason="reference content absent")
def test_reference_dfg_lut():
    im = load_dds(REF / "Textures/DFG.dds")
    assert im.format_name == "DXGI_16"  # R32G32_FLOAT
    assert im.data.shape == (64, 64, 2)
    assert np.isfinite(im.data).all()
    assert 0.0 <= im.data.min() and im.data.max() <= 1.5


@pytest.mark.skipif(not (REF / "Models/SunTemple/Textures").exists(),
                    reason="SunTemple textures absent")
def test_suntemple_bc4_opacity():
    """The SunTemple tree opacity maps decode to a sane alpha distribution:
    finite, [0,1], bimodal-ish (mostly opaque foliage on transparent bg)."""
    p = REF / "Models/SunTemple/Textures/T_M_Tree_Branches_0_A.dds"
    im = load_dds(p)
    a = im.data[..., 0]
    assert a.shape == (1024, 1024)
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0
    assert a.max() > 0.9 and a.min() < 0.1  # real coverage mask, not constant
    frac_opaque = (a > 0.35).mean()  # alpha-test threshold RayTrace.hlsl:497
    assert 0.05 < frac_opaque < 0.95


def test_cross_validate_pillow(tmp_path):
    """Pillow ships an independent S3TC decoder; random BC1/BC3 blocks must
    decode identically (up to its 8-bit quantization)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(7)
    payload = rng.integers(0, 256, size=(64 // 4) * (64 // 4) * 16,
                           dtype=np.uint8).tobytes()
    for cc, mode in ((b"DXT1", 8), (b"DXT5", 16)):
        raw = payload[:16 * 16 * mode]
        p = tmp_path / f"x_{cc.decode()}.dds"
        p.write_bytes(_dds_bytes(64, 64, fourcc=cc, payload=raw))
        ours = load_dds(p).data
        try:
            theirs = np.asarray(PIL_Image.open(p).convert("RGBA"),
                                np.float32) / 255.0
        except Exception:
            pytest.skip("Pillow lacks DDS support")
        np.testing.assert_allclose(ours, theirs, atol=1.5 / 255.0)
