#!/usr/bin/env python3
"""Extract published scientific datasets needed by the sky model into an .npz.

Sources (numeric data only, no code):
  - Hosek & Wilkie sky/solar model coefficient datasets (BSD-licensed research
    data from "An Analytic Model for Full Spectral Sky-Dome Radiance" [2012]
    and "Adding a Solar Radiance Function to the Hosek Skylight Model" [2013],
    http://cgg.mff.cuni.cz/projects/SkylightModelling/), as vendored under
    /root/reference/SampleFramework12/v1.02/HosekSky/.
  - CIE 1931 2-degree standard observer curves and the Smits-style RGB->spectrum
    basis functions (public data, as tabulated in PBRT), vendored in
    Graphics/Spectrum.cpp.

Output: dxrpathtracer_tpu/sky/data/hosek_data.npz
Run once at build time; the .npz is committed so the framework has no runtime
dependency on the reference checkout.
"""

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/SampleFramework12/v1.02")
OUT = Path(__file__).resolve().parent.parent / "dxrpathtracer_tpu/sky/data/hosek_data.npz"

_NUM = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")


def parse_arrays(text):
    """Find every `double NAME[] = { ... };` / `const float NAME[N] = {...};`."""
    # Strip // and /* */ comments (they contain numbers like "turbidity 3").
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.DOTALL)
    out = {}
    pattern = re.compile(
        r"(?:double|const\s+float)\s+(\w+)\s*\[[^\]]*\]\s*=\s*\{(.*?)\};",
        re.DOTALL)
    for m in pattern.finditer(text):
        name, body = m.group(1), m.group(2)
        vals = [float(x) for x in _NUM.findall(body)]
        out[name] = np.asarray(vals, np.float64)
    return out


def main():
    arrays = {}
    for fn in ["HosekSky/ArHosekSkyModelData_RGB.h",
               "HosekSky/ArHosekSkyModelData_Spectral.h"]:
        arrays.update(parse_arrays((REF / fn).read_text(errors="replace")))
    spectrum = parse_arrays((REF / "Graphics/Spectrum.cpp").read_text(errors="replace"))

    out = {}

    # RGB sky model: (3 channels, 2 albedos, 10 turbidities, 6 control pts, 9 coeffs)
    rgb = np.stack([arrays[f"datasetRGB{c}"] for c in "123"])
    assert rgb.shape == (3, 2 * 10 * 6 * 9), rgb.shape
    out["rgb_config"] = rgb.reshape(3, 2, 10, 6, 9)
    rgb_rad = np.stack([arrays[f"datasetRGBRad{c}"] for c in "123"])
    out["rgb_radiance"] = rgb_rad.reshape(3, 2, 10, 6)

    # Spectral sky model: 11 wavelengths 320..720nm step 40
    wls = [320 + 40 * i for i in range(11)]
    spec = np.stack([arrays[f"dataset{w}"] for w in wls])
    assert spec.shape == (11, 2 * 10 * 6 * 9), spec.shape
    out["spectral_config"] = spec.reshape(11, 2, 10, 6, 9)
    spec_rad = np.stack([arrays[f"datasetRad{w}"] for w in wls])
    out["spectral_radiance"] = spec_rad.reshape(11, 2, 10, 6)

    # Solar direct radiance: (11 wl, 10 turbidities, 45 pieces, order 4)
    solar = np.stack([arrays[f"solarDataset{w}"] for w in wls])
    assert solar.shape == (11, 10 * 45 * 4), solar.shape
    out["solar"] = solar.reshape(11, 10, 45, 4)

    # Limb darkening: (11 wl, 6 coeffs)
    out["limb_darkening"] = np.stack([arrays[f"limbDarkeningDataset{w}"] for w in wls])

    # CIE 1931 observer (471 samples at CIE_lambda)
    for k in ["CIE_X", "CIE_Y", "CIE_Z", "CIE_lambda"]:
        out[k] = spectrum[k]
        assert out[k].shape == (471,), (k, out[k].shape)

    # Smits RGB->spectrum basis (32 samples)
    for k in ["RGB2SpectLambda",
              "RGBRefl2SpectWhite", "RGBRefl2SpectCyan", "RGBRefl2SpectMagenta",
              "RGBRefl2SpectYellow", "RGBRefl2SpectRed", "RGBRefl2SpectGreen",
              "RGBRefl2SpectBlue",
              "RGBIllum2SpectWhite", "RGBIllum2SpectCyan", "RGBIllum2SpectMagenta",
              "RGBIllum2SpectYellow", "RGBIllum2SpectRed", "RGBIllum2SpectGreen",
              "RGBIllum2SpectBlue"]:
        out[k] = spectrum[k]
        assert out[k].shape == (32,), (k, out[k].shape)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({OUT.stat().st_size / 1024:.0f} KiB, "
          f"{sum(a.size for a in out.values())} values)")


if __name__ == "__main__":
    sys.exit(main())
