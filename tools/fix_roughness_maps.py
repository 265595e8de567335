#!/usr/bin/env python3
"""Content fixup: bind/derive roughness maps for imported scenes.

The reference ships two Maya scripts that rewire roughness textures into
scene materials by filename convention (SampleFramework12/v1.02/Scripts/
FixSponzaRoughnessMaps.py: `<colorbase>_roughness.png` next to the color
map; FixSunTempleRoughnessMaps.py: `<base>SR.dds` specular -> `<base>R.dds`
roughness). This is the same fixup for our pipeline: it scans a texture
directory, resolves those conventions (optionally deriving roughness from
gloss maps by inversion), and writes `roughness_bindings.json` — a
color-map -> roughness-map table the FBX scene loader consumes when a
material has no explicit roughness slot (scene/registry.py).

Usage:
  python tools/fix_roughness_maps.py --dir Content/Models/Sponza [--apply]
         [--gloss-to-roughness] [--dry-run]
"""

import argparse
import json
import sys
from pathlib import Path

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".tga", ".bmp", ".dds")
COLOR_HINTS = ("diffuse", "albedo", "basecolor", "color")
GLOSS_HINTS = ("gloss", "glossiness", "smoothness")

BINDINGS_NAME = "roughness_bindings.json"


def _is_image(p: Path) -> bool:
    return p.suffix.lower() in IMAGE_EXTS


def find_color_maps(tex_dir: Path):
    out = []
    for p in sorted(tex_dir.iterdir()):
        if not _is_image(p):
            continue
        low = p.stem.lower()
        if any(h in low for h in COLOR_HINTS) or low.endswith("sr"):
            out.append(p)
    return out


def resolve_roughness(color: Path):
    """Apply both reference conventions; returns the roughness Path or None."""
    stem = color.stem
    # Sponza style: Sponza_Fabric_diffuse.png -> Sponza_Fabric_roughness.png
    if "_" in stem:
        base = stem[:stem.rfind("_")]
        for ext in IMAGE_EXTS:
            cand = color.with_name(base + "_roughness" + ext)
            if cand.exists():
                return cand
    # SunTemple style: M_Pillar_SR.dds / M_PillarSR.dds -> ...R.dds
    low = stem.lower()
    if low.endswith("sr"):
        cand = color.with_name(stem[:-2] + "R" + color.suffix)
        if cand.exists():
            return cand
    return None


def derive_from_gloss(tex_dir: Path, dry_run=False):
    """Write `<base>_roughness.png` = 1 - gloss for every gloss map that has
    no roughness sibling yet. Returns the list of files written."""
    from PIL import Image
    import numpy as np

    written = []
    for p in sorted(tex_dir.iterdir()):
        low = p.stem.lower()
        if not _is_image(p) or not any(h in low for h in GLOSS_HINTS):
            continue
        base = p.stem[:p.stem.lower().rfind(next(
            h for h in GLOSS_HINTS if h in low))].rstrip("_")
        out = p.with_name((base or p.stem) + "_roughness.png")
        if out.exists():
            continue
        if not dry_run:
            img = np.asarray(Image.open(p).convert("L"), dtype=np.uint8)
            Image.fromarray(255 - img).save(out)
        written.append(out)
    return written


def build_bindings(tex_dir: Path):
    """color filename -> roughness filename for every resolvable pair."""
    bindings = {}
    for color in find_color_maps(tex_dir):
        rough = resolve_roughness(color)
        if rough is not None:
            bindings[color.name] = rough.name
    return bindings


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dir", required=True, help="texture directory to fix")
    ap.add_argument("--apply", action="store_true",
                    help=f"write {BINDINGS_NAME} into the directory")
    ap.add_argument("--gloss-to-roughness", action="store_true",
                    help="derive missing roughness maps from gloss maps (1-x)")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    tex_dir = Path(args.dir)
    if not tex_dir.is_dir():
        ap.error(f"not a directory: {tex_dir}")

    if args.gloss_to_roughness:
        for f in derive_from_gloss(tex_dir, dry_run=args.dry_run):
            print(f"derived {f.name}")

    bindings = build_bindings(tex_dir)
    for color, rough in bindings.items():
        print(f"{color} -> {rough}")
    if not bindings:
        print("no roughness pairs found", file=sys.stderr)
    if args.apply and not args.dry_run:
        out = tex_dir / BINDINGS_NAME
        out.write_text(json.dumps(bindings, indent=2, sort_keys=True) + "\n")
        print(f"wrote {out} ({len(bindings)} bindings)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
