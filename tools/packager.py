#!/usr/bin/env python3
"""Manifest-driven release packager (Tools/Packager analog).

The reference packages releases from INI-style `Manifest.txt` files
(Tools/Packager/MainFrm.cs): sections group entries, a trailing path
separator marks a recursive directory, a leading `|` marks an exclusion,
and `[References]` pulls in another project's manifest. This tool keeps
that format (with `/` or `\\` separators) and emits a release directory
or .zip plus a `package_info.json` stamp.

Manifest grammar:
  [SectionName]          # Code / Local / Content / Externals / References
  some/dir/              # recursive directory entry
  some/file.py           # single file entry
  |some/dir/skip/        # exclusion (prefix match) within this manifest
  # comment / blank lines ignored

Entries are relative to the manifest's own directory; `[References]`
entries name a directory containing another Manifest.txt, resolved
recursively (cycles are ignored).

Usage:
  python tools/packager.py --manifest Manifest.txt --out dist/release.zip
  python tools/packager.py --manifest Manifest.txt --out dist/release/ --list
"""

import argparse
import json
import subprocess
import sys
import time
import zipfile
from pathlib import Path


def _norm(entry: str) -> str:
    return entry.replace("\\", "/").strip()


def parse_manifest(path: Path):
    """Returns {section: ([entries], [exclusions])}."""
    sections = {}
    current = None
    for raw in path.read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("[") and line.endswith("]"):
            current = line[1:-1]
            sections.setdefault(current, ([], []))
            continue
        if current is None:
            raise ValueError(f"{path}: entry before any [Section]: {line!r}")
        if line.startswith("|"):
            sections[current][1].append(_norm(line[1:]))
        else:
            sections[current][0].append(_norm(line))
    return sections


ALWAYS_EXCLUDE = ("__pycache__", ".git", ".pytest_cache", ".mypy_cache")


def collect_files(manifest: Path, _seen=None):
    """Resolve a manifest to {archive_relpath: absolute Path}."""
    manifest = manifest.resolve()
    if _seen is None:
        _seen = set()
    if manifest in _seen:
        return {}
    _seen.add(manifest)
    base = manifest.parent
    sections = parse_manifest(manifest)

    out = {}
    for section, (entries, excludes) in sections.items():
        if section == "References":
            for entry in entries:
                ref = (base / entry / "Manifest.txt").resolve()
                if ref.exists():
                    out.update(collect_files(ref, _seen))
                else:
                    print(f"warning: missing referenced manifest {ref}",
                          file=sys.stderr)
            continue

        def excluded(rel: str) -> bool:
            if any(part in ALWAYS_EXCLUDE for part in rel.split("/")):
                return True
            return any(rel == e.rstrip("/") or rel.startswith(e.rstrip("/") + "/")
                       for e in excludes)

        for entry in entries:
            src = base / entry
            if entry.endswith("/") or src.is_dir():
                if not src.is_dir():
                    print(f"warning: missing directory {src}", file=sys.stderr)
                    continue
                for f in sorted(src.rglob("*")):
                    if not f.is_file():
                        continue
                    rel = _norm(str(f.relative_to(base)))
                    if not excluded(rel):
                        out[rel] = f
            elif src.is_file():
                rel = _norm(entry)
                if not excluded(rel):
                    out[rel] = src
            else:
                print(f"warning: missing file {src}", file=sys.stderr)
    return out


def _git_rev(cwd: Path) -> str:
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              cwd=cwd, capture_output=True, text=True,
                              timeout=10).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def package(manifest: Path, out: Path, name: str | None = None) -> int:
    files = collect_files(manifest)
    info = {
        "name": name or manifest.parent.name,
        "created": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "revision": _git_rev(manifest.parent),
        "file_count": len(files),
    }
    info_bytes = (json.dumps(info, indent=2, sort_keys=True) + "\n").encode()

    if out.suffix.lower() == ".zip":
        out.parent.mkdir(parents=True, exist_ok=True)
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
            for rel in sorted(files):
                z.write(files[rel], rel)
            z.writestr("package_info.json", info_bytes)
    else:
        out.mkdir(parents=True, exist_ok=True)
        for rel in sorted(files):
            dst = out / rel
            dst.parent.mkdir(parents=True, exist_ok=True)
            dst.write_bytes(files[rel].read_bytes())
        (out / "package_info.json").write_bytes(info_bytes)
    return len(files)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--manifest", default="Manifest.txt")
    ap.add_argument("--out", required=True,
                    help="release directory, or a .zip path")
    ap.add_argument("--name", default=None)
    ap.add_argument("--list", action="store_true",
                    help="print the resolved file list and exit")
    args = ap.parse_args(argv)

    manifest = Path(args.manifest)
    if not manifest.exists():
        ap.error(f"manifest not found: {manifest}")
    if args.list:
        for rel in sorted(collect_files(manifest)):
            print(rel)
        return 0
    n = package(manifest, Path(args.out), args.name)
    print(f"packaged {n} files -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
