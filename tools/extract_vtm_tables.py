#!/usr/bin/env python3
"""Extract H.266/VVC standard-mandated constant tables into .npz data files.

The VVC transform matrices (DCT-II/DCT-VIII/DST-VII core tables), LFNST
kernels, MIP weight matrices, quantization scales and CABAC context-init
values are *normative constants of the ITU-T H.266 standard* (reproduced in
every conforming codec). This tool expands them mechanically from the
BSD-licensed VTM reference tables (macro-packed C arrays) via the C
preprocessor and stores them as numpy archives under
``pmp_vvc_tpu/codec/data/`` so the framework is standalone.

Usage: python tools/extract_vtm_tables.py [--vtm <path-to-VTM-CommonLib>]
"""
from __future__ import annotations

import argparse
import pathlib
import re
import subprocess
import tempfile

import numpy as np

DEFAULT_VTM = pathlib.Path(
    "/root/reference/codec/vtm10.0-source-with-pmp-fast-alg/Lib/CommonLib")
OUT_DIR = pathlib.Path(__file__).resolve().parent.parent / \
    "pmp_vvc_tpu" / "codec" / "data"


def preprocess(src_text: str, defines: dict[str, str]) -> str:
    """Run the C preprocessor over ``src_text`` with ``defines``."""
    with tempfile.TemporaryDirectory() as td:
        src = pathlib.Path(td) / "in.cpp"
        src.write_text(src_text)
        cmd = ["g++", "-E", "-P", str(src)]
        for k, v in defines.items():
            cmd += ["-D", f"{k}={v}"]
        return subprocess.run(cmd, capture_output=True, text=True,
                              check=True).stdout


_ARRAY_RE = re.compile(
    r"const\s+\w+\s+(\w+)\s*\[([^\]]*)\]\s*(\[[^=]*)?=\s*(\{.*?\})\s*;",
    re.S)


def parse_arrays(text: str) -> dict[str, np.ndarray]:
    """Parse preprocessed C array initializers into numpy arrays."""
    out = {}
    for m in _ARRAY_RE.finditer(text):
        name = m.group(1)
        body = m.group(4)
        nums = re.findall(r"-?\d+", body)
        out[name] = np.array([int(x) for x in nums], dtype=np.int64)
    return out


def extract_transforms(vtm: pathlib.Path) -> dict[str, np.ndarray]:
    body = (vtm / "RomTr.cpp").read_text()
    # strip includes; keep macros + tables
    body = re.sub(r"#include.*", "", body)
    prelude = ("typedef short TMatrixCoeff;\n"
               "#define TRANSFORM_NUMBER_OF_DIRECTIONS 2\n")
    text = preprocess(prelude + body,
                      {"RExt__HIGH_PRECISION_FORWARD_TRANSFORM": "0"})
    raw = parse_arrays(text)
    out = {}
    for kind in ("DCT2", "DCT8", "DST7"):
        for n in (2, 4, 8, 16, 32, 64):
            key = f"g_trCore{kind}P{n}"
            if key not in raw:
                continue
            arr = raw[key]
            assert arr.size == 2 * n * n, (key, arr.size)
            mats = arr.reshape(2, n, n)
            # [0]=forward, [1]=inverse; with HIGH_PRECISION=0 both are the
            # 6-bit (scale-64) normative matrices.
            assert (mats[0] == mats[1]).all(), f"{key}: fwd != inv at 6-bit"
            out[f"{kind.lower()}_{n}"] = mats[0].astype(np.int32)
    return out


def extract_frac_bits(vtm: pathlib.Path) -> np.ndarray:
    """CABAC fractional-bit estimation table (Contexts.cpp m_binFracBits)."""
    text = (vtm / "Contexts.cpp").read_text()
    m = re.search(
        r"m_binFracBits\s*\[\s*256\s*\]\s*=\s*\{(.*?)\};", text, re.S)
    nums = re.findall(r"0x[0-9a-fA-F]+|\d+", m.group(1))
    arr = np.array([int(x, 0) for x in nums], np.int64)
    assert arr.size == 512, arr.size
    return arr.reshape(256, 2).astype(np.uint32)


def extract_mip(vtm: pathlib.Path) -> dict:
    """MipData.h weight matrices (H.266 Table 25-27 constants)."""
    import numpy as np
    body = (vtm / "MipData.h").read_text()
    out = {}
    for name, shape in (("mipMatrix4x4", (16, 16, 4)),
                        ("mipMatrix8x8", (8, 16, 8)),
                        ("mipMatrix16x16", (6, 64, 7))):
        m = re.search(name + r"\[[^=]*=\s*\{(.*?)\n\};", body, re.S)
        nums = [int(x) for x in re.findall(r"\d+", m.group(1))]
        arr = np.array(nums, np.int32).reshape(shape)
        out[name] = arr
    return out


def extract_lfnst(vtm: pathlib.Path) -> dict:
    """RomLFNST.cpp kernels + intra-mode -> set LUT (H.266 Table 38)."""
    import numpy as np
    src = (vtm / "RomLFNST.cpp").read_text()
    out = {}
    for name, shape in (("g_lfnstLut", (95,)), ("g_lfnst8x8", (4, 2, 16, 48)),
                        ("g_lfnst4x4", (4, 2, 16, 16))):
        m = re.search(re.escape(name) + r"\[[^=]*=\s*\{(.*?)\n\};", src,
                      re.S)
        body = re.sub(r"//[^\n]*", "", m.group(1))
        nums = [int(x) for x in re.findall(r"-?\d+", body)]
        assert len(nums) == int(np.prod(shape))
        out[name.replace("g_", "")] = np.array(nums, np.int32).reshape(shape)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vtm", type=pathlib.Path, default=DEFAULT_VTM)
    args = ap.parse_args()
    OUT_DIR.mkdir(parents=True, exist_ok=True)

    tr = extract_transforms(args.vtm)
    np.savez_compressed(OUT_DIR / "transform_cores.npz", **tr)
    print("transform_cores.npz:", {k: v.shape for k, v in tr.items()})

    fb = extract_frac_bits(args.vtm / ".." / "CommonLib"
                           if not (args.vtm / "Contexts.cpp").exists()
                           else args.vtm)
    np.savez_compressed(OUT_DIR / "cabac_frac_bits.npz", frac_bits=fb)
    print("cabac_frac_bits.npz:", fb.shape)

    mip = extract_mip(args.vtm)
    np.savez_compressed(OUT_DIR / "mip_matrices.npz", **mip)
    print("mip_matrices.npz:", {k: v.shape for k, v in mip.items()})

    lf = extract_lfnst(args.vtm)
    np.savez_compressed(OUT_DIR / "lfnst.npz", **lf)
    print("lfnst.npz:", {k: v.shape for k, v in lf.items()})


def _main_with_alf():
    main()
    extract_alf_fixed(DEFAULT_VTM)


if __name__ == "__main__":
    _main_with_alf()


def extract_alf_fixed(vtm: pathlib.Path):
    """ALF fixed filter sets + class mapping (AdaptiveLoopFilter.cpp:212-298,
    normative H.266 tables 8.x)."""
    text = (vtm / "AdaptiveLoopFilter.cpp").read_text()

    def grab(name):
        m = re.search(re.escape(name) + r"[^=]*=\s*\{(.*?)\n\};",
                      text, re.S)
        assert m, name
        rows = re.findall(r"\{([^{}]*)\}", m.group(1))
        return np.array([[int(v) for v in r.replace("//", " ").split(",")
                          if v.strip().lstrip("-").isdigit()]
                         for r in rows], np.int32)

    coeff = grab("m_fixedFilterSetCoeff[ALF_FIXED_FILTER_NUM]")
    mapping = grab("m_classToFilterMapping[NUM_FIXED_FILTER_SETS]")
    assert coeff.shape == (64, 13), coeff.shape
    coeff = coeff[:, :12]   # 13th entry is a zero placeholder
    assert mapping.shape == (16, 25), mapping.shape
    np.savez(OUT_DIR / "alf_fixed.npz", coeff=coeff, mapping=mapping)
    print("alf_fixed.npz", coeff.shape, mapping.shape)


