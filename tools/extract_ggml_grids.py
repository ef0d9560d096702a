"""Extract the ggml IQ lattice codebooks into weights/ggml_grids.npz.

The IQ2/IQ3 quant formats index into clustering-derived codebooks that ship
as static tables with every ggml implementation (llama.cpp `ggml-common.h`,
tinygrad `tinygrad/runtime/autogen/ggml_common.py`). This sandbox has neither
and no network access, so the tables are pluggable data: run this once against
any checkout and the IQ dequants in clearcam_tpu/io/gguf.py work end-to-end.

Usage:
    python tools/extract_ggml_grids.py path/to/ggml-common.h [-o out.npz]
    python tools/extract_ggml_grids.py path/to/ggml_common.py [-o out.npz]
"""
from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from clearcam_tpu.io.ggml_grids import GRID_SPECS  # noqa: E402


def extract_table(text: str, name: str, count: int) -> np.ndarray:
    """Pull `count` integer literals from the table named `name` in either a
    C header (GGML_TABLE_BEGIN/static const) or a Python autogen module."""
    pats = [
        # C: GGML_TABLE_BEGIN(uint32_t, iq3xxs_grid, 256) ... GGML_TABLE_END()
        rf"GGML_TABLE_BEGIN\(\s*\w+\s*,\s*{name}\s*,\s*\d+\s*\)(.*?)GGML_TABLE_END",
        # C: static const uint32_t iq3xxs_grid[256] = { ... };
        rf"{name}\s*\[\s*\d*\s*\]\s*=\s*\{{(.*?)\}}",
        # Python: iq3xxs_grid = [ ... ]   (tinygrad autogen)
        rf"{name}\s*(?::[^=]+)?=\s*[\[\(](.*?)[\]\)]",
    ]
    for pat in pats:
        m = re.search(pat, text, re.DOTALL)
        if not m:
            continue
        vals = [int(v, 0) for v in re.findall(r"0[xX][0-9a-fA-F]+|\d+",
                                              m.group(1))]
        if len(vals) == count:
            return np.asarray(vals, np.uint64)
        print(f"warning: {name}: found {len(vals)} values, want {count}; "
              f"trying next pattern", file=sys.stderr)
    # ValueError, not SystemExit: extract_to_npz is also a library call
    # (tools/fetch_weights.py wraps it in `except Exception` for its
    # graceful-fallback message; SystemExit would escape that handler)
    raise ValueError(f"could not extract {name} ({count} entries) from input")


def extract_to_npz(text: str, out_path) -> None:
    """Extract all three lattice tables from source text into an npz
    (also called by tools/fetch_weights.py after downloading
    ggml-common.h, so a networked fresh deployment gets IQ3/IQ2 support
    with no llama.cpp checkout)."""
    out = {}
    for name, (dtype, count, _) in GRID_SPECS.items():
        out[name] = extract_table(text, name, count).astype(dtype)
        print(f"{name}: {count} entries ok")
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(out_path, **out)
    print(f"wrote {out_path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("source", help="ggml-common.h or tinygrad ggml_common.py")
    ap.add_argument("-o", "--out", default="weights/ggml_grids.npz")
    args = ap.parse_args()
    try:
        extract_to_npz(Path(args.source).read_text(errors="replace"), args.out)
    except ValueError as e:
        raise SystemExit(str(e))   # clean CLI error, no traceback


if __name__ == "__main__":
    main()
