"""Download the published model weights into weights/.

Mirrors the reference's lazy fetches (detection/yolov9.py:372,
models/objects.py:91, models/adaface.py:76, llm/qwen3vl.py:96,202) as one
explicit command — the NVR itself never touches the network for weights.

Usage:
    python -m clearcam_tpu.tools.fetch_weights [--dest weights]
        [--models yolo clip face qwen] [--yolo-sizes t s] [--qwen-size 2]
"""
from __future__ import annotations

import argparse
import sys
import urllib.request
from pathlib import Path

HF = "https://huggingface.co"
URLS = {
    "yolo": lambda size, **_: [
        (f"{HF}/roryclear/yolov9/resolve/main/yolov9-{size}.safetensors",
         f"yolov9-{size}.safetensors")],
    "clip": lambda **_: [
        (f"{HF}/roryclear/CLIP-ViT-L-14-laion2B-s32B-b82K/resolve/main/"
         "CLIP-ViT-L-14-laion2B-s32B-b82K.safetensors",
         "CLIP-ViT-L-14-laion2B-s32B-b82K.safetensors"),
        ("https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz",
         "bpe_simple_vocab_16e6.txt.gz")],
    "face": lambda **_: [
        (f"{HF}/roryclear/AdaFace/resolve/main/adaface_ir50_ms1mv2.safetensors",
         "adaface_ir50_ms1mv2.safetensors")],
    "qwen": lambda qwen_size, **_: [
        (f"{HF}/Qwen/Qwen3-VL-{qwen_size}B-Instruct-GGUF/resolve/main/"
         f"Qwen3VL-{qwen_size}B-Instruct-F16.gguf",
         f"Qwen3VL-{qwen_size}B-Instruct-F16.gguf"),
        (f"{HF}/Qwen/Qwen3-VL-{qwen_size}B-Instruct-GGUF/resolve/main/"
         f"mmproj-Qwen3VL-{qwen_size}B-Instruct-F16.gguf",
         f"mmproj-Qwen3VL-{qwen_size}B-Instruct-F16.gguf")],
}


def fetch(url: str, dest: Path) -> bool:
    if dest.exists():
        print(f"  {dest.name}: already present")
        return True
    tmp = dest.with_suffix(dest.suffix + ".part")
    try:
        print(f"  {dest.name}: downloading {url}")
        with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
            while chunk := r.read(1 << 20):
                f.write(chunk)
        tmp.rename(dest)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  {dest.name}: FAILED ({e})")
        tmp.unlink(missing_ok=True)
        return False


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", type=Path, default=Path("weights"))
    ap.add_argument("--models", nargs="+", default=["yolo", "clip"],
                    choices=list(URLS))
    ap.add_argument("--yolo-sizes", nargs="+", default=["t"])
    ap.add_argument("--qwen-size", type=int, default=2)
    args = ap.parse_args(argv)
    args.dest.mkdir(parents=True, exist_ok=True)
    ok = True
    for model in args.models:
        sizes = args.yolo_sizes if model == "yolo" else [None]
        for size in sizes:
            for url, name in URLS[model](size=size, qwen_size=args.qwen_size):
                ok &= fetch(url, args.dest / name)
    # blazeface ships with the reference repo, not HF — note it
    if "face" in args.models:
        print("  note: blazeface.safetensors is distributed with the reference "
              "repo; copy it into weights/ manually")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
