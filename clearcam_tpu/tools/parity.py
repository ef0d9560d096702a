"""Published-weight parity harness.

The reference pins three numeric invariants that only real checkpoints can
reproduce (this sandbox has no network, so round-1/2 tests run synthetic
weights — these checks activate the moment `tools/fetch_weights.py` has run
and the fixture media exists):

  clip   cos("ferrari f40", f40.jpg) == 0.330654 +- 1e-6
         (/root/reference/test/test_clip.py:6-12)
  mot    156 unique persons on MOT16-03.mp4, YOLOv9-t @ res 960
         (/root/reference/test/run_mot.py:24-26)
  mot-rfdetr  157 unique persons, RF-DETR nano (run_mot.py:36-51)
  yolo   detection rows match a recorded golden npz (made on any machine
         running the tinygrad reference via `record-golden`)

Usage:
    python -m clearcam_tpu.tools.parity [--weights weights/] \
        [--fixtures fixtures/] [--checks clip mot yolo] [--strict]
    python -m clearcam_tpu.tools.parity record-golden img.jpg out.npz \
        [--size t --res 960]   # record OUR outputs (or adapt for reference)

Each check self-skips with the exact file list it needs; --strict turns
skips into failures (CI-with-weights mode). tests/test_weight_parity.py
wraps these as pytest cases that activate on weight presence.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

CLIP_SIM_EXPECTED = 0.330654          # test_clip.py:12
MOT_YOLO_EXPECTED = 156               # run_mot.py:24-26
MOT_RFDETR_EXPECTED = 157             # run_mot.py:51


def _missing(paths) -> list[str]:
    return [str(p) for p in paths if not Path(p).exists()]


def check_clip(weights: Path, fixtures: Path) -> tuple[bool | None, str]:
    """cos(f40.jpg, "ferrari f40") against the pinned scalar."""
    need = [weights / "CLIP-ViT-L-14-laion2B-s32B-b82K.safetensors",
            weights / "bpe_simple_vocab_16e6.txt.gz",
            fixtures / "f40.jpg"]
    if m := _missing(need):
        return None, f"missing: {', '.join(m)}"
    import cv2
    from ..models.objects import ObjectFinder

    finder = ObjectFinder(weights_dir=str(weights))
    finder.init_clip()
    img = cv2.imread(str(fixtures / "f40.jpg"))[:, :, ::-1]  # BGR->RGB
    img_emb = finder.embed_images([img])[0]
    txt_emb = finder.embed_text("ferrari f40")
    sim = float(img_emb @ txt_emb)
    ok = abs(sim - CLIP_SIM_EXPECTED) < 1e-6
    return ok, f"cos = {sim:.6f} (expect {CLIP_SIM_EXPECTED:.6f})"


def check_mot(weights: Path, fixtures: Path,
              detector_kind: str = "yolo") -> tuple[bool | None, str]:
    """Unique-person count on MOT16-03 (the reference regression invariant)."""
    video = fixtures / "MOT16-03.mp4"
    need = [video]
    if detector_kind == "yolo":
        need.append(weights / "yolov9-t.safetensors")
        expected = MOT_YOLO_EXPECTED
    else:
        need.append(weights / "rf-detr-nano.pth")
        expected = MOT_RFDETR_EXPECTED
    if m := _missing(need):
        return None, f"missing: {', '.join(m)}"
    from .mot import run_mot

    count, _ = run_mot(str(video), size="t", res=960,
                       weights_dir=str(weights), detector_kind=detector_kind)
    return count == expected, f"unique persons = {count} (expect {expected})"


def check_yolo_golden(weights: Path, fixtures: Path) -> tuple[bool | None, str]:
    """Detection rows vs a recorded golden npz {image, rows, size, res}."""
    golden = fixtures / "yolo_golden.npz"
    need = [golden, weights / "yolov9-t.safetensors"]
    if m := _missing(need):
        return None, f"missing: {', '.join(m)}"
    from ..models.yolov9 import YOLOv9

    with np.load(golden) as z:
        img, rows = z["image"], z["rows"]
        size = str(z["size"]) if "size" in z else "t"
        res = int(z["res"]) if "res" in z else 960
    model = YOLOv9.from_safetensors(
        weights / f"yolov9-{size}.safetensors", size=size, res=res)
    got = np.asarray(model(img))
    got = got[got[:, 4] > 0]
    rows = rows[rows[:, 4] > 0]
    if len(got) != len(rows):
        return False, f"{len(got)} rows vs golden {len(rows)}"
    # order by score desc on both sides before comparing
    got = got[np.argsort(-got[:, 4])]
    rows = rows[np.argsort(-rows[:, 4])]
    box_err = np.abs(got[:, :4] - rows[:, :4]).max() if len(rows) else 0.0
    cls_ok = (got[:, 5] == rows[:, 5]).all() if len(rows) else True
    ok = bool(box_err < 1.0 and cls_ok)
    return ok, f"{len(rows)} rows, max box err {box_err:.3f}px, classes {'ok' if cls_ok else 'MISMATCH'}"


CHECKS = {
    "clip": check_clip,
    "mot": lambda w, f: check_mot(w, f, "yolo"),
    "mot-rfdetr": lambda w, f: check_mot(w, f, "rfdetr"),
    "yolo": check_yolo_golden,
}


def record_golden(image_path: str, out_path: str, size: str = "t",
                  res: int = 960, weights_dir: str = "weights"):
    """Record a golden npz from the current implementation + real weights
    (run once on a machine where outputs are verified against the reference)."""
    import cv2
    from ..models.yolov9 import YOLOv9
    img = cv2.imread(image_path)
    model = YOLOv9.from_safetensors(
        Path(weights_dir) / f"yolov9-{size}.safetensors", size=size, res=res)
    rows = np.asarray(model(img))
    np.savez(out_path, image=img, rows=rows, size=size, res=res)
    print(f"recorded {int((rows[:, 4] > 0).sum())} rows -> {out_path}")


def run(weights="weights", fixtures="fixtures", checks=None,
        strict=False) -> int:
    weights, fixtures = Path(weights), Path(fixtures)
    failures = skips = 0
    for name in (checks or list(CHECKS)):
        ok, msg = CHECKS[name](weights, fixtures)
        status = "SKIP" if ok is None else ("PASS" if ok else "FAIL")
        print(f"{name:12s} {status}  {msg}")
        failures += status == "FAIL"
        skips += status == "SKIP"
    if strict and skips:
        print(f"--strict: {skips} skipped check(s) count as failures")
        failures += skips
    return 1 if failures else 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd")
    runp = sub.add_parser("run")
    for p in (ap, runp):
        p.add_argument("--weights", default="weights")
        p.add_argument("--fixtures", default="fixtures")
        p.add_argument("--checks", nargs="*", choices=list(CHECKS))
        p.add_argument("--strict", action="store_true")
    rec = sub.add_parser("record-golden")
    rec.add_argument("image")
    rec.add_argument("out")
    rec.add_argument("--size", default="t")
    rec.add_argument("--res", type=int, default=960)
    rec.add_argument("--weights", default="weights")
    args = ap.parse_args(argv)
    if args.cmd == "record-golden":
        record_golden(args.image, args.out, args.size, args.res, args.weights)
        return 0
    return run(args.weights, args.fixtures, args.checks, args.strict)


if __name__ == "__main__":
    sys.exit(main())
