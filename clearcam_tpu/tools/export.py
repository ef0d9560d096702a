"""Export/replay compiled detector programs (StableHLO bundles).

The reference ships a frozen tinygrad kernel schedule to edge devices (the
iOS app replays `yolov9t` — BufferAlloc/ProgramAlloc/ProgramExec records —
against Metal, ios/clearcam/Yolo.m:26-196). Our equivalent artifact is a
serialized StableHLO export of the fused detect graph: portable across
XLA backends (TPU/CPU/GPU), weights baked in, replayable without Python model
code.

Bundle format: a zip with
    program.stablehlo   jax.export serialization (weights captured as consts)
    meta.json           {input_shape, res, size, version}

Usage:
    python -m clearcam_tpu.tools.export detector out.ccprog \
        --size t --res 640 --height 1080 --width 1920 [--weights weights/]
    python -m clearcam_tpu.tools.export run out.ccprog          # replay check
"""
from __future__ import annotations

import argparse
import json
import zipfile
from pathlib import Path

import numpy as np

FORMAT_VERSION = 1


def export_detector(out_path: str | Path, size: str = "t", res: int = 640,
                    frame_hw=(1080, 1920), batch: int = 1,
                    weights_dir: str = "weights", params=None,
                    compute_dtype=None):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from ..models import yolov9

    if params is None:
        path = Path(weights_dir) / f"yolov9-{size}.safetensors"
        if path.exists():
            from ..io import safetensors as st
            params = yolov9.convert_state_dict(st.load(path))
        else:
            params = yolov9.init_params(size)
    dtype = compute_dtype or jnp.float32

    def fn(frames):
        return yolov9.detect(params, frames, size=size, res=res,
                             compute_dtype=dtype)

    spec = jax.ShapeDtypeStruct((batch, *frame_hw, 3), jnp.uint8)
    exported = jexport.export(jax.jit(fn))(spec)
    blob = exported.serialize()
    meta = {"version": FORMAT_VERSION, "size": size, "res": res,
            "input_shape": [batch, *frame_hw, 3],
            "output": "x1,y1,x2,y2,score,class rows"}
    with zipfile.ZipFile(out_path, "w") as z:
        z.writestr("program.stablehlo", blob)
        # raw StableHLO MLIR for non-Python replayers (native/replayer consumes
        # this through the PJRT C API, format "mlir")
        z.writestr("program.mlir", exported.mlir_module())
        z.writestr("meta.json", json.dumps(meta))
    return meta


class Replayer:
    """Load and run a .ccprog bundle (no model code needed)."""

    def __init__(self, path: str | Path):
        from jax import export as jexport
        with zipfile.ZipFile(path) as z:
            self.meta = json.loads(z.read("meta.json"))
            self.exported = jexport.deserialize(z.read("program.stablehlo"))

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp
        return np.asarray(self.exported.call(jnp.asarray(frames, jnp.uint8)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("detector")
    e.add_argument("out")
    e.add_argument("--size", default="t")
    e.add_argument("--res", type=int, default=640)
    e.add_argument("--height", type=int, default=1080)
    e.add_argument("--width", type=int, default=1920)
    e.add_argument("--batch", type=int, default=1)
    e.add_argument("--weights", default="weights")
    r = sub.add_parser("run")
    r.add_argument("bundle")
    args = ap.parse_args(argv)
    if args.cmd == "detector":
        meta = export_detector(args.out, args.size, args.res,
                               (args.height, args.width), args.batch,
                               args.weights)
        print(json.dumps(meta))
    else:
        rep = Replayer(args.bundle)
        shape = rep.meta["input_shape"]
        out = rep(np.zeros(shape, np.uint8))
        print(f"replayed {rep.meta}: output {out.shape}")


if __name__ == "__main__":
    main()
