"""Fine-tune YOLOv9 on a YOLO-format dataset (training is new in this
framework — the reference is inference-only).

Dataset layout (the standard YOLO txt format):
    <root>/images/*.jpg|png
    <root>/labels/<same-stem>.txt   lines: "<cls> <cx> <cy> <w> <h>" normalized

Pipeline: host loader letterboxes images to a square res and maps boxes into
the same pixel space (padded to a fixed per-image box count so every step is
one static-shape program); the jitted step is models/yolo_loss.make_finetune
(TAL assignment + CIoU + BCE, clipped adamw). With --mesh it runs dp x tp
over the local chips via parallel/mesh (GSPMD inserts the gradient psum);
multi-host runs reuse the same step over parallel/federation's global mesh.

Checkpoints are written in the PUBLISHED safetensors layout (OIHW filters,
tinygrad state-dict names) so they interchange with released weights and
load back through `YOLOv9.from_safetensors`.

Usage:
    python -m clearcam_tpu.tools.finetune <dataset_root> \
        [--size t --res 640 --batch 8 --steps 500 --lr 1e-4] \
        [--init weights/yolov9-t.safetensors] [--out runs/ft.safetensors] \
        [--mesh]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def load_dataset(root: str | Path, res: int, max_boxes: int = 32):
    """-> (images [N,res,res,3] f32 0..1 RGB, boxes [N,max_boxes,4] xyxy px,
    cls [N,max_boxes] (-1 pad)). Letterboxed on host once; small datasets
    stay resident, the train loop samples batches from the arrays."""
    import cv2

    root = Path(root)
    img_paths = sorted(p for p in (root / "images").iterdir()
                       if p.suffix.lower() in (".jpg", ".jpeg", ".png"))
    if not img_paths:
        raise FileNotFoundError(f"no images under {root / 'images'}")
    imgs, boxes, clss = [], [], []
    for p in img_paths:
        img = cv2.imread(str(p))[:, :, ::-1]        # BGR -> RGB
        h, w = img.shape[:2]
        r = min(res / h, res / w)
        nh, nw = int(round(h * r)), int(round(w * r))
        canvas = np.zeros((res, res, 3), np.float32)
        top, left = (res - nh) // 2, (res - nw) // 2
        canvas[top:top + nh, left:left + nw] = cv2.resize(
            img, (nw, nh), interpolation=cv2.INTER_LINEAR) / 255.0
        b = np.zeros((max_boxes, 4), np.float32)
        c = np.full((max_boxes,), -1.0, np.float32)
        label = root / "labels" / (p.stem + ".txt")
        if label.exists():
            rows = np.loadtxt(label, ndmin=2, dtype=np.float32)
            for j, (cid, cx, cy, bw, bh) in enumerate(rows[:max_boxes]):
                x1 = (cx - bw / 2) * w * r + left
                y1 = (cy - bh / 2) * h * r + top
                x2 = (cx + bw / 2) * w * r + left
                y2 = (cy + bh / 2) * h * r + top
                b[j] = [x1, y1, x2, y2]
                c[j] = cid
        imgs.append(canvas)
        boxes.append(b)
        clss.append(c)
    return np.stack(imgs), np.stack(boxes), np.stack(clss)


def save_published(params: dict, path: str | Path) -> None:
    """Write params in the published layout (OIHW, flat names)."""
    from ..io import safetensors as st

    sd = {}
    for k, v in params.items():
        arr = np.asarray(v, np.float32)
        if arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))
        sd[k] = arr
    st.save(sd, path)


def train(dataset: str, size: str = "t", res: int = 640, batch: int = 8,
          steps: int = 500, lr: float = 1e-4, clip_norm: float = 1.0,
          remat: bool = False, init: str | None = None,
          out: str = "yolov9-finetuned.safetensors", use_mesh: bool = False,
          seed: int = 0, log_every: int = 20, ckpt_dir: str | None = None,
          ckpt_every: int = 100):
    import jax
    import jax.numpy as jnp
    from ..models import yolov9
    from ..models.yolo_loss import make_finetune_step

    imgs, boxes, clss = load_dataset(dataset, res)
    n = len(imgs)
    print(f"dataset: {n} images, res {res}, batch {batch}")

    if init:
        from ..io import safetensors as st
        params = yolov9.convert_state_dict(st.load(init))
        print(f"initialized from {init}")
    else:
        params = yolov9.init_params(size, seed=seed)

    step_fn, opt = make_finetune_step(size, lr=lr, clip_norm=clip_norm,
                                      remat=remat)
    if use_mesh:
        from ..parallel import mesh as pmesh
        mesh = pmesh.make_mesh()
        params = pmesh.shard_params_tp(mesh, params)
        print(f"mesh: {dict(mesh.shape)}")
    opt_state = opt.init(params)

    # checkpoint/resume (orbax): params + optimizer state + step counter
    start_step = 0
    ckptr = None
    if ckpt_dir:
        import orbax.checkpoint as ocp
        ckpt_path = Path(ckpt_dir).resolve() / "state"
        ckptr = ocp.StandardCheckpointer()
        if ckpt_path.exists():
            template = {"params": params, "opt_state": opt.init(params),
                        "step": jnp.asarray(0)}
            restored = ckptr.restore(str(ckpt_path), template)
            params, opt_state = restored["params"], restored["opt_state"]
            start_step = int(restored["step"])
            print(f"resumed from {ckpt_path} at step {start_step}")

    def save_ckpt(step_no):
        if ckptr is None:
            return
        tmp = Path(ckpt_dir).resolve() / "state.new"
        import shutil as _sh
        _sh.rmtree(tmp, ignore_errors=True)
        ckptr.save(str(tmp), {"params": params, "opt_state": opt_state,
                              "step": jnp.asarray(step_no)})
        ckptr.wait_until_finished()
        final = Path(ckpt_dir).resolve() / "state"
        _sh.rmtree(final, ignore_errors=True)
        tmp.rename(final)

    rng = np.random.default_rng(seed + start_step)
    losses = []
    for it in range(start_step, steps):
        idx = rng.integers(0, n, batch)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(imgs[idx]),
            jnp.asarray(boxes[idx]), jnp.asarray(clss[idx], jnp.int32))
        losses.append(float(loss))
        if it % log_every == 0 or it == steps - 1:
            print(f"step {it:5d}  loss {losses[-1]:.4f}")
        if ckpt_every and ckptr is not None and (it + 1) % ckpt_every == 0:
            save_ckpt(it + 1)
    save_ckpt(steps)
    host_params = jax.tree.map(np.asarray, params)
    save_published(host_params, out)
    print(f"saved {out}")
    return losses


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--size", default="t")
    ap.add_argument("--res", type=int, default=640)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--clip-norm", type=float, default=1.0)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize activations (jax.checkpoint): larger "
                         "batch x res per chip for ~1 extra forward of FLOPs")
    ap.add_argument("--init", help="published safetensors to start from")
    ap.add_argument("--out", default="yolov9-finetuned.safetensors")
    ap.add_argument("--mesh", action="store_true",
                    help="shard dp x tp over the local device mesh")
    ap.add_argument("--ckpt-dir",
                    help="orbax checkpoint dir: save params+optimizer+step "
                         "every --ckpt-every steps, auto-resume if present")
    ap.add_argument("--ckpt-every", type=int, default=100)
    args = ap.parse_args(argv)
    train(args.dataset, args.size, args.res, args.batch, args.steps, args.lr,
          args.clip_norm, args.remat, args.init, args.out, args.mesh,
          ckpt_dir=args.ckpt_dir, ckpt_every=args.ckpt_every)


if __name__ == "__main__":
    main()
