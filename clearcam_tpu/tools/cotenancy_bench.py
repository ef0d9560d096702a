"""Chip co-tenancy ladder: the full NVR workload sharing ONE v5e.

SURVEY §7 named "Qwen prefill/decode latency sharing a chip with the
detector" the hardest problem — the reference BLOCKS its detect loop for
the whole generation (/root/reference/clearcam.py:494-496). Our NVR
interleaves at chunk granularity instead (runtime/nvr.py:_advance_summary
_engine: up to 4 serving-engine scheduler steps per tick, single-thread
single-device-consumer discipline). This bench measures that policy with
the real graphs, BASELINE.md's flagship config ("full 16-stream NVR +
Qwen3-VL summaries"):

  detect-only  : batched YOLOv9-t@640 on N 1080p streams + host OC-SORT
                 (the bench.py e2e tick), per-tick latency sampled
  full         : same tick PLUS, exactly as the NVR tick orders them —
                 CLIP crop embeds (ViT-L/14, every 3rd tick: the object-
                 queue drain), BlazeFace face detect (every 5th tick),
                 and <=4 VLMServingEngine steps/tick with a 2B-class
                 Qwen3-VL (random weights; vision prefill + temp-0.7
                 decode) kept continuously busy

Reported: detect tick p50/p99 and streams@30fps for both configs, plus
the summary token throughput achieved WHILE detection holds rate. Every
tick syncs on the detect output (the NVR must read boxes back to track) —
through the axon tunnel that readback adds a constant ~5-10 ms to BOTH
configs (CLAUDE.md: host link is ~20 MB/s here; a PCIe host would not see
it), so the co-tenancy cost is the DELTA between the ladders, not the
absolute p50.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site nohup python -m \
        clearcam_tpu.tools.cotenancy_bench > /tmp/cotenancy.log 2>&1 &
(first run compiles ~6 graphs; expect ~20-40 min cold, cached after)
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def build_vlm(blocks: int, ctx: int, slots: int, res: int,
              quant: str = "none"):
    """2B-class Qwen3-VL with random weights (llm_bench.qwen3_2b_cfg
    language shapes; a mid-size vision tower — language compute dominates
    co-tenancy, and CLIP-ViT-L in the tick supplies the big-ViT load).
    quant="int8": weight-only int8 serving (CLEARCAM_LLM_QUANT=int8's
    production config) — halves each engine step's HBM time, which is
    the per-tick device cost the detector pays for."""
    import jax.numpy as jnp

    from ..models import llm
    from ..models.qwen3vl import Qwen3VL, VisionTower
    from ..serving.vlm import VLMServingEngine
    from ..utils.llm_tokenizer import LLMTokenizer
    from ..utils.tokenizer import byte_encoder
    from .llm_bench import qwen3_2b_cfg

    cfg = qwen3_2b_cfg(blocks, ctx)
    params = llm.init_params(cfg, seed=0, dtype=jnp.bfloat16)
    lang = llm.Transformer(params, cfg, seed=0)
    if quant == "int8":
        lang.quantize_int8()
    kv, vp = VisionTower.init_random(n_blocks=8, width=256, heads=4,
                                     merge_dim=1024, lang_dim=cfg.dim,
                                     grid_side=res // 32, deepstack=(2, 5))
    be = byte_encoder()
    normal = {be[b]: b for b in range(256)}
    specials = {"<|im_start|>": 151644, "<|im_end|>": 151645,
                "<|vision_start|>": 151652, "<|vision_end|>": 151653}
    tok = LLMTokenizer(normal, specials, preset="qwen2", bos_id=None,
                       eos_id=151645)
    qwen = Qwen3VL(res=(res, res), lang=lang, tok=tok,
                   vision=VisionTower(kv, vp))
    return VLMServingEngine(qwen, n_slots=slots, state_dtype=jnp.bfloat16)


def tick_loop(det, dparams, x, dets, tracker, n_ticks, *, clip_fn=None,
              clip_x=None, face_fn=None, face_x=None, engine=None,
              frames=None, prompt="Describe the scene.", steps_per_tick=4):
    """One NVR-tick-shaped loop; returns (per-tick seconds, summary tokens,
    summaries completed). The co-tenant work is dispatched mid-tick exactly
    where the NVR does it (detect dispatch -> host tracking -> object-queue
    drain -> summary engine steps -> detect sync)."""
    lat = []
    toks = done = 0
    inflight: list = []
    for tick in range(n_ticks):
        t0 = time.perf_counter()
        out = det(dparams, x)                       # async device dispatch
        tracker.update_all({c: dets[tick][c] for c in range(x.shape[0])}, 0.3)
        if clip_fn is not None and tick % 3 == 0:
            clip_fn(clip_x)                         # crop embeds (async)
        if face_fn is not None and tick % 5 == 0:
            face_fn(face_x)                         # face detect (async)
        if engine is not None:
            while len([r for r in inflight if not r.done]) < engine.engine.n_slots:
                inflight.append(engine.submit(frames, prompt, max_new=48))
            for _ in range(steps_per_tick):
                if not engine.step():
                    break
        np.asarray(out)                             # tick sync: boxes->host
        lat.append(time.perf_counter() - t0)
        for r in [r for r in inflight if r.done]:
            inflight.remove(r)
            toks += len(r.tokens)
            done += 1
    # don't leave half-generated summaries for the next phase
    if engine is not None:
        deadline = time.time() + 120
        while engine.has_work() and time.time() < deadline:
            engine.step()
        for r in inflight:
            if r.done:
                toks += len(r.tokens)
                done += 1
    return lat, toks, done


def pct(xs, q):
    return sorted(xs)[min(len(xs) - 1, int(len(xs) * q))] * 1e3


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--ticks", type=int, default=150)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--blocks", type=int, default=28)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--vlm-res", type=int, default=448)
    ap.add_argument("--crops", type=int, default=16,
                    help="CLIP crop batch per object-queue drain")
    ap.add_argument("--quant", default="none", choices=["none", "int8"],
                    help="LLM weight quant for the summary engine")
    ap.add_argument("--steps-per-tick", type=int, default=4,
                    dest="steps_per_tick",
                    help="engine scheduler steps per NVR tick (the NVR's "
                         "_advance_summary_engine default is 4; lower = "
                         "tighter detect ticks, slower summaries)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..models import blazeface, clip, yolov9
    from ..track.multicam import MultiCamOCSort
    from bench import synth_tracks  # noqa: E402  (repo-root module)

    rng = np.random.default_rng(0)
    n = args.streams

    # detect: the bench.py graph at batch=streams
    dparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                           yolov9.init_params("t", seed=0))
    det = jax.jit(functools.partial(yolov9.detect, size="t", res=640,
                                    compute_dtype=jnp.bfloat16))
    x = jax.device_put(rng.integers(0, 255, (n, 1080, 1920, 3), np.uint8))

    # co-tenants
    cparams = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                           clip.init_params(seed=0))
    clip_jit = jax.jit(functools.partial(clip.encode_image, normalize=True))
    clip_x = jax.device_put(rng.integers(
        0, 255, (args.crops, 224, 224, 3), np.uint8))
    clip_fn = lambda cx: clip_jit(cparams, cx)          # noqa: E731
    fparams = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                           blazeface.init_params(seed=0))
    face_jit = jax.jit(blazeface.detect)
    face_x = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (256, 256, 3), np.uint8), jnp.float32))
    face_fn = lambda fx: face_jit(fparams, fx)          # noqa: E731

    engine = build_vlm(args.blocks, args.ctx, args.slots, args.vlm_res,
                       quant=args.quant)
    frames = [rng.integers(0, 255, (1080, 1920, 3), np.uint8)
              for _ in range(2)]

    dets = synth_tracks(n, args.ticks + 8)

    def run(label, **kw):
        tracker = MultiCamOCSort(det_thresh=0.3)
        for w in range(5):
            tracker.update_all({c: dets[w][c] for c in range(n)}, 0.3)
        lat, toks, ndone = tick_loop(det, dparams, x, dets[5:], tracker,
                                     args.ticks, **kw)
        # warmup: drop the first 10 ticks (graph/cache warm, engine fill)
        lat = lat[10:]
        dt = sum(lat)
        res = {"p50_ms": round(pct(lat, 0.50), 2),
               "p90_ms": round(pct(lat, 0.90), 2),
               "p99_ms": round(pct(lat, 0.99), 2),
               "streams_at_30fps": round(n * len(lat) / dt / 30.0, 1)}
        if kw.get("engine") is not None:
            res["summary_tok_s"] = round(toks / dt, 1)
            res["summaries_done"] = ndone
        print(json.dumps({label: res}), flush=True)
        return res

    # compile everything before timing (each stage once)
    print("# compiling...", flush=True)
    np.asarray(det(dparams, x))
    np.asarray(clip_fn(clip_x))
    np.asarray(face_fn(face_x))
    r0 = engine.submit(frames, "warm", max_new=4)
    while not r0.done:
        engine.step()
    print("# compiled", flush=True)

    a = run("detect_only")
    b = run("full_cotenancy", clip_fn=clip_fn, clip_x=clip_x,
            face_fn=face_fn, face_x=face_x, engine=engine, frames=frames,
            steps_per_tick=args.steps_per_tick)
    print(json.dumps({
        "metric": "cotenancy_detect_p50_overhead_ms",
        "value": round(b["p50_ms"] - a["p50_ms"], 2),
        "detect_only": a, "full": b,
        "config": {"streams": n, "slots": args.slots,
                   "llm_blocks": args.blocks, "vlm_res": args.vlm_res,
                   "quant": args.quant,
                   "steps_per_tick": args.steps_per_tick}}))
    engine.close()


if __name__ == "__main__":
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    main()
