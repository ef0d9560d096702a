"""A/B the ViT attention kernel (XLA vs Pallas flash) on the Qwen3-VL
vision tower at production-like shapes.

Context: round 5 measured the flash kernel 2x SLOWER than XLA attention
end-to-end on the CLIP tower (T=257 pads to 384; see PERF.md "Ceiling
estimate REFUTED"). But the Qwen3-VL tower runs much longer sequences
(448^2 -> T=784, 640^2 -> T=1600) where XLA's f32 [1,H,T,T] score
round-trip grows quadratically — the regime the kernel was wired for
(models/qwen3vl.py:149-153). This probe decides the selection policy
with full-tower timings at both resolutions.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/vit_flash_ab.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from clearcam_tpu.models.qwen3vl import VisionTower

    # production-like tower: Qwen3-VL mmproj-class width/depth (head_dim 64
    # keeps both kernels on their fast paths)
    kv, vp = VisionTower.init_random(n_blocks=24, width=1024, heads=16,
                                     merge_dim=4096, lang_dim=2048,
                                     grid_side=16, deepstack=(5, 11, 17))
    print(f"# tower: 24 blocks, width 1024, heads 16, backend "
          f"{jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    for res in (448, 640):
        img = jnp.asarray(rng.uniform(0, 255, (res, res, 3)).astype(np.float32))
        t_tokens = (res // 16) ** 2
        row = {"res": res, "tokens": t_tokens}
        for flash in (0, 1):
            os.environ["CLEARCAM_VIT_FLASH"] = str(flash)
            tower = VisionTower(kv, vp, dtype=jnp.bfloat16)

            @jax.jit
            def step(p, im, _t=tower):
                x, deep = _t.apply(p, im)
                return x.sum() + sum(jnp.sum(d) for d in jax.tree_util
                                     .tree_leaves(deep))

            np.asarray(step(tower.p, img))             # compile + warm
            n = 12
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = step(tower.p, img)
            np.asarray(out)                            # queue-drain sync
            ms = (time.perf_counter() - t0) / n * 1e3
            row["flash_ms" if flash else "xla_ms"] = round(ms, 2)
        row["flash_speedup"] = round(row["xla_ms"] / row["flash_ms"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
