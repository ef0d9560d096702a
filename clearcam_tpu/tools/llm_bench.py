"""LLM serving micro-benchmark: prefill + decode tok/s on the current device.

Builds a Qwen3-2B-class dense transformer with random weights (published
checkpoints aren't downloadable in the build sandbox; throughput depends on
shapes, not values) and measures:

  * chunked prefill tok/s at a given context length
  * decode tok/s for the bf16 path
  * decode tok/s for the weight-only int8 path (ops/quant_matmul) and/or
    the Pallas prefix-aware decode attention (ops/decode_attention)

Timing uses queue-drain (issue N steps, materialize the last) so the axon
tunnel's async dispatch doesn't hide or inflate device time — see
CLAUDE.md "Environment gotchas".

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -m clearcam_tpu.tools.llm_bench \
        [--blocks 28] [--ctx 2048] [--steps 64] [--modes bf16,int8,int8+pallas]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llm


def qwen3_2b_cfg(blocks: int, ctx: int) -> llm.TransformerConfig:
    """Qwen3-1.7B/2B-class dense shapes (llama.cpp qwen3 conventions)."""
    return llm.TransformerConfig(
        num_blocks=blocks, dim=2048, hidden_dim=6144, n_heads=16,
        n_kv_heads=8, norm_eps=1e-6, vocab_size=151936, head_dim=128,
        rope_theta=1e6, rope_dim=128, v_head_dim=128, max_context=ctx,
        qk_norm=128)


def qwen3_next_cfg(blocks: int, ctx: int) -> llm.TransformerConfig:
    """Qwen3-Next-class hybrid shapes: GatedDeltaNet linear-attention
    blocks with every 4th block full attention (the reference's SSM
    family, utils/model.py GatedDeltaNet) — used to measure the
    recurrent-stack serving paths (scan-based batched prefill)."""
    return llm.TransformerConfig(
        num_blocks=blocks, dim=2048, hidden_dim=5120, n_heads=16,
        n_kv_heads=4, norm_eps=1e-6, vocab_size=151936, head_dim=128,
        rope_theta=1e6, rope_dim=64, v_head_dim=128, max_context=ctx,
        qk_norm=128, full_attention_interval=4,
        ssm=llm.SSMConfig(conv_kernel=4, state_size=128, group_count=16,
                          time_step_rank=32, inner_size=4096))


def bench_mode(cfg, params, mode: str, ctx: int, steps: int,
               decode_pos: int | None = None) -> dict:
    """mode: '+'-joined flags — bf16|int8|int4 (weights), kv16 (bf16 KV
    cache), kv8 (int8 KV cache + per-token scales), pallas (prefix-aware
    decode attention; composes with kv8)."""
    flags = set(mode.split("+"))
    prefill, decode = llm.make_step_fns(
        cfg, use_pallas_decode="pallas" in flags, kv_quant="kv8" in flags)
    if "int8" in flags:
        params = llm.quantize_params_int8(params)
    elif "int4" in flags:
        params = llm.quantize_params_int4(params)
    state = llm.init_state(cfg, dtype=jnp.bfloat16 if "kv16" in flags
                           else jnp.float32, kv_quant="kv8" in flags)
    key = jax.random.PRNGKey(0)
    temp = jnp.float32(0.0)
    chunk = llm.CHUNK
    toks = jnp.zeros((1, chunk), jnp.int32)

    # --- prefill: fill ctx-64 positions in CHUNK-sized steps -------------
    n_chunks = max(1, (ctx - 64) // chunk)
    tok, state = prefill(params, state, toks, 0, jnp.int32(chunk), temp, key)
    np.asarray(tok)  # compile + sync
    state0 = state
    t0 = time.perf_counter()
    for i in range(1, n_chunks):
        tok, state = prefill(params, state, toks, i * chunk,
                             jnp.int32(chunk), temp, key)
    np.asarray(tok)
    dt = time.perf_counter() - t0
    prefill_tps = (n_chunks - 1) * chunk / dt if n_chunks > 1 else float("nan")

    # --- decode: steps single-token steps at the live position -----------
    # decode_pos overrides the live position: short positions are the NVR's
    # actual regime (context resets per event, reference clearcam.py:494) and
    # where the prefix-aware Pallas kernel's reads-scale-with-context wins
    pos = decode_pos if decode_pos is not None else n_chunks * chunk
    one = jnp.zeros((1, 1), jnp.int32)
    tok, state = decode(params, state0, one, pos, temp, key)
    np.asarray(tok)  # compile + sync
    t0 = time.perf_counter()
    st = state0
    for i in range(steps):
        tok, st = decode(params, st, one, pos + i, temp, key)
    np.asarray(tok)
    dt = time.perf_counter() - t0
    return {"mode": mode, "prefill_tok_s": round(prefill_tps, 1),
            "decode_tok_s": round(steps / dt, 1)}


def bench_batched(cfg, params, batches, steps: int, pos: int = 256,
                  pallas: bool = False):
    """Device-side batched-decode ladder (generate_batch's decode step):
    aggregate tok/s for each batch size, queue-drain timed. pallas=True
    routes attention through ops/decode_attention.decode_attention_batch
    (per-row prefix windows) instead of the XLA full-cache einsum."""
    from ..models import llm

    freqs = jnp.asarray(llm.precompute_freqs(
        cfg.rope_dim, cfg.max_context, cfg.rope_theta))

    attn_impl = None
    if pallas:
        from ..ops.decode_attention import decode_attention_batch

        def attn_impl(q, st, start_pos, pads):
            out = decode_attention_batch(q[:, :, 0], st["k"], st["v"],
                                         start_pos, pads)
            return out[:, :, None]

    @jax.jit
    def decode(params_, state, token, start_pos, pads):
        hidden, state = llm.forward(params_, cfg, state, token, start_pos,
                                    freqs, pad_start=pads,
                                    decode_attn=attn_impl)
        return (jnp.argmax(llm.logits_at(params_, cfg, hidden,
                                         jnp.int32(0)), -1), state)

    out = []
    for b in batches:
        state = llm.init_state(cfg, batch=b, dtype=jnp.bfloat16)
        tok = jnp.zeros((b, 1), jnp.int32)
        pads = jnp.zeros((b,), jnp.int32)
        t, _ = decode(params, state, tok, pos, pads)
        np.asarray(t)
        t0 = time.perf_counter()
        last = None
        st = state
        for i in range(steps):
            last, st = decode(params, st, tok, pos + i, pads)
        np.asarray(last)
        dt = time.perf_counter() - t0
        r = {"batch": b, "pos": pos, "pallas": pallas,
             "decode_tok_s": round(steps * b / dt, 1),
             "per_stream": round(steps / dt, 1)}
        out.append(r)
        print(json.dumps(r))
    return out


def bench_serving(cfg, params, n_slots: int, n_requests: int,
                  prompt_len: int, max_new: int, pallas: bool = False,
                  shared_prefix: int = 0, prefix_cache: bool = True,
                  fetch_every: int = 4, prefill_batch: bool = True,
                  spec: int = 0, loop_prompts: int = 0,
                  constraint: bool = False):
    """Continuous-batching engine throughput (serving/engine.py): submit
    n_requests with staggered prompt lengths (heterogeneous live positions
    — the serving steady state), drive the scheduler to drain, report
    aggregate generated tok/s including prefill+scheduling overheads.
    Compare against the --modes B=1 decode rate (sequential serving) and
    the --decode-batch ladder (lock-step batch, no admission overhead)."""
    from ..serving import ServingEngine

    rng = np.random.default_rng(0)
    cons = None
    if constraint:
        # json grammar over the synthetic ASCII vocab: measures what
        # response_format json_object costs at the full vocab width (the
        # [B, V] int16 row gather + mask per step, table resident in HBM)
        from ..serving.constrain import json_char_dfa, token_table
        from .serve_llm import _AsciiTok
        t0 = time.perf_counter()
        tc = token_table(json_char_dfa(4),
                         _AsciiTok(cfg.vocab_size).vocab_bytes(), [0],
                         cfg.vocab_size)
        print(json.dumps({"constraint_table": True,
                          "states": int(tc.trans.shape[0]),
                          "mb": round(tc.trans.nbytes / 1e6, 1),
                          "build_s": round(time.perf_counter() - t0, 2)}))
        cons = {"json": tc}
    eng = ServingEngine(params, cfg, n_slots=n_slots,
                        state_dtype=jnp.bfloat16, use_pallas_decode=pallas,
                        prefix_cache=prefix_cache, fetch_every=fetch_every,
                        prefill_batch=prefill_batch, spec_lookup=spec,
                        constraints=cons)
    # stagger lengths +-25% so slots sit at different absolute positions
    lens = [max(8, int(prompt_len * f))
            for f in rng.uniform(0.75, 1.25, n_requests)]
    # shared_prefix: every request opens with the same N tokens (the NVR
    # summary preamble / a serving system prompt) — with prefix_cache the
    # engine skips re-prefilling it after each slot's first occupant
    pre = rng.integers(1, cfg.vocab_size - 1, shared_prefix).tolist()
    if loop_prompts:
        # loop-prompts k: each prompt is a k-token pattern repeated — the
        # upper-bound regime for prompt-lookup drafting (speedup is
        # content-dependent; random prompts bound it from below)
        prompts = []
        for n in lens:
            pat = rng.integers(1, cfg.vocab_size - 1, loop_prompts).tolist()
            prompts.append(pre + (pat * (max(1, n - shared_prefix)
                                         // loop_prompts + 1))
                           [:max(1, n - shared_prefix)])
    else:
        prompts = [pre + rng.integers(1, cfg.vocab_size - 1,
                                      max(1, n - shared_prefix)).tolist()
                   for n in lens]

    # warm all three graphs outside the timed region: a solo submit
    # (prefill_slot + decode_all), then two concurrent submits so the
    # batched prefill_many graph compiles too (it only runs when >=2
    # slots are mid-prefill on the same tick)
    w = eng.submit(prompts[0][:8], max_new=2)
    eng.run_until_idle()
    assert w.done
    if n_slots >= 2:
        w2 = [eng.submit([3, 1, 4, 1, 5], max_new=2),
              eng.submit([2, 7, 1, 8], max_new=2)]
        eng.run_until_idle()
        assert all(r.done for r in w2)

    t0 = time.perf_counter()
    kw = {"constraint": "json", "eos_id": 0, "temperature": 1.0} \
        if constraint else {}
    reqs = [eng.submit(p, max_new=max_new, **kw) for p in prompts]
    eng.run_until_idle()
    dt = time.perf_counter() - t0
    total = sum(len(r.tokens) for r in reqs)
    assert all(r.done for r in reqs)
    r = {"serving": True, "n_slots": n_slots, "n_requests": n_requests,
         "constraint": constraint,
         "prompt_len": prompt_len, "max_new": max_new, "pallas": pallas,
         "shared_prefix": shared_prefix, "fetch_every": fetch_every,
         "prefill_batch": prefill_batch, "spec": spec,
         "prefill_batched_steps": eng.stats["prefill_batched_steps"],
         "reused_tokens": eng.stats["reused_tokens"],
         "prefill_tokens": eng.stats["prefill_tokens"],
         "wall_s": round(dt, 2), "generated": total,
         "agg_tok_s": round(total / dt, 1),
         "prefill_tok_s_incl": round(sum(len(p) for p in prompts) / dt, 1)}
    ttfts = [q.ttft_s for q in reqs if q.ttft_s is not None]
    tpots = [q.tpot_s for q in reqs if q.tpot_s is not None]
    if ttfts:
        r["ttft_ms_mean"] = round(1e3 * sum(ttfts) / len(ttfts), 1)
    if tpots:
        r["tpot_ms_mean"] = round(1e3 * sum(tpots) / len(tpots), 2)
    if spec:
        # emitted per verify window (incl. junk-epoch windows in the
        # denominator): the speculative multiplier actually realized
        r["tokens_per_window"] = round(
            eng.stats["spec_emitted"] / max(1, eng.stats["decode_steps"]), 2)
    print(json.dumps(r))
    return r


def bench_score(cfg, params, length: int):
    """Teacher-forcing scoring throughput (llm.make_score_fn — the
    /v1/completions echo / max_tokens=0 loglikelihood surface): scored
    tok/s over one full walk of a random ``length``-token prompt. The
    walk materializes per chunk (the API returns host floats), so through
    the axon tunnel the number includes one small readback per CHUNK —
    the true cost a scoring client sees."""
    score = llm.make_score_fn(cfg)
    rng = np.random.default_rng(0)
    toks = rng.integers(1, cfg.vocab_size - 1, length).tolist()
    score(params, toks)                       # compile + warm
    t0 = time.perf_counter()
    rows = score(params, toks)
    dt = time.perf_counter() - t0
    assert len(rows) == length - 1
    r = {"score": True, "length": length,
         "score_tok_s": round(length / dt, 1), "wall_s": round(dt, 3)}
    print(json.dumps(r))
    return r


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=28)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--modes", default="bf16,int8,int8+kv16")
    ap.add_argument("--decode-pos", type=int, default=None,
                    help="decode at this live position instead of ctx-64 "
                         "(short positions = the NVR's per-event regime)")
    ap.add_argument("--decode-batch", default=None,
                    help="comma list of batch sizes: run the batched-decode "
                         "ladder (generate_batch's step) instead of --modes")
    ap.add_argument("--pallas", action="store_true",
                    help="with --decode-batch/--serving: use the batched "
                         "Pallas prefix kernel instead of the XLA einsum")
    ap.add_argument("--serving", action="store_true",
                    help="continuous-batching engine throughput "
                         "(serving/engine.py) under staggered requests")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--max-new", type=int, default=48)
    ap.add_argument("--shared-prefix", type=int, default=0,
                    help="with --serving: every prompt opens with the same "
                         "N tokens (prefix-cache reuse regime)")
    ap.add_argument("--no-prefix-cache", action="store_true",
                    help="with --serving: disable slot prefix reuse")
    ap.add_argument("--spec", type=int, default=0,
                    help="with --serving: speculative decoding with "
                         "G-token device-drafted verify windows")
    ap.add_argument("--loop-prompts", type=int, default=0,
                    help="with --serving: k-token repeated-pattern prompts "
                         "(prompt-lookup's upper-bound regime)")
    ap.add_argument("--json", action="store_true",
                    help="with --serving: every request runs under the "
                         "json grammar constraint (response_format "
                         "json_object cost at full vocab width)")
    ap.add_argument("--score", type=int, default=0,
                    help="measure teacher-forcing scoring tok/s "
                         "(make_score_fn) over an N-token prompt instead "
                         "of --modes")
    ap.add_argument("--ssm", action="store_true",
                    help="use the Qwen3-Next-class hybrid (GatedDeltaNet "
                         "+ every-4th-block attention) instead of the "
                         "dense config; weights stay bf16")
    ap.add_argument("--no-prefill-batch", action="store_true",
                    help="with --serving: disable the batched multi-slot "
                         "prefill (one prefill_slot dispatch per slot per "
                         "chunk — the admission-cost baseline)")
    args = ap.parse_args(argv)

    cfg = (qwen3_next_cfg(args.blocks, args.ctx) if args.ssm
           else qwen3_2b_cfg(args.blocks, args.ctx))
    params = llm.init_params(cfg, seed=0, dtype=jnp.bfloat16)
    n_params = sum(int(np.prod(v.shape)) for v in params.values())
    print(f"# {args.blocks} blocks, {n_params/1e9:.2f}B params, "
          f"ctx {args.ctx}, backend {jax.default_backend()}")
    if args.score:
        return bench_score(cfg, params, args.score)
    if args.serving:
        if not args.ssm:              # int8 weight-only: matmul params
            params = llm.quantize_params_int8(params)
        return bench_serving(cfg, params, args.slots, args.requests,
                             args.prompt_len, args.max_new,
                             pallas=args.pallas,
                             shared_prefix=args.shared_prefix,
                             prefix_cache=not args.no_prefix_cache,
                             prefill_batch=not args.no_prefill_batch,
                             spec=args.spec, loop_prompts=args.loop_prompts,
                             constraint=args.json)
    if args.decode_batch:
        params = llm.quantize_params_int8(params)
        return bench_batched(cfg, params,
                             [int(b) for b in args.decode_batch.split(",")],
                             args.steps,
                             pos=(args.decode_pos if args.decode_pos
                                  is not None else 256),
                             pallas=args.pallas)
    results = []
    for mode in args.modes.split(","):
        r = bench_mode(cfg, params, mode.strip(), args.ctx, args.steps,
                       decode_pos=args.decode_pos)
        results.append(r)
        print(json.dumps(r))
    return results


if __name__ == "__main__":
    main()
