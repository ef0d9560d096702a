"""Standalone LLM serving daemon: GGUF in, POST /generate out.

Runs the continuous-batching engine (serving/engine.py) behind the HTTP
server's /generate endpoint, with no NVR attached — the "just serve a
model" deployment. Requests from any number of clients join the running
batch at chunk granularity, share one KV cache, and can reuse common
prompt prefixes (serving/engine.py prefix_cache).

The reference has no serving daemon — its LLM only runs inside alert
summaries on the NVR main loop (clearcam.py:494-496,1214-1226); this is
the rebuild's production-serving surface over the same model runtime.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -m clearcam_tpu.tools.serve_llm \
        --gguf model.gguf [--ctx 8192] [--slots 8] [--port 8081] \
        [--int8] [--kv-quant] [--pallas | --spec G] [--api-token SECRET]

    curl -N -X POST localhost:8081/generate \
        -d '{"prompt": "hello", "max_new": 64, "stream": true}'

The OpenAI-compatible surface is served too — point any OpenAI SDK
client at the same port (server/http._post_openai):

    curl localhost:8081/v1/chat/completions -d '{"messages": \
        [{"role": "user", "content": "hi"}], "max_tokens": 64}'
    # also /v1/completions (+"stream": true SSE) and GET /v1/models;
    # --api-token is accepted as "Authorization: Bearer <token>"
"""
from __future__ import annotations

import argparse
import os
from pathlib import Path


class _AsciiTok:
    """Byte-level stand-in tokenizer for --synthetic runs (random weights
    produce token ids, not language; this maps them to printable ASCII so
    the serving path is drivable end-to-end without a checkpoint)."""
    eos_id, eot_id = 0, None

    def __init__(self, vocab: int):
        self.vocab = vocab

    def encode(self, s):
        return [1 + (ord(c) % min(self.vocab - 1, 94)) for c in s]

    def decode(self, ids):
        return "".join(chr(33 + (int(i) % 94)) for i in ids)

    def is_end(self, t):
        return t == self.eos_id

    def role(self, r):
        return self.encode("<" + r + ">")

    def end_turn(self):
        return [self.eos_id]

    def prefix(self):
        return []

    def vocab_bytes(self):
        """Byte view of the synthetic vocab (id -> one printable ASCII
        byte, same mapping as decode) so grammar-constrained decoding is
        drivable on synthetic runs too (the printable range includes the
        whole JSON alphabet)."""
        return [None] + [bytes([33 + (i % 94)])
                         for i in range(1, self.vocab)]


def build_engine(args):
    import jax.numpy as jnp

    from ..models import llm
    from ..serving import ServingEngine, TextServing

    if args.synthetic:
        # random weights at Qwen3-2B-class shapes (llm_bench's config):
        # exercises the full serving path on real hardware when no
        # checkpoint is downloadable
        from .llm_bench import qwen3_2b_cfg
        cfg = qwen3_2b_cfg(args.blocks, args.ctx)
        params = llm.init_params(cfg, seed=0, dtype=jnp.bfloat16)
        if args.int8:
            params = llm.quantize_params_int8(params)
        tok = _AsciiTok(cfg.vocab_size)
    else:
        from ..utils.llm_tokenizer import LLMTokenizer
        model, kv = llm.Transformer.from_gguf(
            args.gguf, max_context=args.ctx, quantize=args.int8)
        cfg, params = model.cfg, model.params
        tok = LLMTokenizer.from_gguf_kv(kv)
    constraints = None
    if args.json_depth > 0 and not args.spec:
        # register the JSON grammar (OpenAI response_format json_object):
        # one [S, V] int16 table on device; ~0.2 MB per state at a 151k
        # vocab, so depth 4 (~630 states) costs ~190 MB HBM — tunable
        import time as _t

        from ..serving.constrain import (json_token_constraint,
                                         token_table, json_char_dfa)
        t0 = _t.monotonic()
        if hasattr(tok, "normal"):
            tc = json_token_constraint(tok, cfg.vocab_size,
                                       max_depth=args.json_depth)
        else:                                  # synthetic ASCII tokenizer
            tc = token_table(json_char_dfa(args.json_depth),
                             tok.vocab_bytes(), [tok.eos_id],
                             n_vocab=cfg.vocab_size)
        constraints = {"json": tc}
        print(f"json constraint: {tc.trans.shape[0]} states x "
              f"{tc.trans.shape[1]} vocab "
              f"({tc.trans.nbytes / 1e6:.0f} MB, "
              f"built in {_t.monotonic() - t0:.1f}s)")
    engine_kw = dict(n_slots=args.slots,
                     state_dtype=jnp.bfloat16, kv_quant=args.kv_quant,
                     use_pallas_decode=args.pallas,
                     sync_lag=args.sync_lag, fetch_every=args.fetch_every,
                     max_waiting=args.max_waiting, spec_lookup=args.spec,
                     max_restarts=args.max_restarts,
                     constraints=constraints,
                     constraint_rows=0 if args.spec
                     else args.constraint_rows)
    if args.mesh > 1:
        # tensor/expert-parallel serving over the first N chips: weights +
        # KV cache split over the mesh's "model" axis, the prefill/decode
        # graphs GSPMD-partition over ICI (parallel/mesh.serving_engine_tp)
        from ..parallel import mesh as pmesh
        eng = pmesh.serving_engine_tp(
            params, cfg, pmesh.make_mesh(args.mesh, data=1), **engine_kw)
    else:
        eng = ServingEngine(params, cfg, **engine_kw)
    return TextServing(eng, tok)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--gguf", type=Path, default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="serve a random-weight 2B-class model (no GGUF "
                         "needed; ASCII stand-in tokenizer)")
    ap.add_argument("--blocks", type=int, default=28)
    ap.add_argument("--ctx", type=int, default=8192)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--port", type=int, default=8081)
    ap.add_argument("--data", type=Path, default=Path("data"))
    ap.add_argument("--int8", action="store_true",
                    help="int8 weight-only serving (ops/quant_matmul)")
    ap.add_argument("--kv-quant", action="store_true",
                    help="int8 KV cache (half the decode HBM reads)")
    ap.add_argument("--pallas", action="store_true",
                    help="prefix-aware Pallas decode attention")
    ap.add_argument("--spec", type=int, default=0,
                    help="speculative decoding: G-token device-drafted "
                         "verify windows (greedy requests; excludes "
                         "--pallas)")
    ap.add_argument("--sync-lag", type=int, default=4, dest="sync_lag",
                    help="decode steps tokens materialize late (pipeline "
                         "depth; 0 = synchronous, adds an RTT per step)")
    ap.add_argument("--fetch-every", type=int, default=4,
                    dest="fetch_every",
                    help="decode steps per batched [k,B] token readback "
                         "(amortizes host round trips; raise on slow links)")
    ap.add_argument("--max-waiting", type=int, default=64,
                    dest="max_waiting",
                    help="admission queue bound; overloaded requests get "
                         "HTTP 503 + Retry-After instead of piling up")
    ap.add_argument("--max-restarts", type=int, dest="max_restarts",
                    default=int(os.environ.get(
                        "CLEARCAM_SERVING_RESTARTS", "3")),
                    help="scheduler crash recoveries allowed per 10-min "
                         "window before the engine fails loudly (slot "
                         "state reset + requeue-or-fail; 0 = fail-loud "
                         "on first crash)")
    ap.add_argument("--json-depth", type=int, default=4, dest="json_depth",
                    help="max JSON nesting for response_format "
                         "json_object (grammar-constrained decoding; "
                         "0 disables — saves the [S, V] table's HBM)")
    ap.add_argument("--constraint-rows", type=int, default=512,
                    dest="constraint_rows",
                    help="device table rows reserved for grammars "
                         "registered at runtime (response_format "
                         "json_schema / guided_choice; ~0.3 MB per row "
                         "at a 151k vocab; 0 disables)")
    ap.add_argument("--api-token", default=None)
    ap.add_argument("--mesh", type=int,
                    default=int(os.environ.get("CLEARCAM_MESH", "0") or 0),
                    help="tensor-parallel the model over the first N chips "
                         "(weights + KV split over ICI; 0/1 = single device)")
    args = ap.parse_args(argv)
    assert args.gguf is not None or args.synthetic, \
        "--gguf PATH or --synthetic required"

    gen = build_engine(args)
    gen.engine.start()                       # own scheduler thread

    from ..server.http import AppContext, serve
    from ..utils.db import KVStore
    ctx = AppContext(KVStore(args.data / "cc_cache.db"), args.data,
                     gen=gen, api_token=args.api_token,
                     served_model=(args.gguf.stem if args.gguf
                                   else "clearcam-synthetic"))
    print(f"LLM serving on :{args.port} "
          f"({args.slots} slots, ctx {args.ctx})")
    try:
        serve(ctx, port=args.port, background=False)
    except KeyboardInterrupt:
        gen.engine.close()


if __name__ == "__main__":
    main()
