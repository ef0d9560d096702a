"""POST /generate: LLM text serving over the continuous-batching engine,
driven through the real HTTP server (streamed + non-streamed), matching
solo generation exactly. Beyond the reference surface — its LLM only runs
inside alert summaries (clearcam.py:494); this is the rebuild's serving
daemon endpoint (tools/serve_llm.py)."""
import json
import urllib.request

import pytest

from clearcam_tpu.models import llm
from clearcam_tpu.serving import ServingEngine, TextServing
from clearcam_tpu.server.http import AppContext, serve
from clearcam_tpu.utils.db import KVStore

from test_llm import tiny_cfg


class TinyTok:
    """Minimal tokenizer over the tiny model's 64-id vocab (deterministic,
    invertible enough: decode is injective per id)."""
    eos_id = 0
    eot_id = None

    def encode(self, s):
        return [1 + (ord(c) % 60) for c in s]

    def decode(self, ids):
        return "".join(chr(33 + (i % 90)) for i in ids)

    def is_end(self, t):
        return t == self.eos_id

    def role(self, r):
        return self.encode("<" + r + ">")

    def end_turn(self):
        return [self.eos_id]

    def prefix(self):
        return []


@pytest.fixture(scope="module")
def served():
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=2).start()
    gen = TextServing(eng, TinyTok())
    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_gen_test", gen=gen)
    server = serve(ctx, port=0)
    yield f"http://127.0.0.1:{server.server_address[1]}", gen, params, cfg
    server.shutdown()
    eng.close()


def _solo_text(gen, params, cfg, prompt, max_new):
    ids = gen.encode_prompt(prompt)
    toks, tok = [], TinyTok()
    for t in llm.Transformer(params, cfg, seed=0).generate(
            ids, temperature=0.0, max_new=max_new):
        toks.append(t)
        if tok.is_end(t):
            break
    while toks and tok.is_end(toks[-1]):
        toks.pop()
    return tok.decode(toks)


def _post(url, body):
    req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                 method="POST")
    return urllib.request.urlopen(req, timeout=60)


def test_generate_matches_solo(served):
    url, gen, params, cfg = served
    want = _solo_text(gen, params, cfg, "hi cam", 8)
    with _post(f"{url}/generate",
               {"prompt": "hi cam", "max_new": 8}) as r:
        out = json.loads(r.read())
    assert out["text"] == want and out["tokens"] >= len(want)


def test_generate_stream_matches_plain(served):
    url, gen, params, cfg = served
    want = _solo_text(gen, params, cfg, "stream me", 8)
    with _post(f"{url}/generate", {"prompt": "stream me", "max_new": 8,
                                   "stream": True}) as r:
        # urllib de-chunks transfer-encoding: chunked transparently
        body = r.read().decode()
    assert body == want


def test_generate_concurrent_requests(served):
    """Two clients in flight land on different slots and each gets its
    exact solo output (the engine interleaves their decode)."""
    import threading
    url, gen, params, cfg = served
    outs = {}

    def go(p):
        with _post(f"{url}/generate", {"prompt": p, "max_new": 6}) as r:
            outs[p] = json.loads(r.read())["text"]

    ts = [threading.Thread(target=go, args=(p,))
          for p in ("alpha", "beta!")]
    [t.start() for t in ts]
    [t.join(60) for t in ts]
    for p in ("alpha", "beta!"):
        assert outs[p] == _solo_text(gen, params, cfg, p, 6)


def test_generate_unconfigured_503(tmp_path):
    ctx = AppContext(KVStore(tmp_path / "kv.db"), tmp_path, gen=None)
    server = serve(ctx, port=0)
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"http://127.0.0.1:{server.server_address[1]}/generate",
                  {"prompt": "x"})
        assert e.value.code == 503
    finally:
        server.shutdown()


def test_generate_backpressure_503():
    """Admission backpressure surfaces as HTTP 503 + Retry-After (the
    engine's QueueFull), not a hung request."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=1, max_waiting=8).start()
    gen = TextServing(eng, TinyTok())
    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_gen_bp", gen=gen)
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        # occupy the single slot so the next submit must queue -> 503
        first = urllib.request.urlopen(urllib.request.Request(
            f"{url}/generate", method="POST",
            data=json.dumps({"prompt": "aaaa", "max_new": 2}).encode()),
            timeout=60)
        assert first.status == 200
        eng.max_waiting = 0          # force: queue len >= 0 always trips
        req = urllib.request.Request(
            f"{url}/generate", method="POST",
            data=json.dumps({"prompt": "bbbb", "max_new": 2}).encode())
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected HTTP 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503 and e.headers.get("Retry-After")
    finally:
        server.shutdown()
        eng.close()
