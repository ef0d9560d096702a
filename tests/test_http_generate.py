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


# --- OpenAI-compatible surface (/v1/*) -----------------------------------

def test_openai_models(served):
    url, *_ = served
    out = json.loads(urllib.request.urlopen(f"{url}/v1/models",
                                            timeout=30).read())
    assert out["object"] == "list" and out["data"][0]["id"]


def test_openai_completions_matches_solo(served):
    """/v1/completions with temperature 0 returns the raw (unframed)
    solo greedy text plus OpenAI-shaped metadata."""
    url, gen, params, cfg = served
    ids = gen.encode_prompt("open ai", raw=True)
    toks, tok = [], TinyTok()
    for t in llm.Transformer(params, cfg, seed=0).generate(
            ids, temperature=0.0, max_new=8):
        toks.append(t)
        if tok.is_end(t):
            break
    while toks and tok.is_end(toks[-1]):
        toks.pop()
    want = tok.decode(toks)
    with _post(f"{url}/v1/completions",
               {"prompt": "open ai", "max_tokens": 8,
                "temperature": 0}) as r:
        out = json.loads(r.read())
    assert out["object"] == "text_completion"
    assert out["choices"][0]["text"] == want
    assert out["choices"][0]["finish_reason"] in ("stop", "length")
    assert out["usage"]["prompt_tokens"] == len(ids)
    assert out["usage"]["total_tokens"] == (len(ids)
                                            + out["usage"]
                                            ["completion_tokens"])


def test_openai_chat_matches_message_framing(served):
    """/v1/chat/completions frames the message history exactly like
    TextServing.encode_messages and returns the assistant message."""
    url, gen, params, cfg = served
    msgs = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hello"}]
    ids = gen.encode_messages(msgs)
    toks, tok = [], TinyTok()
    for t in llm.Transformer(params, cfg, seed=0).generate(
            ids, temperature=0.0, max_new=6):
        toks.append(t)
        if tok.is_end(t):
            break
    while toks and tok.is_end(toks[-1]):
        toks.pop()
    want = tok.decode(toks)
    with _post(f"{url}/v1/chat/completions",
               {"messages": msgs, "max_tokens": 6, "temperature": 0}) as r:
        out = json.loads(r.read())
    assert out["object"] == "chat.completion"
    m = out["choices"][0]["message"]
    assert m["role"] == "assistant" and m["content"] == want


def _sse_events(body: str):
    return [line[6:] for line in body.split("\n")
            if line.startswith("data: ")]


def test_openai_chat_stream(served):
    """SSE streaming: role preamble chunk, content deltas that concatenate
    to the non-streamed answer, a finish_reason chunk, then [DONE]."""
    url, gen, params, cfg = served
    msgs = [{"role": "user", "content": "stream chat"}]
    with _post(f"{url}/v1/chat/completions",
               {"messages": msgs, "max_tokens": 6, "temperature": 0}) as r:
        want = json.loads(r.read())["choices"][0]["message"]["content"]
    with _post(f"{url}/v1/chat/completions",
               {"messages": msgs, "max_tokens": 6, "temperature": 0,
                "stream": True}) as r:
        events = _sse_events(r.read().decode())
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    text = "".join(c["choices"][0]["delta"].get("content", "")
                   for c in chunks)
    assert text == want
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")


def test_openai_completions_stream_and_stop(served):
    """Completions streaming concatenates to the plain result; a stop
    sequence truncates the text before it and reports finish 'stop'."""
    url, gen, params, cfg = served
    body = {"prompt": "sss", "max_tokens": 8, "temperature": 0}
    with _post(f"{url}/v1/completions", body) as r:
        plain = json.loads(r.read())["choices"][0]["text"]
    with _post(f"{url}/v1/completions", {**body, "stream": True}) as r:
        events = _sse_events(r.read().decode())
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert "".join(c["choices"][0]["text"] for c in chunks) == plain
    # stream_options.include_usage: final pre-[DONE] chunk carries usage
    with _post(f"{url}/v1/completions",
               {**body, "stream": True,
                "stream_options": {"include_usage": True}}) as r:
        ev2 = _sse_events(r.read().decode())
    last = json.loads(ev2[-2])
    assert last["choices"] == [] and last["usage"]["completion_tokens"] > 0
    assert last["usage"]["total_tokens"] == (
        last["usage"]["prompt_tokens"] + last["usage"]["completion_tokens"])
    if len(plain) >= 2:           # stop on a substring the answer contains
        stop = plain[1]
        with _post(f"{url}/v1/completions", {**body, "stop": stop}) as r:
            out = json.loads(r.read())
        assert out["choices"][0]["text"] == plain[:plain.find(stop)]
        assert out["choices"][0]["finish_reason"] == "stop"


def test_openai_rejects_streamed_multi_choice(served):
    """Non-streamed n>1 is supported (each choice its own engine
    request — see test_sampling.test_http_openai_logit_bias_and_n);
    streaming still requires n=1."""
    url, *_ = served
    try:
        _post(f"{url}/v1/completions",
              {"prompt": "x", "n": 2, "stream": True})
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_openai_bearer_auth():
    """Authorization: Bearer satisfies --api-token (OpenAI SDK clients)."""
    cfg = tiny_cfg(max_context=96)
    params = llm.init_params(cfg, seed=4)
    eng = ServingEngine(params, cfg, n_slots=1).start()
    gen = TextServing(eng, TinyTok())
    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_gen_auth", gen=gen,
                     api_token="sekret")
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        body = json.dumps({"prompt": "x", "max_tokens": 2,
                           "temperature": 0}).encode()
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"{url}/v1/completions", data=body, method="POST"),
                timeout=30)
            raise AssertionError("expected HTTP 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401
        r = urllib.request.urlopen(urllib.request.Request(
            f"{url}/v1/completions", data=body, method="POST",
            headers={"Authorization": "Bearer sekret"}), timeout=60)
        assert r.status == 200
    finally:
        server.shutdown()
        eng.close()


def test_responses_api_matches_chat(served):
    """/v1/responses (string input + instructions) produces the same text
    as /v1/chat/completions over the equivalent message list, with the
    Responses object shape (output message item, usage, status)."""
    url, gen, params, cfg = served
    msgs = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hello"}]
    with _post(f"{url}/v1/chat/completions",
               {"messages": msgs, "max_tokens": 6, "temperature": 0}) as r:
        want = json.loads(r.read())["choices"][0]["message"]["content"]
    with _post(f"{url}/v1/responses",
               {"input": "hello", "instructions": "be brief",
                "max_output_tokens": 6, "temperature": 0}) as r:
        out = json.loads(r.read())
    assert out["object"] == "response"
    assert out["status"] in ("completed", "incomplete")
    item = out["output"][0]
    assert item["type"] == "message" and item["role"] == "assistant"
    assert item["content"][0]["type"] == "output_text"
    assert item["content"][0]["text"] == want
    assert out["usage"]["total_tokens"] == (out["usage"]["input_tokens"]
                                            + out["usage"]["output_tokens"])
    # message-list input with content parts frames identically
    with _post(f"{url}/v1/responses",
               {"input": [{"role": "system",
                           "content": [{"type": "input_text",
                                        "text": "be brief"}]},
                          {"role": "user",
                           "content": [{"type": "input_text",
                                        "text": "hello"}]}],
                "max_output_tokens": 6, "temperature": 0}) as r:
        out2 = json.loads(r.read())
    assert out2["output"][0]["content"][0]["text"] == want


def test_responses_api_stream(served):
    """Typed-event SSE: created -> output_item.added -> content_part.added
    -> output_text.delta* -> *.done -> completed; deltas concatenate to
    the non-streamed text."""
    url, gen, params, cfg = served
    body = {"input": "stream me", "max_output_tokens": 6, "temperature": 0}
    with _post(f"{url}/v1/responses", body) as r:
        want = json.loads(r.read())["output"][0]["content"][0]["text"]
    with _post(f"{url}/v1/responses", {**body, "stream": True}) as r:
        events = [json.loads(e) for e in _sse_events(r.read().decode())]
    kinds = [e["type"] for e in events]
    assert kinds[0] == "response.created"
    assert kinds[-1] == "response.completed"
    assert kinds.index("response.output_item.added") \
        < kinds.index("response.output_text.done")
    text = "".join(e["delta"] for e in events
                   if e["type"] == "response.output_text.delta")
    assert text == want
    final = events[-1]["response"]
    assert final["output"][0]["content"][0]["text"] == want
    assert final["status"] in ("completed", "incomplete")


def test_responses_api_errors(served):
    url, gen, params, cfg = served
    import urllib.error
    for body, frag in [({"input": 7}, "input"),
                       ({"input": "x", "previous_response_id": "r"},
                        "previous_response_id"),
                       ({"input": "x",
                         "text": {"format": {"type": "json_object"}}},
                        "json"),
                       ({"input": "x", "stream": True,
                         "tools": [{"type": "function", "name": "f"}]},
                        "tools")]:
        try:
            with _post(f"{url}/v1/responses", body):
                raise AssertionError(f"expected 400 for {body}")
        except urllib.error.HTTPError as e:
            assert e.code == 400, (body, e.code)
