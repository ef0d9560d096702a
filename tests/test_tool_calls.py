"""OpenAI tool calling over the chat surface: function specs ride into
the system turn (<tools> block — the Qwen chat-template convention the
preset-trained checkpoints expect), role "tool" results wrap in
<tool_response> user turns, and well-formed <tool_call> JSON output
blocks parse into message.tool_calls with finish_reason "tool_calls".
The reference has no tool surface (qwen3vl.py only frees-form chats)."""
import json

from clearcam_tpu.models import llm
from clearcam_tpu.serving import ServingEngine, TextServing

from test_llm import tiny_cfg


class StrTok:
    """Invertible char-level tokenizer (ids = codepoints) so framed ids
    can be decoded back to the exact template text."""
    eos_id = 0
    eot_id = None

    def encode(self, s):
        return [ord(c) for c in s]

    def decode(self, ids):
        return "".join(chr(i) for i in ids if i > 0)

    def is_end(self, t):
        return t == 0

    def role(self, r):
        return self.encode(f"<|{r}|>")

    def end_turn(self):
        return [0]

    def prefix(self):
        return []


def _gen():
    cfg = tiny_cfg(max_context=96)
    return TextServing(ServingEngine(llm.init_params(cfg, seed=4), cfg,
                                     n_slots=1), StrTok())


TOOLS = [{"type": "function", "function": {
    "name": "get_weather", "description": "Weather for a city",
    "parameters": {"type": "object",
                   "properties": {"city": {"type": "string"}},
                   "required": ["city"]}}}]


def test_encode_messages_tool_framing():
    gen = _gen()
    msgs = [{"role": "system", "content": "Be helpful."},
            {"role": "user", "content": "weather in Oslo?"},
            {"role": "assistant", "content": None, "tool_calls": [
                {"id": "call_1", "type": "function", "function": {
                    "name": "get_weather",
                    "arguments": "{\"city\": \"Oslo\"}"}}]},
            {"role": "tool", "content": "{\"temp\": 4}"}]
    text = gen.tok.decode(gen.encode_messages(msgs, TOOLS))
    assert "<tools>" in text and "</tools>" in text
    assert json.dumps(TOOLS[0]["function"], ensure_ascii=False) in text
    assert "Be helpful." in text                   # system content kept
    assert text.index("Be helpful.") < text.index("<tools>")
    assert '<tool_call>\n{"name": "get_weather", "arguments": ' \
        '{"city": "Oslo"}}\n</tool_call>' in text
    assert "<tool_response>\n{\"temp\": 4}\n</tool_response>" in text
    # tool results are framed as user turns
    assert text.index("<|user|><tool_response>") > 0
    # no system message in history -> one is synthesized for the tools
    t2 = gen.tok.decode(gen.encode_messages(
        [{"role": "user", "content": "hi"}], TOOLS))
    assert t2.startswith("<|system|>")
    # without tools: byte-identical to the legacy framing
    assert gen.encode_messages(msgs[:2]) == gen.encode_messages(msgs[:2],
                                                                None)


def test_parse_tool_calls():
    gen = _gen()
    text = ('Checking.\n<tool_call>\n{"name": "get_weather", '
            '"arguments": {"city": "Oslo"}}\n</tool_call>\n'
            '<tool_call>\n{"name": "get_weather", "arguments": '
            '{"city": "Bergen"}}\n</tool_call>')
    content, calls = gen.parse_tool_calls(text)
    assert content == "Checking."
    assert [c["function"]["name"] for c in calls] == ["get_weather"] * 2
    assert [json.loads(c["function"]["arguments"])["city"] for c in calls] \
        == ["Oslo", "Bergen"]
    assert len({c["id"] for c in calls}) == 2
    assert all(c["type"] == "function" for c in calls)
    # malformed JSON stays in content, is not silently dropped
    bad = "x <tool_call>{not json}</tool_call> y"
    content, calls = gen.parse_tool_calls(bad)
    assert calls == [] and "{not json}" in content
    # plain text untouched
    assert gen.parse_tool_calls("hello")[0] == "hello"


def test_tool_visible_len():
    """Streaming holdback: content before a <tool_call> tag is visible;
    the tag and anything after is not, nor is a tail that could be the
    start of a tag split across poll boundaries."""
    from clearcam_tpu.server.http import _tool_visible_len as vl
    assert vl("hello") == 5
    assert vl("a<tool_call>{}") == 1
    assert vl("<tool_call>") == 0
    assert vl("abc<tool_c") == 3          # partial tag held back
    assert vl("abc<") == 3
    assert vl("x<toolz") == 7             # not a tag prefix: all visible
    assert vl("") == 0


def test_http_streamed_tool_call_emission():
    """When the model DOES emit <tool_call> blocks under streaming, the
    content stream stops before the tag (no prefix leaks) and the calls
    arrive as delta.tool_calls chunks with finish_reason tool_calls —
    driven through the real HTTP handler with a canned-generation stub."""
    import json as _json
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore
    from test_http_generate import _post

    answer = ('Checking.\n<tool_call>\n{"name": "get_weather", '
              '"arguments": {"city": "Oslo"}}\n</tool_call>')

    class _Req:
        done = True
        timed_out = False

        def __init__(self, text):
            self._t = text
            self.tokens = [1, 2, 3]
            self.lp = []

        def wait(self, t):
            return self.tokens

    class StubGen:
        def submit_messages(self, msgs, **kw):
            return _Req(answer)

        def encode_messages(self, msgs, tools=None):
            return [1, 2, 3]

        def text(self, r):
            return r._t

        def text_delta(self, r, seen):
            return r._t[len(seen):] if r._t.startswith(seen) else r._t

        def parse_tool_calls(self, text):
            return TextServing.parse_tool_calls(self, text)

        def cancel(self, r):
            pass

    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_toolstream",
                     gen=StubGen())
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with _post(f"{url}/v1/chat/completions",
                   {"messages": [{"role": "user", "content": "w?"}],
                    "max_tokens": 8, "tools": TOOLS,
                    "stream": True}) as r:
            events = [ln[6:] for ln in r.read().decode().split("\n")
                      if ln.startswith("data: ")]
        chunks = [_json.loads(e) for e in events[:-1]]
        text = "".join(c["choices"][0]["delta"].get("content", "")
                       for c in chunks)
        assert text == "Checking.\n"            # nothing past the tag
        tc = [e for c in chunks
              for e in c["choices"][0]["delta"].get("tool_calls", [])]
        assert len(tc) == 1 and tc[0]["index"] == 0
        assert tc[0]["function"]["name"] == "get_weather"
        assert _json.loads(tc[0]["function"]["arguments"]) == \
            {"city": "Oslo"}
        assert chunks[-1]["choices"][0]["finish_reason"] == "tool_calls"
    finally:
        server.shutdown()


def test_http_tools_surface():
    """Streamed and non-streamed tools requests flow normally when the
    model emits no <tool_call> (random weights); tool_choice "none"
    drops the tools block from the prompt."""
    import urllib.error
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore
    from test_http_generate import TinyTok, _post

    cfg = tiny_cfg(max_context=1024)   # the <tools> block is real tokens
    eng = ServingEngine(llm.init_params(cfg, seed=4), cfg,
                        n_slots=2).start()
    gen = TextServing(eng, TinyTok())
    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_tools_http", gen=gen)
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        body = {"messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4, "temperature": 0, "tools": TOOLS}
        with _post(f"{url}/v1/chat/completions", body) as r:
            out = json.loads(r.read())
        msg = out["choices"][0]["message"]
        assert msg["role"] == "assistant" and "tool_calls" not in msg
        assert out["choices"][0]["finish_reason"] in ("stop", "length")
        # tools change the prompt (the <tools> block is real tokens)
        with _post(f"{url}/v1/chat/completions",
                   {**body, "tool_choice": "none"}) as r:
            out2 = json.loads(r.read())
        assert out2["usage"]["prompt_tokens"] \
            < out["usage"]["prompt_tokens"]
        # streamed tools: content deltas concatenate to the non-streamed
        # answer; finish_reason normal when no tool_call is emitted
        with _post(f"{url}/v1/chat/completions",
                   {**body, "stream": True}) as r:
            events = [ln[6:] for ln in r.read().decode().split("\n")
                      if ln.startswith("data: ")]
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        text = "".join(c["choices"][0]["delta"].get("content", "")
                       for c in chunks)
        assert text == msg["content"]
        assert chunks[-1]["choices"][0]["finish_reason"] in ("stop",
                                                            "length")
    finally:
        server.shutdown()
        eng.close()
