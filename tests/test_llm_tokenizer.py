"""GGUF-vocab BPE tokenizer: splitter, merges, specials, chat presets."""
import pytest

from clearcam_tpu.utils.llm_tokenizer import LLMTokenizer, pre_tokenize
from clearcam_tpu.utils.tokenizer import byte_encoder


def make_tok(extra=(), preset="qwen2", specials=None):
    be = byte_encoder()
    normal = {be[b]: b for b in range(256)}          # all single bytes
    nid = 256
    for tok in extra:                                # merged tokens, rank by order
        disp = "".join(be[c] for c in tok.encode())
        normal[disp] = nid
        nid += 1
    specials = specials or {"<|im_start|>": 9000, "<|im_end|>": 9001}
    return LLMTokenizer(normal, specials, preset=preset, bos_id=None,
                        eos_id=9001)


def test_pre_tokenize_basic():
    assert pre_tokenize("hello world") == ["hello", " world"]
    assert pre_tokenize("it's fine") == ["it", "'s", " fine"]
    assert pre_tokenize("a 12345b") == ["a", " ", "123", "45", "b"]
    assert pre_tokenize("hi!\n\nok") == ["hi", "!\n\n", "ok"]
    assert pre_tokenize("x  y") == ["x", " ", " y"]
    assert pre_tokenize("end.  ") == ["end", ".", "  "]
    assert pre_tokenize(" ,x") == [" ,", "x"]


def test_encode_decode_roundtrip():
    tok = make_tok(extra=["he", "llo", "hello", " wor", "ld", " world"])
    text = "hello world"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # greedy lowest-id merging collapses to the provided merges
    assert len(ids) <= 4


def test_special_tokens_split():
    tok = make_tok()
    ids = tok.encode("<|im_start|>user\nhi<|im_end|>")
    assert ids[0] == 9000 and ids[-1] == 9001
    assert tok.decode(ids) == "<|im_start|>user\nhi<|im_end|>"


def test_from_gguf_kv():
    be = byte_encoder()
    tokens = [be[b] for b in range(256)] + ["<|im_start|>", "<|im_end|>"]
    types = [1] * 256 + [3, 3]
    kv = {"tokenizer.ggml.tokens": tokens, "tokenizer.ggml.token_type": types,
          "tokenizer.ggml.pre": "qwen2", "tokenizer.ggml.eos_token_id": 257,
          "tokenizer.ggml.add_bos_token": False}
    tok = LLMTokenizer.from_gguf_kv(kv)
    assert tok.preset == "qwen2"
    assert tok.is_end(257)
    assert tok.decode(tok.encode("ok")) == "ok"


def test_chat_presets():
    tok = make_tok(preset="qwen2")
    role = tok.decode(tok.role("user"))
    assert role == "<|im_start|>user\n"
    end = tok.end_turn()
    assert end[0] == tok.eos_id
    assert tok.prefix() == []


def test_unknown_preset_rejected():
    with pytest.raises(ValueError):
        make_tok(preset="nope")
