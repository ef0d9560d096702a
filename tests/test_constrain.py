"""Grammar-constrained decoding (serving/constrain.py + the serving
graphs' cmask path): the JSON byte-DFA, its token-level lift, and
end-to-end engine enforcement.

The reference has no structured-output support (its sampler is
temperature-only Gumbel, utils/model.py:318-319); this is a new serving
capability, so correctness is pinned against Python's own ``json`` parser
instead of reference goldens: anything the automaton accepts must
json.loads, anything generated under the constraint must replay through
the table as an allowed-token sequence, and unconstrained companions in
the same batch must stay token-exact vs their solo generation."""
import json

import numpy as np
import pytest

from clearcam_tpu.models import llm
from clearcam_tpu.serving import ServingEngine
from clearcam_tpu.serving.constrain import (CharDFA, json_char_dfa,
                                            json_token_constraint,
                                            run_char_dfa, token_table)

from test_llm import tiny_cfg
from test_serving import _solo

EOS = 0

# Toy byte-level vocab for the tiny engine (ids into tiny_cfg's 64-wide
# logits): single JSON bytes plus multi-byte BPE-style merges, so token
# transitions cross several DFA states at once. id 0 is a special (eos).
VOCAB: list = [None] * 64
_tokens = [b"{", b"}", b"[", b"]", b":", b",", b'"', b" ", b"-", b".",
           b"0", b"1", b"2", b"7", b"9", b"e", b"+", b"a", b"b", b"c",
           b"t", b"r", b"u", b"l", b"n", b"s", b"f", b"x", b"y", b"z",
           b'": ', b', "', b'{"', b'"}', b"true", b"false", b"null",
           b'id"', b'], "', b"}}", b'12', b'": [', b'": {', b'"a',
           b'\\n', b'\\u00e9', b"\xc3\xa9", b"\xf0\x9f\x98\x80"]
for _i, _t in enumerate(_tokens):
    VOCAB[_i + 1] = _t


def _decode(ids) -> bytes:
    return b"".join(VOCAB[t] for t in ids if t != EOS and VOCAB[t])


def _toy_constraint(max_depth: int = 3):
    return token_table(json_char_dfa(max_depth), VOCAB, [EOS], n_vocab=64)


def _assert_valid_prefix(tc, ids):
    """Every generated token must be allowed by the table from the state
    the previous tokens produced (the device-side invariant, replayed on
    host); returns the final state."""
    s = tc.start
    for t in ids:
        s2 = int(tc.trans[s, t])
        assert s2 >= 0, (ids, s, t)
        s = s2
    return s


# -- byte-level DFA ---------------------------------------------------------

def test_char_dfa_accepts_valid_json():
    dfa = json_char_dfa(4)
    docs = [b'{}', b'{"a": 1}',
            b'{"a": [1, 2.5e-3, true, false, null, "x"]}',
            b' { "k" : { "n" : [ { "d" : 0 } ] } }',
            b'{"u": "\\u00e9 caf\\u00e9 \\\\ \\" \\n"}',
            '{"s": "héllo \U0001F600"}'.encode(),
            b'{"n": -0.5, "m": 1e+10, "z": 0, "w": 12e2}',
            b'{"a":{"b":{"c":{}}}}', b'{"a": [[[1]]]}']
    for d in docs:
        s = run_char_dfa(dfa, d)
        assert s >= 0 and dfa.accepting[s], d
        json.loads(d)                        # the docs really are JSON


def test_char_dfa_rejects_invalid():
    dfa = json_char_dfa(4)
    docs = [b'[1]',                          # root must be an object
            b'{"a" 1}', b'{"a": 01}', b'{"a": tru}', b'{"a": "\x01"}',
            b'{"a": }', b'{"a": 1,}', b'{"a": [1,]}', b'{"a":1]',
            b'{"a": "\xff"}',                # invalid UTF-8 start byte
            b'{"a": "\xe0\x80\x80"}',        # overlong encoding
            b'{"a": "\xc3"}',                # truncated sequence (not dead,
            b'{"a": 1.2.3}', b'{"a": .5}', b'{"a": --1}',
            b'{"a":{"b":{"c":{"d":{"e":1}}}}}',  # depth 5 > 4
            b'{} ']                          # ACCEPT allows EOS only
    for d in docs:
        s = run_char_dfa(dfa, d)
        assert s < 0 or not dfa.accepting[s], d


def test_char_dfa_incomplete_is_live_not_accepting():
    dfa = json_char_dfa(2)
    for d in [b'{', b'{"a": 1', b'{"a": "xy', b'{"a": [1,']:
        s = run_char_dfa(dfa, d)
        assert s >= 0 and not dfa.accepting[s], d


# -- token-level lift -------------------------------------------------------

def test_token_table_matches_byte_simulation():
    """trans[s, t] must equal feeding token t's bytes through the char DFA
    from state s, for every (state, token) — the vectorized build vs the
    obvious scalar simulation."""
    dfa = json_char_dfa(2)
    tc = token_table(dfa, VOCAB, [EOS], n_vocab=64)
    for s in range(dfa.trans.shape[0]):
        for t, b in enumerate(VOCAB):
            if t == EOS:
                want = s if dfa.accepting[s] else -1
            elif not b:
                want = -1
            else:
                want = run_char_dfa(dfa, b, state=s)
            assert tc.trans[s, t] == want, (s, t, b)


def test_token_table_walk_to_accept():
    tc = _toy_constraint()
    # {" a ": [ true ], " x ": { "a ":  " é(2-byte utf8) " }}  -> accept
    ids = [33, 18, 42, 35, 39, 28, 43, 44, 31, 7, 47, 7, 40]
    doc = _decode(ids)
    assert json.loads(doc) == {"a": [True], "x": {"a": "é"}}
    s = _assert_valid_prefix(tc, ids)
    assert tc.accepting[s]
    assert tc.trans[s, EOS] == s             # eos allowed exactly here
    assert tc.trans[tc.start, EOS] == -1


def test_json_token_constraint_from_tokenizer():
    """The LLMTokenizer adapter: normal tokens constrain by raw bytes,
    specials are disallowed everywhere, eos fires in accepting states."""
    from clearcam_tpu.utils import llm_tokenizer as lt
    enc = {b: c for c, b in lt._byte_decoder().items()}   # byte -> unicode
    normal = {"".join(enc[x] for x in t): i + 2 for i, t in enumerate(
        [b"{", b"}", b'"k', b'": ', b"1", b"2", b"3", b", ", b'"v"'])}
    tok = lt.LLMTokenizer(normal, {"<eos>": 0, "<pad>": 1}, preset="qwen2",
                          eos_id=0)
    tc = json_token_constraint(tok, n_vocab=16, max_depth=2)
    assert tc.trans.shape == (json_char_dfa(2).trans.shape[0], 16)
    assert (tc.trans[:, 1] == -1).all()      # special: never allowed
    ids = [tok.normal[b] for b in (b"{", b'"k', b'": ', b"1", b"}")]
    s = _assert_valid_prefix(tc, ids)
    assert tc.accepting[s] and tc.trans[s, 0] == s


# -- engine end-to-end ------------------------------------------------------

def test_engine_json_mode_outputs_parse():
    """Sampled generation (temperature 1) under the json constraint: every
    request's output replays through the table as allowed tokens, and
    requests that finished via eos decode to bytes json.loads accepts."""
    cfg = tiny_cfg(max_context=256)
    params = llm.init_params(cfg, seed=3)
    tc = _toy_constraint()
    eng = ServingEngine(params, cfg, n_slots=2, constraints={"json": tc})
    reqs = [eng.submit([1, 2, 3], max_new=160, temperature=1.0,
                       eos_id=EOS, seed=s, constraint="json")
            for s in (11, 22, 33)]
    eng.run_until_idle()
    finished = 0
    for r in reqs:
        ids = r.wait(1)
        body = ids[:-1] if ids and ids[-1] == EOS else ids
        end = _assert_valid_prefix(tc, body)
        if ids and ids[-1] == EOS:
            finished += 1
            assert tc.accepting[end]
            json.loads(_decode(ids))         # the whole point
    assert finished >= 1, "no sampled request reached ACCEPT+eos " \
        "(raise max_new or adjust seeds if the toy model changes)"


def test_engine_json_greedy_deterministic():
    cfg = tiny_cfg(max_context=256)
    params = llm.init_params(cfg, seed=5)
    tc = _toy_constraint()
    outs = []
    for _ in range(2):
        eng = ServingEngine(params, cfg, n_slots=1,
                            constraints={"json": tc})
        r = eng.submit([4, 4], max_new=120, eos_id=EOS, constraint="json")
        eng.run_until_idle()
        outs.append(r.wait(1))
    assert outs[0] == outs[1]
    _assert_valid_prefix(tc, [t for t in outs[0] if t != EOS])


def test_engine_mixed_batch_leaves_unconstrained_exact():
    """A constrained row beside an unconstrained greedy row: the
    unconstrained request must stay token-exact vs its solo generation
    (the cmask path is a bitwise no-op for -1 rows), and both admissions
    in one tick exercise the batched prefill_many constraint threading."""
    cfg = tiny_cfg(max_context=256)
    params = llm.init_params(cfg, seed=4)
    tc = _toy_constraint()
    eng = ServingEngine(params, cfg, n_slots=2, constraints={"json": tc})
    rc = eng.submit([1, 2, 3, 4, 5], max_new=60, temperature=1.0,
                    eos_id=EOS, seed=7, constraint="json")
    ru = eng.submit([5, 4, 3], max_new=8)    # same tick: prefill_many
    eng.run_until_idle()
    assert eng.stats["prefill_batched_steps"] >= 1
    assert ru.wait(1) == _solo(params, cfg, [5, 4, 3], 8)
    _assert_valid_prefix(tc, [t for t in rc.wait(1) if t != EOS])


def test_engine_slot_reuse_clears_stale_grammar_state():
    """Regression (round-4 advisor, high): after a constrained request
    retires with cstate=ACCEPT (EOS-only), plain requests batch-admitted
    into the reused slots via prefill_many must NOT inherit the stale
    grammar state — they must be token-exact vs a fresh engine."""
    cfg = tiny_cfg(max_context=256)
    params = llm.init_params(cfg, seed=3)
    tc = _toy_constraint()
    eng = ServingEngine(params, cfg, n_slots=2,
                        constraints={"json": tc})
    # drive a constrained request to completion in every slot
    rcs = [eng.submit([1, 2, 3], max_new=160, temperature=1.0, eos_id=EOS,
                      seed=s, constraint="json") for s in (11, 22)]
    eng.run_until_idle()
    assert any(r.tokens and r.tokens[-1] == EOS for r in rcs), \
        "no constrained request reached ACCEPT (adjust seeds)"
    # two plain admissions in ONE tick -> the batched prefill_many path
    batched0 = eng.stats["prefill_batched_steps"]
    rus = [eng.submit([5, 4, 3], max_new=20, eos_id=EOS),
           eng.submit([2, 6, 1], max_new=20, eos_id=EOS)]
    eng.run_until_idle()
    assert eng.stats["prefill_batched_steps"] > batched0
    assert rus[0].wait(1) == _solo(params, cfg, [5, 4, 3], 20, eos_id=EOS)
    assert rus[1].wait(1) == _solo(params, cfg, [2, 6, 1], 20, eos_id=EOS)


def test_engine_slot_reuse_clears_stale_grammar_state_ssm():
    """Same regression on the SSM/hybrid prefill_many variant
    (models/llm.py) — the scan-based batched prefill had the identical
    stale-cstate fallback."""
    ssm = llm.SSMConfig(conv_kernel=3, state_size=8, group_count=2,
                        time_step_rank=4, inner_size=32)
    cfg = tiny_cfg(max_context=256, ssm=ssm, full_attention_interval=2,
                   qk_norm=8)
    params = llm.init_params(cfg, seed=3)
    tc = _toy_constraint()
    eng = ServingEngine(params, cfg, n_slots=2,
                        constraints={"json": tc})
    rcs = [eng.submit([1, 2, 3], max_new=160, temperature=1.0, eos_id=EOS,
                      seed=s, constraint="json") for s in (11, 22)]
    eng.run_until_idle()
    assert any(r.tokens and r.tokens[-1] == EOS for r in rcs), \
        "no constrained request reached ACCEPT (adjust seeds)"
    batched0 = eng.stats["prefill_batched_steps"]
    rus = [eng.submit([5, 4, 3], max_new=20, eos_id=EOS),
           eng.submit([2, 6, 1], max_new=20, eos_id=EOS)]
    eng.run_until_idle()
    assert eng.stats["prefill_batched_steps"] > batched0
    assert rus[0].wait(1) == _solo(params, cfg, [5, 4, 3], 20, eos_id=EOS)
    assert rus[1].wait(1) == _solo(params, cfg, [2, 6, 1], 20, eos_id=EOS)


def test_engine_json_composes_with_filters_and_bias():
    """Constraint ∧ top_p/top_k ∧ penalties ∧ logit_bias: the grammar mask
    must win regardless of the other processors (bias can't resurrect a
    disallowed token — the mask applies after bias)."""
    cfg = tiny_cfg(max_context=256)
    params = llm.init_params(cfg, seed=6)
    tc = _toy_constraint()
    eng = ServingEngine(params, cfg, n_slots=1, constraints={"json": tc})
    # push hard toward '[' (id 3, illegal at the root) and eos
    r = eng.submit([1, 2], max_new=100, temperature=1.0, eos_id=EOS,
                   seed=9, constraint="json", top_p=0.9, top_k=20,
                   presence_penalty=0.5, repetition_penalty=1.3,
                   logit_bias={3: 30.0, EOS: 10.0})
    eng.run_until_idle()
    ids = r.wait(1)
    body = ids[:-1] if ids and ids[-1] == EOS else ids
    assert body, "constraint starved generation"
    assert body[0] != 3                      # bias couldn't force '[' first
    _assert_valid_prefix(tc, body)


def test_engine_json_prefix_reuse():
    """A retired constrained request's cache prefix is reusable; the
    follow-up starts its grammar fresh from cinit (not the retired
    slot's stale cstate)."""
    cfg = tiny_cfg(max_context=256)
    params = llm.init_params(cfg, seed=8)
    tc = _toy_constraint()
    eng = ServingEngine(params, cfg, n_slots=1, constraints={"json": tc})
    prompt = list(range(1, 40))              # > 1 chunk so reuse is real
    r1 = eng.submit(prompt, max_new=40, temperature=1.0, eos_id=EOS,
                    seed=13, constraint="json")
    eng.run_until_idle()
    r2 = eng.submit(prompt, max_new=40, temperature=1.0, eos_id=EOS,
                    seed=13, constraint="json")
    eng.run_until_idle()
    assert eng.stats["reused_tokens"] > 0
    assert r2.wait(1) == r1.wait(1)          # same seed => same draws
    _assert_valid_prefix(tc, [t for t in r2.tokens if t != EOS])


def test_submit_validation():
    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=1)
    eng = ServingEngine(params, cfg, n_slots=1)      # no constraints
    with pytest.raises(ValueError, match="no constraint"):
        eng.submit([1, 2], max_new=4, constraint="json")
    with pytest.raises(ValueError, match="spec_lookup"):
        ServingEngine(params, cfg, n_slots=1, spec_lookup=2,
                      constraints={"json": _toy_constraint()})
    spec_eng = ServingEngine(params, cfg, n_slots=1, spec_lookup=2)
    with pytest.raises(ValueError, match="spec_lookup"):
        spec_eng.submit([1, 2], max_new=4, constraint="json")


def test_concat_constraints_offsets():
    from clearcam_tpu.serving.constrain import concat_constraints
    a = _toy_constraint(2)
    b = _toy_constraint(3)
    tab, starts = concat_constraints({"j2": a, "j3": b})
    assert tab.shape == (a.trans.shape[0] + b.trans.shape[0], 64)
    assert starts["j2"] == a.start
    assert starts["j3"] == a.trans.shape[0] + b.start
    # block b's transitions all land inside block b (or -1)
    blk = tab[a.trans.shape[0]:]
    live = blk[blk >= 0]
    assert (live >= a.trans.shape[0]).all()


# -- schema / choice grammars -------------------------------------------------

SCHEMA = {"type": "object",
          "properties": {"a": {"type": "integer"},
                         "b": {"enum": ["x", "y"]},
                         "c": {"type": "array", "items": {"type": "boolean"},
                               "minItems": 1, "maxItems": 2}}}


def test_schema_dfa_accepts_and_rejects():
    from clearcam_tpu.serving.constrain import schema_char_dfa
    dfa = schema_char_dfa(SCHEMA)
    ok = [b'{"a": 3, "b": "x", "c": [true]}',
          b'{ "a" : -10, "b" : "y", "c" : [ false , true ] }']
    bad = [b'{"b": "x"}',                        # properties are ordered
           b'{"a": 3.5, ',                       # float where integer
           b'{"a": 3, "b": "z"',                 # not in enum
           b'{"a": 3, "b": "x", "c": []}',       # minItems 1
           b'{"a": 3, "b": "x", "c": [true, true, true]',  # maxItems 2
           b'{"a": 3, "b": "x", "c": [true,]',   # dangling comma
           b'{"a": 3, "b": "x", "c": [true]} ']  # EOS only after close
    for d in ok:
        s = run_char_dfa(dfa, d)
        assert s >= 0 and dfa.accepting[s], d
        json.loads(d)
    for d in bad:
        s = run_char_dfa(dfa, d)
        assert s < 0 or not dfa.accepting[s], d


def test_schema_dfa_root_variants():
    from clearcam_tpu.serving.constrain import schema_char_dfa
    cases = [({"type": "integer"}, [b"42", b"-7", b"0"],
              [b"01", b"4.2", b"-"]),
             ({"type": "number"}, [b"4.25e-3", b"-0.5"], [b".5", b"1."]),
             ({"enum": ["red", "green", 5]}, [b'"red"', b"5"],
              [b'"blue"', b"6"]),
             ({"type": "object", "properties": {}}, [b"{}", b"{ }"],
              [b'{"a": 1}']),
             ({"type": "array", "items": {"type": "null"}, "maxItems": 2},
              [b"[]", b"[null]", b"[null, null]"], [b"[null, null, null]"])]
    for sch, okdocs, baddocs in cases:
        dfa = schema_char_dfa(sch)
        for d in okdocs:
            s = run_char_dfa(dfa, d)
            assert s >= 0 and dfa.accepting[s], (sch, d)
        for d in baddocs:
            s = run_char_dfa(dfa, d)
            assert s < 0 or not dfa.accepting[s], (sch, d)


def test_schema_unsupported_raises():
    from clearcam_tpu.serving.constrain import schema_char_dfa
    for sch in [{"$ref": "#/defs/x"}, {"type": "tuple"}, {"anyOf": []},
                # two object alternatives: both open with '{' — not
                # byte-deterministic, must refuse instead of mis-compile
                {"anyOf": [{"type": "object", "properties": {}},
                           {"type": "object",
                            "properties": {"a": {"type": "null"}}}]},
                {"type": ["integer", "number"]}]:
        with pytest.raises(ValueError):
            schema_char_dfa(sch)


def test_schema_nullable_and_unions():
    from clearcam_tpu.serving.constrain import schema_char_dfa
    sch = {"type": "object", "properties": {
        "a": {"type": ["string", "null"]},
        "b": {"anyOf": [{"type": "integer"}, {"type": "boolean"},
                        {"type": "array", "items": {"type": "null"},
                         "maxItems": 1}]}}}
    dfa = schema_char_dfa(sch)
    ok = [b'{"a": null, "b": 3}', b'{"a": "x", "b": true}',
          b'{"a": null, "b": []}', b'{"a": "y", "b": [null]}']
    bad = [b'{"a": 1, ', b'{"a": null, "b": null}',
           b'{"a": null, "b": "x"}']
    for d in ok:
        s = run_char_dfa(dfa, d)
        assert s >= 0 and dfa.accepting[s], d
        json.loads(d)
    for d in bad:
        s = run_char_dfa(dfa, d)
        assert s < 0 or not dfa.accepting[s], d


def test_choice_dfa():
    from clearcam_tpu.serving.constrain import choice_char_dfa
    dfa = choice_char_dfa(["yes", "no", "maybe"])
    for d, want in [(b"yes", True), (b"no", True), (b"maybe", True),
                    (b"nope", False), (b"may", False)]:
        s = run_char_dfa(dfa, d)
        assert (s >= 0 and bool(dfa.accepting[s])) == want, d
    with pytest.raises(ValueError):              # prefix literals ambiguous
        choice_char_dfa(["yes", "yesterday"])


def test_engine_runtime_registration_schema():
    """register_constraint after construction: the table shape is fixed
    (reserved rows), so the running engine picks the new grammar up with
    no recompile; generated output matches the schema."""
    from clearcam_tpu.serving.constrain import (schema_token_constraint,
                                                choice_token_constraint)

    class _Tok:                                   # vocab_bytes adapter
        eos_id, eot_id = EOS, None

        def vocab_bytes(self):
            return VOCAB

    cfg = tiny_cfg(max_context=256)
    params = llm.init_params(cfg, seed=3)
    eng = ServingEngine(params, cfg, n_slots=2,
                        constraints={"json": _toy_constraint()},
                        constraint_rows=256)
    r0 = eng.submit([1, 2], max_new=30, temperature=1.0, eos_id=EOS,
                    seed=5, constraint="json")
    eng.run_until_idle()                          # engine already ran
    sch = {"type": "object", "properties": {"a": {"type": "integer"},
                                            "b": {"enum": ["x", "y"]}}}
    eng.register_constraint("schema:t",
                            schema_token_constraint(_Tok(), 64, sch))
    eng.register_constraint("choice:t",
                            choice_token_constraint(_Tok(), 64,
                                                    ["yes", "no"]))
    rs = eng.submit([1, 2, 3], max_new=60, temperature=1.0, eos_id=EOS,
                    seed=21, constraint="schema:t")
    rc = eng.submit([3, 2, 1], max_new=20, temperature=1.0, eos_id=EOS,
                    seed=4, constraint="choice:t")
    eng.run_until_idle()
    assert r0.done
    ids = rs.wait(1)
    if ids and ids[-1] == EOS:
        doc = json.loads(_decode(ids))
        assert list(doc) == ["a", "b"]
        assert isinstance(doc["a"], int) and doc["b"] in ("x", "y")
    cids = rc.wait(1)
    assert cids and cids[-1] == EOS              # accept -> forced eos
    assert _decode(cids).decode() in ("yes", "no")
    # idempotent
    eng.register_constraint("choice:t", choice_token_constraint(
        _Tok(), 64, ["yes", "no"]))
    # exhausting the reserved rows LRU-evicts idle runtime grammars instead
    # of 400-ing until restart (round-4 advisor, medium): every register
    # succeeds, the oldest idle blocks get recycled, and construction-time
    # grammars are permanent
    big = schema_token_constraint(_Tok(), 64, SCHEMA)
    for i in range(12):
        eng.register_constraint(f"fill{i}", big)
    assert "fill11" in eng._cstarts
    assert "fill0" not in eng._cstarts       # LRU-evicted
    assert "json" in eng._cstarts            # construction grammar stays


def test_register_constraint_eviction_pins_inflight():
    """Eviction must never recycle a grammar with a waiting/running
    request: with every registered grammar in flight the table-full error
    remains; once the request drains, the block frees and new grammars
    register again — and output generated under eviction pressure still
    obeys its grammar."""
    from clearcam_tpu.serving.constrain import schema_token_constraint

    class _Tok:
        eos_id, eot_id = EOS, None

        def vocab_bytes(self):
            return VOCAB

    big = schema_token_constraint(_Tok(), 64, SCHEMA)
    pad = -(-big.trans.shape[0] // 64) * 64
    cfg = tiny_cfg(max_context=256)
    params = llm.init_params(cfg, seed=3)
    # reserve room for exactly ONE padded block
    eng = ServingEngine(params, cfg, n_slots=1,
                        constraints={"json": _toy_constraint()},
                        constraint_rows=pad + 16)
    eng.register_constraint("a", big)
    r = eng.submit([1, 2], max_new=60, temperature=1.0, eos_id=EOS,
                   seed=5, constraint="a")       # waiting: engine not run yet
    with pytest.raises(ValueError, match="full"):
        eng.register_constraint("b", big)        # "a" is pinned in flight
    assert "a" in eng._cstarts
    eng.run_until_idle()
    body = [t for t in r.wait(1) if t != EOS]
    assert body
    s = big.start
    for t in body:                               # replay under grammar "a"
        s = int(big.trans[s, t])
        assert s >= 0, (body, t)
    # drained: "a" is idle now, so the next register evicts it
    eng.register_constraint("b", big)
    assert "b" in eng._cstarts and "a" not in eng._cstarts
    # submitting against the evicted name fails loudly, not silently
    with pytest.raises(ValueError, match="no constraint|evicted"):
        eng.submit([1, 2], max_new=4, constraint="a")


# -- OpenAI surface (response_format) ----------------------------------------

class _ByteTok:
    """Tokenizer over the toy byte VOCAB so HTTP responses decode to the
    literal JSON text the constraint produced."""
    eos_id, eot_id = EOS, None

    def encode(self, s):
        return [1 + (ord(c) % 60) for c in s]

    def decode(self, ids):
        return b"".join(VOCAB[int(i)] or b"?" for i in ids
                        if int(i) != EOS).decode("utf-8", "replace")

    def is_end(self, t):
        return t == self.eos_id

    def role(self, r):
        return self.encode("<" + r + ">")

    def end_turn(self):
        return [self.eos_id]

    def prefix(self):
        return []

    def vocab_bytes(self):
        return VOCAB


def test_openai_response_format_json_object():
    """response_format json_object over the live HTTP server: finished
    choices parse as JSON; engines without the constraint return 400."""
    import urllib.error
    import urllib.request

    from clearcam_tpu.serving import TextServing
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore

    cfg = tiny_cfg(max_context=256)
    params = llm.init_params(cfg, seed=3)
    eng = ServingEngine(params, cfg, n_slots=2,
                        constraints={"json": _toy_constraint()},
                        constraint_rows=256).start()
    gen = TextServing(eng, _ByteTok())
    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_constrain_test", gen=gen)
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"

    def post(body, path="/v1/chat/completions"):
        req = urllib.request.Request(url + path,
                                     data=json.dumps(body).encode(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    try:
        dfa = json_char_dfa(3)
        finished = 0
        for seed in (11, 22, 33):
            out = post({"messages": [{"role": "user", "content": "go"}],
                        "max_tokens": 160, "temperature": 1.0,
                        "seed": seed,
                        "response_format": {"type": "json_object"}})
            ch = out["choices"][0]
            text = ch["message"]["content"]
            assert run_char_dfa(dfa, text.encode()) >= 0, text
            if ch["finish_reason"] == "stop":
                finished += 1
                json.loads(text)
        assert finished >= 1
        with pytest.raises(urllib.error.HTTPError) as ei:
            post({"messages": [{"role": "user", "content": "x"}],
                  "max_tokens": 8,
                  "response_format": {"type": "jsonl"}})
        assert ei.value.code == 400
        # structured outputs: compile + register at request time (the
        # engine reserved rows at construction), output obeys the schema
        sch = {"type": "object",
               "properties": {"a": {"type": "integer"},
                              "b": {"enum": ["x", "y"]}}}
        out = post({"messages": [{"role": "user", "content": "go"}],
                    "max_tokens": 120, "temperature": 1.0, "seed": 5,
                    "response_format": {
                        "type": "json_schema",
                        "json_schema": {"name": "t", "schema": sch}}})
        ch = out["choices"][0]
        if ch["finish_reason"] == "stop":
            doc = json.loads(ch["message"]["content"])
            assert list(doc) == ["a", "b"] and doc["b"] in ("x", "y")
        # guided choice: greedy must emit exactly one option then stop
        out = post({"messages": [{"role": "user", "content": "pick"}],
                    "max_tokens": 20, "temperature": 0.0,
                    "guided_choice": ["yes", "no"]})
        ch = out["choices"][0]
        assert ch["finish_reason"] == "stop"
        assert ch["message"]["content"] in ("yes", "no")
        # unsupported schema construct -> clean 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            post({"messages": [{"role": "user", "content": "x"}],
                  "max_tokens": 8,
                  "response_format": {"type": "json_schema",
                                      "json_schema": {"schema": {
                                          "type": "object", "properties": {
                                              "a": {"anyOf": []}}}}}})
        assert ei.value.code == 400
    finally:
        server.shutdown()
        eng.close()


def test_openai_response_format_unavailable_400():
    import urllib.error
    import urllib.request

    from clearcam_tpu.serving import TextServing
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore

    cfg = tiny_cfg()
    params = llm.init_params(cfg, seed=1)
    eng = ServingEngine(params, cfg, n_slots=1).start()   # no constraints
    gen = TextServing(eng, _ByteTok())
    ctx = AppContext(KVStore(":memory:"), "/tmp/cc_constrain_test2",
                     gen=gen)
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        req = urllib.request.Request(
            url + "/v1/chat/completions",
            data=json.dumps({"messages": [{"role": "user", "content": "x"}],
                             "max_tokens": 4,
                             "response_format": {"type": "json_object"}}
                            ).encode(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        eng.close()


def test_run_char_dfa_dead_stays_dead():
    dfa = json_char_dfa(2)
    assert run_char_dfa(dfa, b'x{') == -1
    assert run_char_dfa(CharDFA(dfa.trans, dfa.start, dfa.accepting),
                        b'{}', state=-1) == -1


def test_submit_retrying_absorbs_eviction_race():
    """register->submit can race LRU eviction of a runtime grammar: the
    engine fails such submits with a 'was evicted' ValueError, and the HTTP
    layer must re-resolve (re-register) and resubmit instead of surfacing
    the internal protocol as a client 400."""
    from clearcam_tpu.server.http import _submit_retrying

    calls = {"submit": 0, "resolve": 0}

    def submit():
        calls["submit"] += 1
        if calls["submit"] <= 2:
            raise ValueError("constraint 'schema:x' was evicted — "
                             "re-register and resubmit")
        return "req"

    assert _submit_retrying(submit, lambda: calls.__setitem__(
        "resolve", calls["resolve"] + 1)) == "req"
    assert calls == {"submit": 3, "resolve": 2}

    # non-eviction errors pass straight through untouched
    def bad():
        raise ValueError("logprobs unsupported under spec serving")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="logprobs"):
        _submit_retrying(bad, lambda: None)

    # a persistent eviction storm still fails after the retry budget
    def always():
        raise ValueError("constraint 'x' was evicted — re-register and resubmit")
    with _pytest.raises(ValueError, match="evicted"):
        _submit_retrying(always, lambda: None, tries=3)
