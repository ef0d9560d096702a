"""Slot-based continuous batching over models/llm.make_serving_fns.

Design (TPU-first): the device only ever sees two compiled programs —
``prefill_slot`` (one CHUNK of one slot's prompt, B=1 compute scattered
back into the batch state) and ``decode_all`` (every slot one token at its
own position). The host-side scheduler here owns admission, the chunked-
prefill/decode interleave, retirement, and the park-position policy for
rows that are not decoding (see make_serving_fns' docstring for why the
park positions are safe). All shapes are static: batch = n_slots, prompt
chunks = CHUNK — no recompiles as requests come and go.

Scheduling policy: one scheduler "tick" runs EITHER one prefill chunk (the
oldest admitted, still-prefilling request) OR one decode_all step — so
admitting a long prompt adds at most one chunk's latency between decode
steps for running requests (Sarathi/vLLM-style chunked prefill, without
mixed prefill+decode programs).

Lagged token streaming: sampled tokens chain step-to-step ON DEVICE
(prefill's first token rides into decode via inject_mask/inject_tok, each
decode feeds the previous step's device output), and the host materializes
tokens ``sync_lag`` steps late, fetching them as ONE stacked [k, B] array
per ``fetch_every`` decode steps (one readback round trip per k steps,
not per token step). The dispatch queue therefore stays full —
aggregate throughput is the device's, not one round-trip per token (through
the axon tunnel that is the difference between ~36 ms/step and device
speed; on a PCIe host it hides the same sync, smaller). The price: EOS /
max_new are discovered up to sync_lag steps late, so a finishing slot burns
up to sync_lag junk decode steps before it frees — junk tokens are dropped
by per-slot occupancy epochs, junk cache writes are overwritten by the next
occupant before its causal mask can see them.

Prefix-cache reuse (``prefix_cache=True``, attention-only stacks): each
slot remembers the token ids validly occupying its cache rows (prompt +
generated tokens); admission picks the free slot with the longest
CHUNK-aligned common prefix and starts prefill there — the reference's
cross-call prefix reuse (utils/model.py:393-395 ``get_start_pos``) lifted
to multi-slot serving. NVR alert summaries share a fixed system preamble,
and conversation follow-ups extend prompt+reply, so both skip most of
their prefill. Correctness hinges on the park policy: a FREE slot still
rides in every decode_all step writing junk K/V at its park position, so
retired slots park AT their history length (not 0) to keep the reusable
rows intact.

Reference behavior mirrored: output includes the EOS token and stops there
(utils/model.py generate loop semantics), temperature 0 = greedy via the
same Gumbel-max sampler; the reference instead serializes every generation
onto its single main loop (clearcam.py:1214-1226).
"""
from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llm


@dataclass(eq=False)      # identity eq/hash: queue/cancel bookkeeping must
class Request:            # never conflate two requests with equal prompts
    """One generation request; ``wait()`` blocks until completion.

    ``segments`` generalizes the prompt for multimodal serving: a list of
    ("text", [token ids]) and ("custom", payload, n_positions) entries.
    Custom segments are executed by the engine's ``custom_prefill`` hook
    (e.g. a Qwen3-VL image prefill writing n_positions cache entries —
    serving/vlm.py); the last segment must be text (the first sampled
    token comes from its final position). eos_id: one id or an iterable
    (Qwen stops on either im_end or eos — llm_tokenizer.is_end)."""
    prompt: list | None
    max_new: int
    temperature: float = 0.0
    eos_id: object = None
    # sampling filters (device-side, llm.sample_filtered): applied to the
    # temperature-scaled distribution; all-off defaults never change greedy
    top_p: float = 1.0
    top_k: int = 0
    min_p: float = 0.0
    # sampling penalties (device-side, over per-slot token histograms):
    # presence/frequency act on generated tokens (vLLM/OpenAI semantics),
    # repetition on prompt+generated (HF semantics). Unlike the filters,
    # penalties DO change temperature-0 outputs — that is their point.
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    # OpenAI logit_bias: {token_id: additive bias} applied before
    # temperature (after penalties); like penalties, it changes greedy
    logit_bias: dict | None = None
    # OpenAI logprobs: number of top alternatives wanted (0 = off, max
    # llm.LP_K — the K baked into the serving graphs). When > 0, ``lp``
    # collects one row per generated token: (chosen_logprob,
    # [(alt_id, alt_logprob) x logprobs]) over the post-penalty/bias
    # pre-temperature distribution. Non-speculative engines only.
    logprobs: int = 0
    lp: list = field(default_factory=list)
    # OpenAI seed: per-request reproducible sampling — the row's Gumbel
    # noise is keyed by (engine base seed, this seed, generated-token
    # index) via llm.serving_row_keys, so the same seeded request redraws
    # identically regardless of slot, step count, or batch companions.
    # None = a random seed per submission (draws differ every time).
    seed: int | None = None
    # grammar-constrained decoding (serving/constrain.py): name of a
    # constraint registered at engine construction (e.g. "json" — OpenAI
    # response_format json_object). The engine masks disallowed tokens on
    # device each step; None = unconstrained.
    constraint: str | None = None
    segments: list | None = None
    tokens: list = field(default_factory=list)   # generated ids (incl. eos)
    deadline: float | None = None                # monotonic; engine-enforced
    timed_out: bool = False                      # set when deadline cut it
    # set when the engine scheduler died with this request in flight —
    # the request completes (waiters unblock) with partial tokens and
    # this flag instead of hanging forever (see ServingEngine._fail_all)
    failed: bool = False
    # client-observed latency marks (monotonic): set at submit / first
    # materialized token / retirement — deliberately measured at HOST
    # materialization time, so TTFT includes the lagged-pipeline depth a
    # streaming client actually experiences
    t_submit: float = 0.0
    t_first: float | None = None
    t_done: float | None = None
    _done: threading.Event = field(default_factory=threading.Event)

    @property
    def pen_active(self) -> bool:
        return (self.presence_penalty != 0.0 or self.frequency_penalty != 0.0
                or self.repetition_penalty != 1.0)

    @property
    def ttft_s(self) -> float | None:
        """Submit -> first token (client-observed), seconds."""
        return None if self.t_first is None else self.t_first - self.t_submit

    @property
    def tpot_s(self) -> float | None:
        """Mean inter-token time past the first (decode cadence), seconds."""
        if self.t_done is None or self.t_first is None \
                or len(self.tokens) < 2:
            return None
        return (self.t_done - self.t_first) / (len(self.tokens) - 1)

    def __post_init__(self):
        if self.segments is None:
            assert self.prompt, "empty prompt"
            self.segments = [("text", list(self.prompt))]
        assert self.segments[-1][0] == "text" and self.segments[-1][1], \
            "last segment must be non-empty text"
        self.total_len = sum(len(s[1]) if s[0] == "text" else s[2]
                             for s in self.segments)
        if self.eos_id is None:
            self.stop_ids = frozenset()
        elif isinstance(self.eos_id, int):
            self.stop_ids = frozenset([self.eos_id])
        else:
            self.stop_ids = frozenset(self.eos_id)

    def wait(self, timeout: float | None = None) -> list:
        if not self._done.wait(timeout):
            raise TimeoutError("request not finished")
        return self.tokens

    @property
    def done(self) -> bool:
        return self._done.is_set()


class QueueFull(Exception):
    """Admission backpressure: the engine's waiting queue is at
    ``max_waiting``; callers should shed load (HTTP 503 + Retry-After)
    rather than let latency grow unboundedly."""


_FREE, _PREFILL, _LIVE = 0, 1, 2


class ServingEngine:
    """Continuous-batching engine: ``submit()`` from any thread, tokens come
    from interleaved prefill/decode ticks (``step()``, or the background
    thread started by ``start()``)."""

    def __init__(self, params, cfg, n_slots: int = 4,
                 state_dtype=jnp.float32, kv_quant: bool = False,
                 use_pallas_decode: bool = False, interpret: bool = False,
                 seed: int = 0, sync_lag: int = 4, custom_prefill=None,
                 prefix_cache: bool = True, fetch_every: int = 4,
                 prefill_batch: bool = True, max_waiting: int | None = None,
                 spec_lookup: int = 0, max_restarts: int = 0,
                 restart_window_s: float = 600.0,
                 constraints: dict | None = None,
                 constraint_rows: int = 0):
        assert cfg.max_context % llm.CHUNK == 0
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.sync_lag = sync_lag
        # Prefix reuse needs the reuse boundary's recurrent state, which a
        # position-addressed cache doesn't hold — attention-only stacks only
        # (the reference resets SSM state on reuse too, model.py:287-290).
        self.prefix_cache = prefix_cache and cfg.ssm is None
        # Speculative decoding: device-drafted (G+1)-token verify windows,
        # 1..G+1 tokens per decode dispatch (greedy rows). Attention/MLA
        # stacks only (rejected drafts can't roll back a recurrence) and
        # not composable with the T=1 Pallas decode kernel — silently
        # disabled there, same convention as prefix_cache.
        self.spec = int(spec_lookup) \
            if cfg.ssm is None and not use_pallas_decode else 0
        # Batch-width/numerics-affecting config, hashed into the OpenAI
        # system_fingerprint: `seed` reproducibility holds per compiled
        # graph shape, but penalized-greedy near-tie logits can flip
        # tokens across batch widths under bf16 MXU tiling (PARITY.md) —
        # a changed fingerprint tells clients the draws are not
        # comparable across deployments.
        # grammar constraints (serving/constrain.py): all registered
        # automatons pack into ONE device-resident [S_total, V] table
        # (disjoint row blocks); per-request start states select the
        # grammar. Engines without constraints ride the same graphs with
        # an inert [1, V] table — unconstrained rows are bitwise
        # unaffected (llm.make_serving_fns constraints note).
        self._cstarts: dict[str, int] = {}
        self._ctab = None
        self._cap = self._cused = 0
        # runtime-registered grammar bookkeeping (register_constraint):
        # name -> (base, pad) row block, free-block list, and an LRU clock
        # so exhausted reserved space evicts idle grammars instead of
        # 400-ing every new schema until restart (round-4 advisor, medium)
        self._cblocks: dict[str, tuple[int, int]] = {}
        self._cfree: list[tuple[int, int]] = []
        self._clru: dict[str, int] = {}
        self._clock = 0
        init_rows = sum(c.trans.shape[0]
                        for c in (constraints or {}).values())
        total = init_rows + max(0, int(constraint_rows))
        if total and self.spec:
            raise ValueError(
                "constrained decoding unsupported with spec_lookup (a "
                "drafted verify window has no per-position grammar state)")
        if not self.spec:
            if total == 0:
                # inert table: the graphs still take (ctab, cstate), but
                # every row is unconstrained — bitwise no-op masking
                self._ctab = jnp.zeros((1, cfg.vocab_size), jnp.int16)
            else:
                assert total < np.iinfo(np.int16).max, \
                    "constraint table too tall for int16 states"
                tab = np.full((total, cfg.vocab_size), -1, np.int16)
                base = 0
                for nm, c in (constraints or {}).items():
                    assert c.trans.shape[1] == cfg.vocab_size, \
                        f"constraint {nm}: vocab {c.trans.shape[1]} != " \
                        f"cfg {cfg.vocab_size}"
                    n = c.trans.shape[0]
                    tab[base:base + n] = np.where(
                        c.trans >= 0,
                        (c.trans.astype(np.int32) + base).astype(np.int16),
                        np.int16(-1))
                    self._cstarts[nm] = base + c.start
                    base += n
                self._cap, self._cused = total, base
                self._ctab = jnp.asarray(tab)
        # row-block uploader for register_constraint: the TABLE SHAPE is
        # fixed at construction, so runtime grammar registration (per-
        # request json_schema / guided_choice) never recompiles the
        # serving graphs — new rows upload into the reserved space
        self._cupd = jax.jit(
            lambda t, blk, off: jax.lax.dynamic_update_slice(t, blk,
                                                             (off, 0)))
        # Runtime-registered grammars (register_constraint) are EXCLUDED
        # from the fingerprint by design: the HTTP layer names them by the
        # full content hash of the schema/options, and a grammar's token
        # masks depend only on the automaton, never on its row-block
        # placement — so constrained draws are comparable per grammar
        # content across deployments, exactly the contract the name
        # carries. Construction-time grammars stay in (their names are
        # deployment config, not content-addressed).
        self.fingerprint_cfg = (n_slots, jnp.dtype(state_dtype).name,
                                bool(kv_quant), self.spec,
                                bool(use_pallas_decode),
                                tuple(sorted(self._cstarts)))
        self.hist: list[list[int]] = [[] for _ in range(n_slots)]
        self.stats = {"prefill_chunks": 0, "prefill_tokens": 0,
                      "reused_tokens": 0, "decode_steps": 0,
                      "prefill_batched_steps": 0, "spec_emitted": 0,
                      "scheduler_restarts": 0}
        # scheduler crash recovery budget: up to max_restarts restarts per
        # sliding restart_window_s window (0 = fail-loud only, the round-3
        # behavior); a long-lived server with a rare crash never exhausts
        # the budget, a crash loop does and fails loudly
        self.max_restarts = int(max_restarts)
        self.restart_window_s = float(restart_window_s)
        self._restart_marks: deque[float] = deque()
        self.prefill_slot, self.decode_all, self.prefill_many = \
            llm.make_serving_fns(cfg, use_pallas_decode=use_pallas_decode,
                                 interpret=interpret, spec_lookup=self.spec,
                                 constraints=not self.spec)
        if not prefill_batch:
            self.prefill_many = None     # always one slot-chunk per tick
        # kept for _recover(): a scheduler restart re-inits device state
        # with exactly the construction-time layout
        self._state_dtype, self._kv_quant = state_dtype, kv_quant
        self.state = llm.init_state(cfg, batch=n_slots, dtype=state_dtype,
                                    kv_quant=kv_quant)
        self.aux = llm.init_serving_aux(cfg, n_slots) if self.spec else None
        self.custom_prefill = custom_prefill         # (state,slot,pos,payload)
        self.phase = [_FREE] * n_slots
        self.req: list[Request | None] = [None] * n_slots
        self.epoch = [0] * n_slots                   # occupancy generation
        self.cursor = np.zeros(n_slots, np.int64)    # prefill progress / pos
        self.seg_idx = [0] * n_slots                 # current prompt segment
        self.seg_start = np.zeros(n_slots, np.int64)  # its start position
        # packed per-slot sampling spec rows (llm.pack_samp columns:
        # temperature, top_p, top_k, min_p, presence, frequency,
        # repetition) — uploaded only when dirty
        self.samp = np.zeros((n_slots, llm.SAMP_W), np.float32)
        self.samp[:, 1] = 1.0                        # top_p off
        self.samp[:, 6] = 1.0                        # repetition off
        self._temps_dev = jnp.asarray(self.samp)
        self._temps_dirty = False
        # per-slot token histograms for the sampling penalties: _cnt_p over
        # the prompt (host-computed at admission — covers reused prefixes
        # the device never re-reads), _cnt_o over generated tokens (the
        # decode graphs scatter-add each consumed token). Device-resident;
        # rows are refreshed at admission ONLY for penalty-carrying
        # requests (stale rows are harmless: their samp coefficients are
        # off, and the graphs' penalty math rides a lax.cond)
        self._cnt_p = jnp.zeros((n_slots, cfg.vocab_size), jnp.int32)
        self._cnt_o = jnp.zeros((n_slots, cfg.vocab_size), jnp.int32)
        # per-slot dense logit-bias rows (densified from the request's
        # sparse {token: bias} at admission); samp col 7 flags live rows,
        # so stale rows are inert and the sampler skips the read entirely
        # while no slot carries a bias
        self._bias = jnp.zeros((n_slots, cfg.vocab_size), jnp.float32)
        # per-slot grammar state: _cinit_np is the admission-time start
        # state (-1 = unconstrained; host-owned, uploaded when dirty),
        # _cstate the live state (device-chained through the graphs like
        # _cnt_o — the host reads tokens late, so it can never know the
        # current state; the device always does)
        self._cinit_np = np.full(n_slots, -1, np.int32)
        self._cinit_dev = jnp.asarray(self._cinit_np)
        self._cinit_dirty = False
        self._cstate = jnp.full((n_slots,), -1, jnp.int32)
        self._cnt_row_set = jax.jit(
            lambda c, v, b: jax.lax.dynamic_update_slice(c, v[None], (b, 0)))
        self._tok_dev = jnp.zeros((n_slots,), jnp.int32)
        self._first_tok = jnp.zeros((n_slots,), jnp.int32)  # device-resident
        # packed per-slot logprob rows maintained by the non-spec graphs
        # beside first_tok / each decode step's output ([chosen_lp,
        # top-K lps, top-K ids] — llm.sample_filtered_lp); fetched with
        # the tokens, parsed only for requests that asked for logprobs
        self._first_lp = jnp.zeros((n_slots, 1 + 2 * llm.LP_K), jnp.float32)
        # per-slot sampling seed + prompt length, riding the per-step meta
        # upload into llm.serving_row_keys (seeded requests use their own
        # seed; unseeded ones draw a random seed at admission)
        self._seed_np = np.zeros(n_slots, np.int32)
        self._plen_np = np.zeros(n_slots, np.int32)
        self._seed_rng = np.random.default_rng()
        self._inject = np.zeros(n_slots, bool)       # consume first_tok[b]
        self._pending: deque = deque()               # unmaterialized tokens
        self._waiting: deque[Request] = deque()
        self._cancel: set = set()                    # retire at next tick
        self.max_waiting = max_waiting               # admission backpressure
        self._deadlines = 0                          # live deadline count
        # Decode tokens accumulate device-side and are fetched as ONE
        # stacked [k, B] array every `fetch_every` steps — the lagged
        # materialization costs one host round trip per k steps instead
        # of per step (through the axon tunnel each materialization is
        # ~7 ms even with copy_to_host_async; on PCIe smaller, same shape)
        self.fetch_every = max(1, fetch_every)
        self._acc: list = []                         # (epochs, mask, tok_dev)
        self._stack = jax.jit(lambda *ts: jnp.stack(ts))
        self._lock = threading.Lock()
        self._work = threading.Condition(self._lock)
        self._ttft_ewma: float | None = None
        self._tpot_ewma: float | None = None
        self._base_key = jax.random.PRNGKey(seed)
        self._step_n = 0
        self._tick_n = 0
        self._admit_n = 0
        self._admit_seq = [0] * n_slots   # admission order (age-fair pre)
        self._prefer_decode = False       # prefill/decode alternation bit
        self._thread: threading.Thread | None = None
        self._stop = False
        self._dead = False            # set by _fail_all on scheduler death

    # -- client API --------------------------------------------------------

    def submit(self, prompt: list | None = None, max_new: int = 64,
               temperature: float = 0.0, eos_id=None,
               segments: list | None = None,
               timeout_s: float | None = None, top_p: float = 1.0,
               top_k: int = 0, min_p: float = 0.0,
               presence_penalty: float = 0.0,
               frequency_penalty: float = 0.0,
               repetition_penalty: float = 1.0,
               logit_bias: dict | None = None,
               logprobs: int = 0, seed: int | None = None,
               constraint: str | None = None) -> Request:
        """timeout_s: engine-enforced deadline — a request still waiting
        when it expires is dropped; a running one is retired at the next
        tick with whatever tokens it has (``Request.timed_out`` set).
        Raises QueueFull when the waiting queue is at ``max_waiting``.
        top_p/top_k/min_p: device-side sampling filters (per request,
        llm.sample_filtered); they never change temperature-0 outputs.
        presence_penalty/frequency_penalty (OpenAI semantics, generated
        tokens) and repetition_penalty (HF semantics, prompt+generated)
        run on device over per-slot token histograms — these DO change
        greedy outputs, as does logit_bias ({token_id: additive bias},
        OpenAI semantics, applied before temperature).
        logprobs: top-alternative count (0..llm.LP_K) to record per
        generated token in ``Request.lp`` — read-only scoring, never
        changes outputs. Unsupported under speculative serving (the spec
        fetch carries candidate windows, not per-step distributions).
        seed: reproducible sampling (OpenAI semantics) — same seeded
        request => same draws, independent of slot/step/companions (see
        Request.seed). Unsupported under speculative serving (spec
        windows keep the step-keyed scheme).
        constraint: name of a grammar registered via the engine's
        ``constraints`` dict (serving/constrain.py, e.g. "json" for
        OpenAI response_format json_object) — disallowed tokens are
        masked ON DEVICE each step and the grammar state advances with
        the sampled token. Unsupported under speculative serving."""
        if constraint is not None:
            if self.spec:
                raise ValueError("constraint unsupported with spec_lookup")
            if constraint not in self._cstarts:
                raise ValueError(
                    f"engine has no constraint {constraint!r} "
                    f"(registered: {sorted(self._cstarts) or 'none'})")
        if logprobs:
            if self.spec:
                raise ValueError("logprobs unsupported with spec_lookup")
            top = min(llm.LP_K, self.cfg.vocab_size)
            if not 0 < int(logprobs) <= top:
                raise ValueError(f"logprobs must be 1..{top}")
        if seed is not None:
            if self.spec:
                raise ValueError("seed unsupported with spec_lookup")
            # OpenAI seeds are 64-bit; the per-slot buffer (and fold_in)
            # is int32 — reduce deterministically instead of letting a
            # big seed OverflowError the scheduler thread at admission
            seed = int(seed) % (1 << 31)
        r = Request(list(prompt) if prompt is not None else None,
                    max_new, temperature, eos_id, segments=segments,
                    top_p=top_p, top_k=top_k, min_p=min_p,
                    presence_penalty=presence_penalty,
                    frequency_penalty=frequency_penalty,
                    repetition_penalty=repetition_penalty,
                    logit_bias=dict(logit_bias) if logit_bias else None,
                    logprobs=int(logprobs),
                    seed=int(seed) if seed is not None else None,
                    constraint=constraint)
        r.t_submit = time.monotonic()
        if timeout_s is not None:
            r.deadline = r.t_submit + timeout_s
        assert r.total_len + max_new + self.spec <= self.cfg.max_context, \
            "prompt+max_new overflow ctx"  # spec verify windows are G+1
        # wide: the last real window must fit below max_context
        # every text chunk writes CHUNK-wide at its (segment-offset,
        # possibly unaligned) start; a start past S-CHUNK would clamp the
        # dynamic_update_slice and corrupt earlier cache rows
        pos = 0
        for s in r.segments:
            if s[0] == "text":
                last = pos + (len(s[1]) - 1) // llm.CHUNK * llm.CHUNK
                assert last + llm.CHUNK <= self.cfg.max_context, \
                    "a prompt chunk would write past max_context"
                pos += len(s[1])
            else:
                pos += s[2]
        assert self.custom_prefill is not None or all(
            s[0] == "text" for s in r.segments), \
            "custom segments need a custom_prefill hook"
        assert r.segments and r.segments[-1][0] == "text", \
            "a prompt must end with a text segment — the first sampled " \
            "token comes from the final text chunk's forward (a custom " \
            "segment writes cache rows but samples nothing)"
        with self._work:
            if self._dead:
                raise RuntimeError(
                    "serving engine stopped (closed, or scheduler died — "
                    "see traceback above)")
            if self.max_waiting is not None \
                    and len(self._waiting) >= self.max_waiting:
                raise QueueFull(
                    f"waiting queue at max_waiting={self.max_waiting}")
            if r.constraint is not None:
                if r.constraint not in self._cstarts:
                    # registered at the pre-lock check but LRU-evicted
                    # since: fail cleanly, the client re-registers
                    raise ValueError(
                        f"constraint {r.constraint!r} was evicted — "
                        "re-register and resubmit")
                if r.constraint in self._clru:
                    self._clock += 1
                    self._clru[r.constraint] = self._clock
            self._waiting.append(r)
            if r.deadline is not None:
                self._deadlines += 1
            self._work.notify()
        return r

    def _cinflight(self) -> set:
        """Constraint names any live request still needs. Caller holds
        self._lock; the waiting->running transition (_admit inside step())
        happens under the same lock, so the union of the two collections
        cannot miss a request."""
        names = {r.constraint for r in self._waiting if r.constraint}
        names.update(r.constraint for r in self.req
                     if r is not None and r.constraint)
        return names

    def _calloc(self, pad: int) -> int | None:
        """Best-fit a pad-row block from the free list, else extend the
        tail. Returns the base row or None."""
        fits = [(p, b) for b, p in self._cfree if p >= pad]
        if fits:
            p, b = min(fits)
            self._cfree.remove((b, p))
            if p > pad:
                self._cfree.append((b + pad, p - pad))
            return b
        if self._cused + pad <= self._cap:
            b = self._cused
            self._cused += pad
            return b
        return None

    def register_constraint(self, name: str, tc) -> None:
        """Register a grammar at runtime (per-request json_schema /
        guided_choice): writes the TokenConstraint's rows into the device
        table's reserved space (``constraint_rows``) — the table shape
        never changes, so no serving graph recompiles; in-flight requests
        keep decoding while the rows upload. Idempotent per name (callers
        hash the grammar into ``name`` so repeat clients reuse their
        block). Blocks round up to 64 rows so the uploader compiles for a
        handful of shapes, not one per schema. When the reserved space is
        exhausted, least-recently-used runtime grammars with NO in-flight
        requests are evicted (their blocks freed and coalesced); raises
        only when even eviction cannot make room. Construction-time
        grammars are permanent — they are part of fingerprint_cfg."""
        with self._work:
            if name in self._cstarts:
                self._clock += 1
                if name in self._clru:
                    self._clru[name] = self._clock
                return
            if self.spec:
                raise ValueError("constraints unsupported with spec_lookup")
            n = tc.trans.shape[0]
            assert tc.trans.shape[1] == self.cfg.vocab_size
            pad = -(-n // 64) * 64

            def try_alloc():
                # padded first; exact-fit fallback squeezes the last rows
                for want in dict.fromkeys((pad, n)):
                    b = self._calloc(want)
                    if b is not None:
                        return b, want
                return None, 0

            base, size = try_alloc()
            if base is None:
                # evict idle runtime grammars, LRU-first, until it fits
                busy = self._cinflight()
                for victim in sorted(self._cblocks,
                                     key=lambda k: self._clru.get(k, 0)):
                    if victim in busy:
                        continue
                    vb, vp = self._cblocks.pop(victim)
                    del self._cstarts[victim]
                    self._clru.pop(victim, None)
                    self._cfree.append((vb, vp))
                    # coalesce adjacent free blocks (and the tail)
                    self._cfree.sort()
                    merged = []
                    for fb, fp in self._cfree:
                        if merged and merged[-1][0] + merged[-1][1] == fb:
                            merged[-1] = (merged[-1][0], merged[-1][1] + fp)
                        else:
                            merged.append((fb, fp))
                    if merged and merged[-1][0] + merged[-1][1] == self._cused:
                        self._cused = merged.pop()[0]
                    self._cfree = merged
                    base, size = try_alloc()
                    if base is not None:
                        break
                if base is None:
                    raise ValueError(
                        f"constraint table full ({n} rows needed, "
                        f"{self._cap} total, every registered grammar "
                        "in flight) — raise constraint_rows "
                        "(serve_llm --constraint-rows)")
            blk = np.full((size, self.cfg.vocab_size), -1, np.int16)
            blk[:n] = np.where(
                tc.trans >= 0,
                (tc.trans.astype(np.int32) + base).astype(np.int16),
                np.int16(-1))
            self._ctab = self._cupd(self._ctab, jnp.asarray(blk), base)
            self._cstarts[name] = base + tc.start
            self._cblocks[name] = (base, size)
            self._clock += 1
            self._clru[name] = self._clock

    def cancel(self, r: Request) -> None:
        """Abandon a request (client disconnect / timeout): a waiting
        request is dropped immediately; a running one is retired at the
        next scheduler tick — only the scheduler thread touches slot
        state, so cancellation rides a flag, not a direct retire. The
        slot's written rows stay behind as reusable prefix history."""
        with self._work:
            if r.done:
                return
            if r in self._waiting:
                self._waiting.remove(r)
                if r.deadline is not None:
                    self._deadlines -= 1
                r._done.set()
                return
            self._cancel.add(r)
            self._work.notify()

    def start(self):
        """Run the scheduler on a daemon thread until ``close()``."""
        def loop():
            while True:
                with self._work:
                    if not self._stop and not self._has_work():
                        # going idle: one final gauge publish so /metrics
                        # shows the drained state, not the last busy tick
                        self._publish_metrics()
                    while not self._stop and not self._has_work():
                        self._work.wait(timeout=0.5)
                    if self._stop:
                        return
                try:
                    self.step()
                except Exception:     # scheduler must not die silently:
                    # an unexpected step() failure (bad request data, a
                    # device error) would otherwise hang every waiter
                    # forever — recover within the restart budget, else
                    # fail them loudly and refuse new work
                    import traceback
                    traceback.print_exc()
                    if self._recover():
                        continue
                    self._fail_all()
                    return
        self._thread = threading.Thread(target=loop, daemon=True,
                                        name="llm-serving")
        self._thread.start()
        return self

    def _recover(self) -> bool:
        """Scheduler crash recovery: reset all slot/device state and apply
        the requeue-or-fail policy to in-flight work, so a transient step()
        failure (a device hiccup, one poisoned request) doesn't take the
        whole engine down.

        Requeue-or-fail: a request whose client has not yet OBSERVED any
        token (none materialized — ``tokens`` empty) is requeued at the
        front of the waiting queue and re-runs from scratch; seeded
        requests redraw identically (llm.serving_row_keys is position-
        keyed, not step-keyed), unseeded ones redraw fresh — the same
        contract as a new submit. A request that already streamed tokens
        cannot be resumed (the cache rows are gone) and must not silently
        restart mid-stream, so it completes with ``failed=True`` and its
        partial tokens. Queued requests are untouched.

        Returns False when more than ``max_restarts`` recoveries landed
        within the last ``restart_window_s`` seconds — the caller then
        falls back to _fail_all (a crash LOOP should be loud, a rare
        crash survivable)."""
        now = time.monotonic()
        with self._work:
            while self._restart_marks and \
                    now - self._restart_marks[0] > self.restart_window_s:
                self._restart_marks.popleft()
            if len(self._restart_marks) >= self.max_restarts:
                return False
            self._restart_marks.append(now)
            self.stats["scheduler_restarts"] += 1
            # requeue-or-fail the in-flight slots (front of the queue, in
            # slot order — they were admitted earliest)
            requeue = []
            for b in range(self.n_slots):
                r = self.req[b]
                if r is not None and not r.done:
                    if r.tokens:
                        r.failed = True
                        r._done.set()
                    else:
                        r.t_first = None
                        requeue.append(r)
                self.req[b] = None
                self.phase[b] = _FREE
                self.epoch[b] += 1    # pending records for old occupants
                self.hist[b] = []     # are dropped; no prefix survives
            for r in reversed(requeue):
                self._waiting.appendleft(r)
            self._deadlines = sum(1 for w in self._waiting
                                  if w.deadline is not None)
            self._cancel = {r for r in self._cancel if not r.done}
            # device state: fresh caches/positions, zeroed sampling aux —
            # exactly the construction-time layout (old arrays may be
            # poisoned by the failed dispatch)
            self.state = llm.init_state(self.cfg, batch=self.n_slots,
                                        dtype=self._state_dtype,
                                        kv_quant=self._kv_quant)
            if self.spec:
                self.aux = llm.init_serving_aux(self.cfg, self.n_slots)
            self.cursor[:] = 0
            self.seg_idx = [0] * self.n_slots
            self.seg_start[:] = 0
            self._inject[:] = False
            self.samp[:] = 0.0
            self.samp[:, 1] = 1.0
            self.samp[:, 6] = 1.0
            self._temps_dev = jnp.asarray(self.samp)
            self._temps_dirty = False
            self._cnt_p = jnp.zeros_like(self._cnt_p)
            self._cnt_o = jnp.zeros_like(self._cnt_o)
            self._bias = jnp.zeros_like(self._bias)
            self._cinit_np[:] = -1
            self._cinit_dev = jnp.asarray(self._cinit_np)
            self._cinit_dirty = False
            self._cstate = jnp.full_like(self._cstate, -1)
            self._tok_dev = jnp.zeros_like(self._tok_dev)
            self._first_tok = jnp.zeros_like(self._first_tok)
            self._first_lp = jnp.zeros_like(self._first_lp)
            self._pending.clear()
            self._acc = []
        return True

    def _fail_all(self) -> None:
        """Scheduler death: complete every in-flight and queued request
        with ``failed=True`` (partial tokens kept) so clients unblock,
        and mark the engine dead — further submits raise immediately."""
        with self._work:
            self._dead = True
            for r in list(self._waiting):
                r.failed = True
                r._done.set()
            self._waiting.clear()
            for r in self.req:
                if r is not None and not r.done:
                    r.failed = True
                    r._done.set()

    def close(self):
        with self._work:
            self._stop = True
            self._work.notify_all()
        if self._thread is not None:
            self._thread.join(timeout=30)
        # a graceful close must not leave clients blocked in wait(): fail
        # whatever is still queued or mid-generation (they keep any partial
        # tokens), and make later submits error instead of hanging
        with self._work:
            self._dead = True
            for r in list(self._waiting):
                r.failed = True
                r._done.set()
            self._waiting.clear()
            for r in self.req:
                if r is not None and not r.done:
                    r.failed = True
                    r._done.set()

    # -- scheduler ---------------------------------------------------------

    def _has_work(self) -> bool:
        return bool(self._waiting) or bool(self._pending) \
            or bool(self._acc) or any(p != _FREE for p in self.phase)

    def has_work(self) -> bool:
        """Advisory: pending requests or unmaterialized tokens exist
        (external drivers — the NVR tick — poll this to decide whether
        to spend a tick on step())."""
        return self._has_work()

    def _reuse_len(self, b: int, r: Request) -> int:
        """CHUNK-aligned shared-prefix length between slot b's valid cache
        history and r's leading text segment — rows [0, R) need no
        recompute (reference utils/model.py:393-395 get_start_pos, lifted
        to multi-slot). CHUNK alignment keeps prefill chunk boundaries
        identical to the from-zero case (bitwise-equal K/V, and submit()'s
        chunk-window bound stays valid)."""
        if not self.prefix_cache or r.segments[0][0] != "text":
            return 0
        hist, toks = self.hist[b], r.segments[0][1]
        n = 0
        for h, t in zip(hist, toks):
            if h != t:
                break
            n += 1
        # always leave >=1 token to prefill: the first sampled token comes
        # from the final prompt position's forward
        n = min(n, r.total_len - 1)
        return n // llm.CHUNK * llm.CHUNK

    def _admit(self):
        free = [b for b in range(self.n_slots) if self.phase[b] == _FREE]
        while self._waiting and free:
            r = self._waiting.popleft()
            reuses = {s: self._reuse_len(s, r) for s in free}
            b = max(free, key=reuses.__getitem__)
            free.remove(b)
            reuse = reuses[b]
            self.req[b] = r
            self.phase[b] = _PREFILL
            self._admit_n += 1
            self._admit_seq[b] = self._admit_n   # age-fair prefill order
            self.cursor[b] = reuse
            # reuse == len(leading segment) (multimodal follow-up): the
            # whole text segment is already in cache — start at segment 1
            covered = reuse == len(r.segments[0][1]) if reuse else False
            self.seg_idx[b] = 1 if covered else 0
            self.seg_start[b] = reuse if covered else 0
            self.stats["reused_tokens"] += reuse
            self._seed_np[b] = (r.seed if r.seed is not None
                                else int(self._seed_rng.integers(1 << 31)))
            self._plen_np[b] = min(r.total_len, (1 << 31) - 1)
            ci = self._cstarts[r.constraint] if r.constraint else -1
            if ci != self._cinit_np[b]:
                self._cinit_np[b] = ci
                self._cinit_dirty = True
            row = np.asarray([r.temperature, r.top_p, float(r.top_k),
                              r.min_p, r.presence_penalty,
                              r.frequency_penalty, r.repetition_penalty,
                              1.0 if r.logit_bias else 0.0], np.float32)
            if not np.array_equal(self.samp[b], row):
                self.samp[b] = row
                self._temps_dirty = True
            if r.logit_bias:
                brow = np.zeros(self.cfg.vocab_size, np.float32)
                for t, v in r.logit_bias.items():
                    brow[int(t)] = float(v)
                self._bias = self._cnt_row_set(self._bias,
                                               jnp.asarray(brow), b)
            if r.pen_active:
                # fresh histograms for this occupant: prompt counts over
                # every text token (incl. any reused prefix — the graphs
                # never see those rows again), zero generated counts
                cp = np.zeros(self.cfg.vocab_size, np.int64)
                for s in r.segments:
                    if s[0] == "text" and s[1]:
                        cp += np.bincount(np.asarray(s[1], np.int64),
                                          minlength=self.cfg.vocab_size)
                self._cnt_p = self._cnt_row_set(
                    self._cnt_p, jnp.asarray(cp, jnp.int32), b)
                self._cnt_o = self._cnt_row_set(
                    self._cnt_o, jnp.zeros((self.cfg.vocab_size,),
                                           jnp.int32), b)

    def _retire(self, b: int, r: Request) -> None:
        mid_prefill = self.phase[b] == _PREFILL
        r.t_done = time.monotonic()
        # fold client-observed latency into engine EWMAs (alpha 0.2 —
        # same smoothing as runtime.metrics stage timers)
        if r.ttft_s is not None:
            self._ttft_ewma = (r.ttft_s if self._ttft_ewma is None
                               else 0.8 * self._ttft_ewma + 0.2 * r.ttft_s)
        if r.tpot_s is not None:
            self._tpot_ewma = (r.tpot_s if self._tpot_ewma is None
                               else 0.8 * self._tpot_ewma + 0.2 * r.tpot_s)
        if r.deadline is not None:
            self._deadlines -= 1
        self.phase[b] = _FREE
        self.req[b] = None
        self.epoch[b] += 1            # stale pending records become no-ops
        self._inject[b] = False
        if self.prefix_cache:
            # Cache rows still valid for a future occupant: the leading
            # text segment, plus (single-segment requests) every generated
            # token except the last — token i's K/V lands at row
            # total_len+i when it is CONSUMED producing token i+1; the
            # final token may only have been consumed by a lag-window junk
            # step, so its row is not trusted. (Spec windows hold the same
            # invariant: accepted token y_j is consumed at window position
            # pos+j+1 in the SAME dispatch, the bonus token at the next
            # window's start.)
            lead = r.segments[0][1] if r.segments[0][0] == "text" else []
            if len(r.segments) == 1:
                h = list(lead) + r.tokens[:-1]
            else:
                h = list(lead)
            # a CANCELLED request may retire mid-prefill: only rows the
            # cursor actually passed are written. Live retirements keep h
            # whole — under spec decoding the host cursor intentionally
            # lags the device position, so it must not truncate here.
            self.hist[b] = h[:int(self.cursor[b])] if mid_prefill else h
            # Park AT the history length, not 0: a free slot still rides in
            # every decode_all step, scribbling junk K/V at its park
            # position — parking below len(hist) would corrupt the very
            # prefix a future occupant reuses. (Cost: the Pallas decode
            # read bound max(pos) now includes parked histories.)
            self.cursor[b] = min(len(self.hist[b]),
                                 self.cfg.max_context - 1)
        else:
            self.cursor[b] = 0        # lowest-possible park position
        r._done.set()

    def _emit(self, b: int, tok: int, lp=None) -> None:
        """Record one (lag-materialized) token for slot b; retire on
        eos / max_new / context exhaustion. ``lp`` is the step's packed
        [1+2K] logprob row (parsed only when the request asked)."""
        r = self.req[b]
        r.tokens.append(tok)
        if r.logprobs and lp is not None:
            k = r.logprobs
            ids = lp[1 + llm.LP_K:1 + llm.LP_K + k].astype(np.int64)
            r.lp.append((float(lp[0]),
                         list(zip(ids.tolist(), lp[1:1 + k].tolist()))))
        if r.t_first is None:
            r.t_first = time.monotonic()
        ctx_full = r.total_len + len(r.tokens) >= self.cfg.max_context
        if tok in r.stop_ids or len(r.tokens) >= r.max_new or ctx_full:
            self._retire(b, r)

    @staticmethod
    def _start_fetch(arr) -> None:
        """Kick off the device->host copy at ISSUE time so the lagged
        np.asarray at pop time finds the bytes already in flight — through
        the axon tunnel a blocking materialization costs a full ~30 ms RTT
        even for long-completed results, the async-prefetched one ~7 ms
        (tools/tunnel_probe.py)."""
        try:
            arr.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass

    def _publish_metrics(self) -> None:
        """Mirror engine state into runtime.metrics (the same registry the
        NVR publishes to), so /metrics — JSON or Prometheus — shows serving
        occupancy and throughput counters wherever the engine runs (NVR
        summaries or the serve_llm daemon)."""
        from ..runtime import metrics
        live = sum(1 for p in self.phase if p == _LIVE)
        pref = sum(1 for p in self.phase if p == _PREFILL)
        metrics.gauge("serving.slots_live", live)
        metrics.gauge("serving.slots_prefill", pref)
        metrics.gauge("serving.slots_free", self.n_slots - live - pref)
        metrics.gauge("serving.waiting", len(self._waiting))
        if self._ttft_ewma is not None:
            metrics.gauge("serving.ttft_ms", round(self._ttft_ewma * 1e3, 2))
        if self._tpot_ewma is not None:
            metrics.gauge("serving.tpot_ms", round(self._tpot_ewma * 1e3, 2))
        for k, v in self.stats.items():
            metrics.gauge("serving." + k, v)

    def _flush_acc(self) -> None:
        """Stack the accumulated decode steps' tokens into one [k, B]
        device array, kick off its host copy, and queue a single pending
        record covering all k steps."""
        if not self._acc:
            return
        ts = [t for _, _, t, _ in self._acc]
        # pad to the one compiled arity (repeat the last step's tokens):
        # a ragged final flush would otherwise compile a NEW stack graph
        # per distinct k mid-serving; _process only reads rows with metas
        pad = self.fetch_every - len(ts)
        ts += [ts[-1]] * pad
        stacked = self._stack(*ts)
        self._start_fetch(stacked)
        lps = [lp for _, _, _, lp in self._acc]
        lp_stacked = None
        if lps[0] is not None:                       # non-spec decode steps
            lp_stacked = self._stack(*(lps + [lps[-1]] * pad))
            self._start_fetch(lp_stacked)
        self._pending.append(
            ("decs", [(e, m) for e, m, _, _ in self._acc], stacked,
             lp_stacked, self._step_n))
        self._acc = []

    @staticmethod
    def _materialize(rec):
        """Sync a pending record's device arrays to host np arrays. Kept
        separate from _process so the (possibly RTT-long) sync runs outside
        the engine lock while _process runs under it."""
        if rec[0] == "first":
            k, b, ep, tok, lp, born = rec
            return (k, b, ep, np.asarray(tok),
                    None if lp is None else np.asarray(lp), born)
        k, metas, stacked, lp_stacked, born = rec
        return (k, metas, np.asarray(stacked),
                None if lp_stacked is None else np.asarray(lp_stacked), born)

    def _process(self, rec) -> None:
        """Materialize one pending record (the device work is usually done
        by now — this sync is the pipeline's tail, not its critical path).
        Called under self._lock when reached from step() (see _materialize);
        the np.asarray calls below are then free no-ops."""
        if rec[0] == "first":
            _, b, ep, tok_dev, lp_dev, _born = rec   # [B] first_tok snapshot
            if self.phase[b] == _LIVE and self.epoch[b] == ep:
                lp = None if lp_dev is None else np.asarray(lp_dev)[b]
                self._emit(b, int(np.asarray(tok_dev)[b]), lp)
            return
        _, metas, stacked, lp_stacked, _born = rec   # k decode steps at once
        arr = np.asarray(stacked)             # [k, B] / spec: [k, B, G+2]
        lp_arr = None if lp_stacked is None else np.asarray(lp_stacked)
        for j, (epochs, mask) in enumerate(metas):
            # a retirement at step j bumps the slot's epoch, so that
            # slot's rows j+1..k-1 of this same record auto-drop
            for b in range(self.n_slots):
                if mask[b] and self.phase[b] == _LIVE \
                        and self.epoch[b] == epochs[b]:
                    if not self.spec:
                        self._emit(b, int(arr[j, b]),
                                   None if lp_arr is None else lp_arr[j, b])
                        continue
                    # spec window: n_emit leading candidates; _emit may
                    # retire mid-window (eos/max_new/deadline), dropping
                    # the rest — the junk the device consumed past the
                    # stop point is never claimed as prefix history
                    n = min(int(arr[j, b, -1]), self.spec + 1)
                    self.stats["spec_emitted"] += max(n, 0)
                    for t in arr[j, b, :n]:
                        if self.phase[b] != _LIVE \
                                or self.epoch[b] != epochs[b]:
                            break
                        self._emit(b, int(t))

    def _prefill_batched(self, rows: list) -> None:
        """Advance every row in ``rows`` (all mid-prefill, on text
        segments) by one chunk with a single prefill_many dispatch. meta
        rows are [start_pos, n_real, valid, seed]; invalid rows park at their
        cursor (same policy as decode_all) and their caches are untouched
        (write_mask inside the graph; SSM/hybrid stacks scan the chunk
        T=1 with per-token row gating — llm.make_serving_fns)."""
        toks = np.zeros((self.n_slots, llm.CHUNK), np.int32)
        meta = np.zeros((4, self.n_slots), np.int32)
        meta[3] = self._seed_np                  # spec graphs take [:3]
        meta[0] = np.minimum(self.cursor, self.cfg.max_context - 1)
        meta[1] = 1                              # keep n_real-1 >= 0
        fin = []                                 # (b, request, new_cursor)
        for b in rows:
            r = self.req[b]
            cur = int(self.cursor[b])
            seg_toks = r.segments[self.seg_idx[b]][1]
            off = cur - int(self.seg_start[b])
            n = min(llm.CHUNK, len(seg_toks) - off)
            toks[b, :n] = seg_toks[off:off + n]
            meta[0, b] = cur
            meta[1, b] = n
            meta[2, b] = 1
            fin.append((b, r, cur + n, off + n == len(seg_toks)))
            self.stats["prefill_chunks"] += 1
            self.stats["prefill_tokens"] += n
        self.stats["prefill_batched_steps"] += 1
        if self._temps_dirty:
            self._temps_dev = jnp.asarray(self.samp)
            self._temps_dirty = False
        self._step_n += 1
        if self.spec:
            self._first_tok, self.state, self.aux = self.prefill_many(
                self.params, self.state, self.aux, self._first_tok,
                jnp.asarray(toks), jnp.asarray(meta[:3]), self._temps_dev,
                self._step_n, self._base_key, self._cnt_p, self._cnt_o,
                self._bias)
        else:
            if self._cinit_dirty:
                self._cinit_dev = jnp.asarray(self._cinit_np)
                self._cinit_dirty = False
            (self._first_tok, self._first_lp, self.state,
             self._cstate) = self.prefill_many(
                self.params, self.state, self._first_tok, self._first_lp,
                jnp.asarray(toks), jnp.asarray(meta), self._temps_dev,
                self._base_key, self._cnt_p, self._cnt_o,
                self._bias, self._ctab, self._cinit_dev, self._cstate)
        fetched = False
        with self._lock:
            for b, r, new_cur, seg_done in fin:
                self.cursor[b] = new_cur
                if seg_done:
                    self.seg_idx[b] += 1
                    self.seg_start[b] = new_cur
                    if self.seg_idx[b] == len(r.segments):
                        self.phase[b] = _LIVE
                        self._inject[b] = True   # device value, no sync
                        if not fetched:
                            self._start_fetch(self._first_tok)
                            if not self.spec:
                                self._start_fetch(self._first_lp)
                            fetched = True
                        self._pending.append(
                            ("first", b, self.epoch[b], self._first_tok,
                             None if self.spec else self._first_lp,
                             self._step_n))

    def step(self) -> bool:
        """One scheduler tick; returns False when there was nothing to do."""
        with self._lock:
            if self._deadlines:
                now = time.monotonic()
                for b in range(self.n_slots):
                    r = self.req[b]
                    if r is not None and r.deadline is not None \
                            and now >= r.deadline:
                        r.timed_out = True
                        self._retire(b, r)   # keeps its partial tokens
                for r in [w for w in self._waiting
                          if w.deadline is not None and now >= w.deadline]:
                    self._waiting.remove(r)
                    r.timed_out = True
                    self._deadlines -= 1
                    r._done.set()
            if self._cancel:
                for b in range(self.n_slots):
                    if self.req[b] in self._cancel:
                        self._retire(b, self.req[b])
                # anything left was already retired on its own
                self._cancel.clear()
            self._admit()
            # oldest-admission-first, NOT slot-index order: pre[0] decides
            # whether this tick serves a custom (image) segment, and an
            # index-ordered list could starve a high-indexed VLM slot for
            # as long as lower slots kept re-admitting text prompts
            pre = sorted((b for b in range(self.n_slots)
                          if self.phase[b] == _PREFILL),
                         key=lambda b: self._admit_seq[b])
            has_dec = any(
                self.phase[b] == _LIVE
                and (self.spec or self.cursor[b] <= self.cfg.max_context - 1)
                for b in range(self.n_slots))

        # chunked-prefill fairness: when BOTH prefill and decode work
        # exist, alternate ticks — an unconditional prefill-first policy
        # let one long uncached prompt stall every live decode for its
        # whole admission (hundreds of chunks), not the documented
        # one-chunk gap. Pure-prefill / pure-decode states are unaffected.
        if pre and has_dec and self._prefer_decode:
            pre = []
        did = False
        batch_rows = []
        if pre and self.prefill_many is not None \
                and self.req[pre[0]].segments[self.seg_idx[pre[0]]][0] \
                == "text":
            # every mid-prefill slot currently on a TEXT segment advances
            # one chunk in ONE dispatch (shared weight sweep). A slot on a
            # custom (image) segment waits; age-ordered pre bounds the wait
            batch_rows = [b for b in pre if self.req[b]
                          .segments[self.seg_idx[b]][0] == "text"]
        if len(batch_rows) >= 2:
            self._prefill_batched(batch_rows)
            self._prefer_decode = True
            did = True
        elif pre:
            b = pre[0]
            r = self.req[b]
            cur = int(self.cursor[b])
            seg = r.segments[self.seg_idx[b]]
            if seg[0] == "custom":
                # one tick = the whole custom segment (e.g. an image
                # prefill writing n_positions entries into this slot)
                _, payload, n = seg
                self.state = self.custom_prefill(self.state, b, cur, payload)
                with self._lock:
                    self.cursor[b] = cur + n
                    self.seg_idx[b] += 1
                    self.seg_start[b] = cur + n
                self._prefer_decode = True
                return True
            toks = seg[1]
            off = cur - int(self.seg_start[b])
            n = min(llm.CHUNK, len(toks) - off)
            chunk = toks[off:off + n] + [0] * (llm.CHUNK - n)
            self._step_n += 1
            self.stats["prefill_chunks"] += 1
            self.stats["prefill_tokens"] += n
            if self.spec:
                self._first_tok, self.state, self.aux = self.prefill_slot(
                    self.params, self.state, self.aux, self._first_tok,
                    jnp.asarray([chunk], jnp.int32), b, cur, n,
                    jnp.asarray(self.samp[b]), self._step_n, self._base_key,
                    self._cnt_p, self._cnt_o, self._bias)
            else:
                if self._cinit_dirty:
                    self._cinit_dev = jnp.asarray(self._cinit_np)
                    self._cinit_dirty = False
                (self._first_tok, self._first_lp, self.state,
                 self._cstate) = self.prefill_slot(
                    self.params, self.state, self._first_tok,
                    self._first_lp, jnp.asarray([chunk], jnp.int32),
                    b, cur, n, jnp.asarray(self.samp[b]),
                    int(self._seed_np[b]),
                    self._base_key, self._cnt_p, self._cnt_o, self._bias,
                    self._ctab, self._cinit_dev, self._cstate)
            with self._lock:
                self.cursor[b] = cur + n
                if off + n == len(toks):
                    self.seg_idx[b] += 1
                    self.seg_start[b] = cur + n
                    if self.seg_idx[b] == len(r.segments):
                        self.phase[b] = _LIVE
                        self._inject[b] = True       # device value, no sync
                        self._start_fetch(self._first_tok)
                        if not self.spec:
                            self._start_fetch(self._first_lp)
                        self._pending.append(
                            ("first", b, self.epoch[b], self._first_tok,
                             None if self.spec else self._first_lp,
                             self._step_n))
            self._prefer_decode = True
            did = True
        else:
            self._prefer_decode = False
            dec = [b for b in range(self.n_slots)
                   if self.phase[b] == _LIVE
                   and (self.spec
                        or self.cursor[b] <= self.cfg.max_context - 1)]
            if dec:
                mask = np.zeros(self.n_slots, bool)
                mask[dec] = True
                self.stats["decode_steps"] += 1
                if self._temps_dirty:
                    self._temps_dev = jnp.asarray(self.samp)
                    self._temps_dirty = False
                self._step_n += 1
                if self.spec:
                    # positions are DEVICE-resident in spec mode (advance
                    # is data-dependent); meta carries only [live, inject]
                    meta = np.zeros((2, self.n_slots), np.int32)
                    meta[0] = mask
                    meta[1] = self._inject
                    self._inject[:] = False
                    out_dev, self.state, self.aux, self._cnt_o = \
                        self.decode_all(
                            self.params, self.state, self.aux,
                            self._first_tok, jnp.asarray(meta),
                            self._temps_dev, self._step_n, self._base_key,
                            self._cnt_o, self._cnt_p, self._bias)
                    self._acc.append((tuple(self.epoch), mask, out_dev,
                                      None))
                else:
                    # one packed upload per step:
                    # [pos, live, inject, seed, plen]
                    meta = np.zeros((5, self.n_slots), np.int32)
                    meta[0] = np.minimum(self.cursor,
                                         self.cfg.max_context - 1)
                    meta[1] = mask
                    meta[2] = self._inject
                    meta[3] = self._seed_np
                    meta[4] = self._plen_np
                    self._inject[:] = False
                    (tok_dev, self.state, self._cnt_o, lp_dev,
                     self._cstate) = self.decode_all(
                        self.params, self.state, self._tok_dev,
                        self._first_tok, jnp.asarray(meta),
                        self._temps_dev, self._base_key,
                        self._cnt_o, self._cnt_p, self._bias,
                        self._ctab, self._cstate)
                    self._tok_dev = tok_dev
                    with self._lock:
                        for b in dec:
                            self.cursor[b] += 1
                    self._acc.append((tuple(self.epoch), mask, tok_dev,
                                      lp_dev))
                if len(self._acc) >= self.fetch_every:
                    self._flush_acc()
                did = True

        # materialize by AGE: a record syncs only once its newest element
        # is >= sync_lag dispatches behind the head of the pipeline, so the
        # device always has sync_lag steps in flight when the host blocks —
        # a count-based target would sync a freshly-flushed [k,B] stack
        # whose last step is 1 dispatch old and collapse the pipeline
        # (measured: 540 vs 846 tok/s on the 8x192 ladder). When the device
        # has nothing left to chew on, flush and drain everything.
        target = self.sync_lag if did else 0
        if not did:
            self._flush_acc()

        popped = False
        while self._pending and self._step_n - self._pending[0][-1] >= target:
            with self._lock:
                rec = self._pending.popleft()
            # blocking device->host sync OUTSIDE the lock (can cost a full
            # tunnel RTT), then bookkeeping UNDER it: _process's
            # _emit/_retire mutate phase/req/epoch/_deadlines, and the
            # unlocked decrement of _deadlines raced submit()'s locked
            # increment (a lost update could disable deadline enforcement)
            rec = self._materialize(rec)
            with self._lock:
                self._process(rec)
            popped = True
        # publish occupancy/throughput gauges at a bounded rate: every 32
        # ticks while busy, and once on the busy->idle transition so the
        # final counters land even for short bursts
        self._tick_n += 1
        if self._tick_n % 32 == 0 or not (did or popped):
            self._publish_metrics()
        return did or popped

    def run_until_idle(self, max_steps: int = 1_000_000):
        """Drive the scheduler inline (tests / synchronous callers)."""
        for _ in range(max_steps):
            if not self.step():
                return
        raise RuntimeError("serving engine did not drain")
