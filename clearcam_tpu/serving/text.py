"""Text-in/text-out adapter over the continuous-batching engine.

Pairs a ServingEngine with an LLMTokenizer so callers (the HTTP
/generate endpoint, the serve_llm CLI) speak strings while the engine
speaks token ids. Chat framing uses the tokenizer's preset-aware helpers
(utils/llm_tokenizer.role/end_turn/prefix — the reference's chat presets,
qwen3vl.py:71-90); ``raw=True`` skips framing for completion-style use.

Streaming: token ids land on ``Request.tokens`` as the engine
materializes them; ``text_delta`` re-decodes the full id list each call
and returns the suffix past what the caller has seen — re-decoding (not
per-token decode) keeps multi-byte BPE merges correct at chunk borders.
"""
from __future__ import annotations

from .engine import Request, ServingEngine


class TextServing:
    """String-level submit/stream over a (engine, tokenizer) pair."""

    def __init__(self, engine, tok, chat: bool = True):
        # accept a raw ServingEngine or a wrapper exposing .engine (VLM)
        self.engine: ServingEngine = getattr(engine, "engine", engine)
        self.tok = tok
        self.chat = chat

    def has_work(self) -> bool:
        return self.engine._has_work()

    def cancel(self, req: Request) -> None:
        self.engine.cancel(req)

    def encode_prompt(self, prompt: str, raw: bool = False) -> list[int]:
        if raw or not self.chat:
            return self.tok.encode(prompt)
        return (self.tok.prefix() + self.tok.role("user")
                + self.tok.encode(prompt) + self.tok.end_turn()
                + self.tok.role("assistant"))

    def encode_messages(self, messages) -> list[int]:
        """OpenAI-style ``[{"role": .., "content": ..}]`` history -> chat-
        framed ids (every turn via the tokenizer preset), ending with the
        assistant role header so generation continues the reply."""
        ids = list(self.tok.prefix())
        for m in messages:
            ids += (self.tok.role(str(m.get("role", "user")))
                    + self.tok.encode(str(m.get("content", "")))
                    + self.tok.end_turn())
        return ids + self.tok.role("assistant")

    def _stops(self):
        stop = {self.tok.eos_id}
        if getattr(self.tok, "eot_id", None) is not None:
            stop.add(self.tok.eot_id)
        return stop

    def submit(self, prompt: str, max_new: int = 128,
               temperature: float = 0.0, raw: bool = False,
               timeout_s: float | None = None, **samp) -> Request:
        """``samp``: any engine sampling knobs (top_p, top_k, min_p,
        presence_penalty, frequency_penalty, repetition_penalty)."""
        return self.engine.submit(self.encode_prompt(prompt, raw),
                                  max_new=max_new, temperature=temperature,
                                  eos_id=self._stops(), timeout_s=timeout_s,
                                  **samp)

    def submit_messages(self, messages, max_new: int = 128,
                        temperature: float = 0.0,
                        timeout_s: float | None = None, **samp) -> Request:
        """Multi-turn chat submission (the /v1/chat/completions body)."""
        return self.engine.submit(self.encode_messages(messages),
                                  max_new=max_new, temperature=temperature,
                                  eos_id=self._stops(), timeout_s=timeout_s,
                                  **samp)

    def _visible(self, req: Request) -> list[int]:
        toks = list(req.tokens)
        # only strip a TRAILING end token: re-decoding a stable prefix is
        # what keeps streamed deltas append-only
        while toks and self.tok.is_end(toks[-1]):
            toks.pop()
        return toks

    def text(self, req: Request) -> str:
        return self.tok.decode(self._visible(req))

    def logprobs_payload(self, req: Request, chat: bool = False,
                         n_top: int = 0, max_chars: int | None = None):
        """OpenAI logprobs object for a finished request (the engine
        recorded ``Request.lp`` rows because submit got logprobs=k).

        Completions shape: {tokens, token_logprobs, top_logprobs,
        text_offset}; chat shape: {content: [{token, logprob, bytes,
        top_logprobs: [...]}]}. Token strings decode per id — a
        multi-byte char split across ids shows U+FFFD here by design
        (the OpenAI schema is per-token; joined text is the text field).
        Covers visible tokens only (trailing end tokens stripped, same
        as text()); ``max_chars`` further cuts to tokens starting before
        that text offset (host-side stop-sequence truncation — the
        payload stays aligned with the truncated text field)."""
        out = self._lp_build(req, 0, chat, n_top, max_chars)[0]
        if out is None:                   # zero visible tokens: empty shape
            out = {"content": []} if chat else {
                "tokens": [], "token_logprobs": [],
                "top_logprobs": [] if n_top else None, "text_offset": []}
        return out

    def logprobs_delta(self, req: Request, start: int, chat: bool = False,
                       n_top: int = 0, max_chars: int | None = None):
        """Streaming slice of logprobs_payload: entries for visible
        tokens [start:] whose rows have materialized -> (payload | None,
        next_start). text_offset stays absolute (offsets into the full
        generated text), so concatenating chunk payloads reconstructs
        the non-streamed object."""
        return self._lp_build(req, start, chat, n_top, max_chars)

    def _lp_build(self, req, start, chat, n_top, max_chars):
        toks = self._visible(req)
        rows = req.lp[:len(toks)]
        strs = [self.tok.decode([t]) for t in toks[:len(rows)]]
        n = len(rows)
        if max_chars is not None:
            pos = n = 0
            for s in strs:
                if pos >= max_chars:
                    break
                pos += len(s)
                n += 1
        if start >= n:
            return None, max(start, n)

        def alts(row):
            return {self.tok.decode([i]): lp for i, lp in row[1][:n_top]}

        if not chat:
            offs, pos = [], sum(len(s) for s in strs[:start])
            for s in strs[start:n]:
                offs.append(pos)
                pos += len(s)
            return ({"tokens": strs[start:n],
                     "token_logprobs": [r[0] for r in rows[start:n]],
                     "top_logprobs": ([alts(r) for r in rows[start:n]]
                                      if n_top else None),
                     "text_offset": offs}, n)
        return ({"content": [
            {"token": s, "logprob": r[0], "bytes": list(s.encode()),
             "top_logprobs": [
                 {"token": self.tok.decode([i]), "logprob": lp,
                  "bytes": list(self.tok.decode([i]).encode())}
                 for i, lp in r[1][:n_top]]}
            for s, r in zip(strs[start:n], rows[start:n])]}, n)

    def text_delta(self, req: Request, seen: str) -> str:
        """Newly-decodable text past ``seen`` (monotone under streaming).

        BPE ids decode to byte runs, so a char split ACROSS tokens shows
        up transiently as a trailing U+FFFD (LLMTokenizer.decode uses
        errors="replace") — hold trailing replacement chars back until
        the request finishes, which keeps the emitted stream append-only."""
        full = self.text(req)
        if not req.done:
            while full.endswith("�"):
                full = full[:-1]
        return full[len(seen):] if full.startswith(seen) else full
