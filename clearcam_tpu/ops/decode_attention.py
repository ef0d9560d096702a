"""Pallas TPU kernel: single-token (decode) GQA attention over a KV cache,
reading only the valid prefix.

Why a kernel: the XLA decode path attends over the full static
[max_context] cache every step — at 2000-token context that is ~16 MB of
K/V HBM traffic per layer per token even when only 50 tokens are live.
This kernel keeps the caches in HBM (`pl.ANY`), double-buffers chunk DMAs
into VMEM, and *skips the DMA entirely* for chunks beyond `pos`
(@pl.when-guarded copies), so decode bandwidth scales with the actual
context length. Online (flash-style) softmax accumulates across chunks.

Shapes:
    q        [H, D]          query for one token (all heads)
    k_cache  [KvH, S, D]     S = padded max context (multiple of CHUNK)
    v_cache  [KvH, S, D]
    pos      scalar int32    number of valid cache entries (attend to
                             positions 0..pos inclusive — the current token's
                             K/V must already be written at index pos)
    -> out   [H, D]

Grid: one program per KV head; each handles its rep = H/KvH query heads.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256


def decode_attention(q, k_cache, v_cache, pos, *, chunk: int = CHUNK,
                     interpret: bool = False):
    """q [H,D], caches [KvH,S,D], pos scalar -> [H,D]."""
    h, d = q.shape
    kvh, s, _ = k_cache.shape
    assert s % chunk == 0, f"padded context {s} must be a multiple of {chunk}"
    rep = h // kvh
    scale = 1.0 / (d ** 0.5)
    pos = jnp.asarray([pos], jnp.int32)
    q3 = q.reshape(kvh, rep, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kvh,),
        in_specs=[
            pl.BlockSpec((1, rep, d), lambda i, pos_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, rep, d), lambda i, pos_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_chunked_kernel, chunk=chunk, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kvh, rep, d), q.dtype),
        interpret=interpret,
    )(pos, q3, k_cache, v_cache)
    return out.reshape(h, d)


def _chunked_kernel(pos_ref, q_ref, k_ref, v_ref, out_ref, *, chunk, scale):
    """Per-KV-head program: double-buffered chunk DMA + online softmax."""
    kvh = pl.program_id(0)
    rep, d = q_ref.shape[1], q_ref.shape[2]
    s = k_ref.shape[1]
    n_chunks = s // chunk
    pos = pos_ref[0]

    def body(k_buf, v_buf, sem_k, sem_v):
        q = q_ref[0].astype(jnp.float32) * scale

        def start_dma(slot, c):
            pltpu.make_async_copy(k_ref.at[kvh, pl.ds(c * chunk, chunk), :],
                                  k_buf.at[slot], sem_k.at[slot]).start()
            pltpu.make_async_copy(v_ref.at[kvh, pl.ds(c * chunk, chunk), :],
                                  v_buf.at[slot], sem_v.at[slot]).start()

        def wait_dma(slot, c):
            pltpu.make_async_copy(k_ref.at[kvh, pl.ds(c * chunk, chunk), :],
                                  k_buf.at[slot], sem_k.at[slot]).wait()
            pltpu.make_async_copy(v_ref.at[kvh, pl.ds(c * chunk, chunk), :],
                                  v_buf.at[slot], sem_v.at[slot]).wait()

        start_dma(0, 0)

        def loop(c, carry):
            acc, m, l = carry

            @pl.when((c + 1) * chunk <= pos)
            def _():
                start_dma((c + 1) % 2, c + 1)

            def attend(carry):
                acc, m, l = carry
                wait_dma(c % 2, c)
                k = k_buf[c % 2].astype(jnp.float32)
                v = v_buf[c % 2].astype(jnp.float32)
                scores = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) \
                    + c * chunk
                scores = jnp.where(cols <= pos, scores, -jnp.inf)
                m_new = jnp.maximum(m, scores.max(-1, keepdims=True))
                p = jnp.exp(scores - m_new)
                alpha = jnp.exp(m - m_new)
                l_new = l * alpha + p.sum(-1, keepdims=True)
                acc_new = acc * alpha + jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc_new, m_new, l_new

            return jax.lax.cond(c * chunk <= pos, attend, lambda cry: cry,
                                (acc, m, l))

        init = (jnp.zeros((rep, d), jnp.float32),
                jnp.full((rep, 1), -jnp.inf, jnp.float32),
                jnp.zeros((rep, 1), jnp.float32))
        acc, m, l = jax.lax.fori_loop(0, n_chunks, loop, init)
        out_ref[0] = (acc / l).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((2, chunk, d), k_ref.dtype),
        v_buf=pltpu.VMEM((2, chunk, d), v_ref.dtype),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
    )


# ---------------------------------------------------------------------------
# batched variant (B>1): per-row live windows for right-aligned generation
# ---------------------------------------------------------------------------

def decode_attention_batch(q, k_cache, v_cache, pos, pads=None, *,
                           chunk: int = CHUNK, interpret: bool = False):
    """Batched decode attention: q [B,H,D], caches [B,KvH,S,D] -> [B,H,D].

    pos: the live position — a shared scalar (right-aligned generate_batch:
    every row's current token K/V is at index pos) or a per-row [B] vector
    (continuous-batching serving, models/llm.make_serving_fns: every slot
    at its own absolute position). pads [B] gives each row's left-pad width
    (zero in serving). Row b attends exactly to positions pads[b]..pos[b].
    HBM reads stop at max_b(pos)//chunk — with live positions far below the
    cache length (the serving steady state) this reads a fraction of what
    XLA's full-cache attention reads.

    Grid is (KvH,) with ALL B rows per program: a first cut with grid
    (B, KvH) ran one tiny [rep, chunk] matmul per small DMA and measured
    DMA-latency-bound — slower than XLA at every batch size (PERF.md).
    This layout moves [B, chunk, D] per copy (B× the bytes per DMA
    descriptor set) and feeds batched dot_generals, so the chunk loop
    amortizes latency. Chunks before min_b(pads)//chunk or beyond pos are
    never DMA'd, keeping the reads-scale-with-live-context property.

    Measured outcome (B=8, ctx 2048, 2B int8 model, real v5e — PERF.md):
    −3% vs the XLA batched einsum at pos 256, −16% at pos 1984 — XLA's
    full-cache attention hides behind the weight-bound matmuls at this
    size, so generate_batch defaults to XLA; use this kernel only when the
    live KV volume rivals the weight bytes (very long contexts).
    """
    b_n, h, d = q.shape
    _, kvh, s, _ = k_cache.shape
    assert s % chunk == 0, f"padded context {s} must be a multiple of {chunk}"
    rep = h // kvh
    scale = 1.0 / (d ** 0.5)
    if pads is None:
        pads = jnp.zeros((b_n,), jnp.int32)
    pos_v = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (b_n,))
    scalars = jnp.concatenate([pos_v, jnp.asarray(pads, jnp.int32)])
    q4 = q.reshape(b_n, kvh, rep, d).transpose(1, 0, 2, 3)  # [KvH,B,rep,D]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kvh,),
        in_specs=[
            pl.BlockSpec((1, b_n, rep, d), lambda i, sc: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, b_n, rep, d), lambda i, sc: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_batch_kernel, chunk=chunk, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kvh, b_n, rep, d), q.dtype),
        interpret=interpret,
    )(scalars, q4, k_cache, v_cache)
    return out.transpose(1, 0, 2, 3).reshape(b_n, h, d)


def _batch_kernel(sc_ref, q_ref, k_ref, v_ref, out_ref, *, chunk, scale):
    """Per-kv-head program over all B rows, per-row windows [lo_b, pos_b]."""
    kvh = pl.program_id(0)
    b_n, rep, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    s = k_ref.shape[2]
    n_chunks = s // chunk
    # SMEM only supports scalar loads — gather the per-row positions and
    # pad starts element-wise (b_n is static and small)
    pos_scalars = [sc_ref[i] for i in range(b_n)]
    lo_scalars = [sc_ref[b_n + i] for i in range(b_n)]
    pos_max = functools.reduce(jnp.maximum, pos_scalars)
    c_lo = functools.reduce(jnp.minimum, lo_scalars) // chunk

    def body(k_buf, v_buf, sem_k, sem_v):
        q = q_ref[0].astype(jnp.float32) * scale    # [B, rep, D]
        # Mosaic cannot reshape a 1-D vector to [B,1,1] for broadcasting;
        # materialize each row's bounds over [B, rep, chunk] by selecting
        # scalars against a batch-index iota instead
        bidx = jax.lax.broadcasted_iota(jnp.int32, (b_n, rep, chunk), 0)
        lo_t = jnp.zeros((b_n, rep, chunk), jnp.int32)
        pos_t = jnp.zeros((b_n, rep, chunk), jnp.int32)
        for i, (lo_i, pos_i) in enumerate(zip(lo_scalars, pos_scalars)):
            lo_t = jnp.where(bidx == i, lo_i, lo_t)
            pos_t = jnp.where(bidx == i, pos_i, pos_t)

        def start_dma(slot, c):
            pltpu.make_async_copy(k_ref.at[:, kvh, pl.ds(c * chunk, chunk), :],
                                  k_buf.at[slot], sem_k.at[slot]).start()
            pltpu.make_async_copy(v_ref.at[:, kvh, pl.ds(c * chunk, chunk), :],
                                  v_buf.at[slot], sem_v.at[slot]).start()

        def wait_dma(slot, c):
            pltpu.make_async_copy(k_ref.at[:, kvh, pl.ds(c * chunk, chunk), :],
                                  k_buf.at[slot], sem_k.at[slot]).wait()
            pltpu.make_async_copy(v_ref.at[:, kvh, pl.ds(c * chunk, chunk), :],
                                  v_buf.at[slot], sem_v.at[slot]).wait()

        # first needed chunk's DMA is issued up front (dynamic index);
        # attended iterations prefetch their successor, so slot parity
        # stays c % 2 and no chunk is ever copied twice
        start_dma(c_lo % 2, c_lo)

        def loop(c, carry):
            acc, m, l = carry
            attended = (c >= c_lo) & (c * chunk <= pos_max)

            @pl.when(attended & ((c + 1) * chunk <= pos_max))
            def _():
                start_dma((c + 1) % 2, c + 1)

            def attend(carry):
                acc, m, l = carry
                wait_dma(c % 2, c)
                k = k_buf[c % 2].astype(jnp.float32)      # [B, chunk, D]
                v = v_buf[c % 2].astype(jnp.float32)
                scores = jax.lax.dot_general(              # [B, rep, chunk]
                    q, k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2) \
                    + c * chunk
                live = (cols >= lo_t) & (cols <= pos_t)
                scores = jnp.where(live, scores, -jnp.inf)
                m_new = jnp.maximum(m, scores.max(-1, keepdims=True))
                # a row with NO live cols in this chunk keeps m_new = -inf;
                # exp(-inf - -inf) would NaN, so shift by a finite max
                # (exp(-inf - 0) = 0 contributes nothing)
                m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
                p = jnp.exp(scores - m_safe)
                alpha = jnp.exp(m - m_safe)
                l_new = l * alpha + p.sum(-1, keepdims=True)
                acc_new = acc * alpha + jax.lax.dot_general(
                    p, v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                return acc_new, m_new, l_new

            return jax.lax.cond(attended, attend, lambda cry: cry,
                                (acc, m, l))

        init = (jnp.zeros((b_n, rep, d), jnp.float32),
                jnp.full((b_n, rep, 1), -jnp.inf, jnp.float32),
                jnp.zeros((b_n, rep, 1), jnp.float32))
        acc, m, l = jax.lax.fori_loop(0, n_chunks, loop, init)
        out_ref[0] = (acc / l).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((2, b_n, chunk, d), k_ref.dtype),
        v_buf=pltpu.VMEM((2, b_n, chunk, d), v_ref.dtype),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
    )


def decode_attention_batch_q8(q, k_q8, k_s, v_q8, v_s, pos, pads=None, *,
                              chunk: int = CHUNK, interpret: bool = False):
    """Batched decode attention over int8 KV caches: q [B,H,D],
    k_q8/v_q8 [B,KvH,S,D] int8, k_s/v_s [B,KvH,S] f32 per-token scales.
    Per-row live windows as decode_attention_batch; dequant rides on the
    score/probability vectors as in decode_attention_q8."""
    b_n, h, d = q.shape
    _, kvh, s, _ = k_q8.shape
    assert s % chunk == 0, f"padded context {s} must be a multiple of {chunk}"
    rep = h // kvh
    scale = 1.0 / (d ** 0.5)
    if pads is None:
        pads = jnp.zeros((b_n,), jnp.int32)
    pos_v = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (b_n,))
    scalars = jnp.concatenate([pos_v, jnp.asarray(pads, jnp.int32)])
    q4 = q.reshape(b_n, kvh, rep, d)
    # scales as [B, KvH, 1, S] — see decode_attention_q8's layout note
    k_s = k_s.reshape(b_n, kvh, 1, s)
    v_s = v_s.reshape(b_n, kvh, 1, s)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_n, kvh),
        in_specs=[
            pl.BlockSpec((1, 1, rep, d), lambda b, i, sc: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, d), lambda b, i, sc: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_batch_kernel_q8, chunk=chunk, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_n, kvh, rep, d), q.dtype),
        interpret=interpret,
    )(scalars, q4, k_q8, k_s, v_q8, v_s)
    return out.reshape(b_n, h, d)


def _batch_kernel_q8(sc_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref,
                     *, chunk, scale):
    b = pl.program_id(0)
    kvh = pl.program_id(1)
    rep, d = q_ref.shape[2], q_ref.shape[3]
    s = k_ref.shape[2]
    b_n = pl.num_programs(0)
    n_chunks = s // chunk
    pos = sc_ref[b]            # per-row position (scalar pos is broadcast)
    lo = sc_ref[b_n + b]
    c_lo = lo // chunk

    def body(k_buf, v_buf, ks_buf, vs_buf, sem_k, sem_v, sem_ks, sem_vs):
        q = q_ref[0, 0].astype(jnp.float32) * scale

        def dmas(slot, c):
            return (
                pltpu.make_async_copy(
                    k_ref.at[b, kvh, pl.ds(c * chunk, chunk), :],
                    k_buf.at[slot], sem_k.at[slot]),
                pltpu.make_async_copy(
                    v_ref.at[b, kvh, pl.ds(c * chunk, chunk), :],
                    v_buf.at[slot], sem_v.at[slot]),
                pltpu.make_async_copy(
                    ks_ref.at[b, kvh, :, pl.ds(c * chunk, chunk)],
                    ks_buf.at[slot], sem_ks.at[slot]),
                pltpu.make_async_copy(
                    vs_ref.at[b, kvh, :, pl.ds(c * chunk, chunk)],
                    vs_buf.at[slot], sem_vs.at[slot]),
            )

        def start_dma(slot, c):
            for cp in dmas(slot, c):
                cp.start()

        def wait_dma(slot, c):
            for cp in dmas(slot, c):
                cp.wait()

        start_dma(c_lo % 2, c_lo)

        def loop(c, carry):
            acc, m, l = carry
            attended = (c >= c_lo) & (c * chunk <= pos)

            @pl.when(attended & ((c + 1) * chunk <= pos))
            def _():
                start_dma((c + 1) % 2, c + 1)

            def attend(carry):
                acc, m, l = carry
                wait_dma(c % 2, c)
                k = k_buf[c % 2].astype(jnp.float32)
                v = v_buf[c % 2].astype(jnp.float32)
                scores = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                scores = scores * ks_buf[c % 2]               # dequant K [1,S]
                cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) \
                    + c * chunk
                scores = jnp.where((cols >= lo) & (cols <= pos), scores,
                                   -jnp.inf)
                m_new = jnp.maximum(m, scores.max(-1, keepdims=True))
                p = jnp.exp(scores - m_new)
                alpha = jnp.exp(m - m_new)
                l_new = l * alpha + p.sum(-1, keepdims=True)
                acc_new = acc * alpha + jax.lax.dot_general(
                    p * vs_buf[c % 2], v,                     # dequant V
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc_new, m_new, l_new

            return jax.lax.cond(attended, attend, lambda cry: cry,
                                (acc, m, l))

        init = (jnp.zeros((rep, d), jnp.float32),
                jnp.full((rep, 1), -jnp.inf, jnp.float32),
                jnp.zeros((rep, 1), jnp.float32))
        acc, m, l = jax.lax.fori_loop(0, n_chunks, loop, init)
        out_ref[0, 0] = (acc / l).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((2, chunk, d), k_ref.dtype),
        v_buf=pltpu.VMEM((2, chunk, d), v_ref.dtype),
        ks_buf=pltpu.VMEM((2, 1, chunk), ks_ref.dtype),
        vs_buf=pltpu.VMEM((2, 1, chunk), vs_ref.dtype),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
        sem_ks=pltpu.SemaphoreType.DMA((2,)),
        sem_vs=pltpu.SemaphoreType.DMA((2,)),
    )


# ---------------------------------------------------------------------------
# int8 KV-cache variant
# ---------------------------------------------------------------------------

def decode_attention_q8(q, k_q8, k_s, v_q8, v_s, pos, *, chunk: int = CHUNK,
                        interpret: bool = False):
    """Decode attention over an int8-quantized KV cache (per-token,
    per-kv-head scales) — HALF the HBM bytes per live token vs bf16.

    q [H,D] f32/bf16; k_q8/v_q8 [KvH,S,D] int8; k_s/v_s [KvH,S] f32;
    pos scalar. Dequant happens on the score/probability vectors after the
    matmuls (scores *= k_s, probs *= v_s), so the int8 chunks feed the MXU
    directly after a cast and the per-element multiply is [rep,chunk], not
    [chunk,D]."""
    h, d = q.shape
    kvh, s, _ = k_q8.shape
    assert s % chunk == 0, f"padded context {s} must be a multiple of {chunk}"
    rep = h // kvh
    scale = 1.0 / (d ** 0.5)
    pos = jnp.asarray([pos], jnp.int32)
    q3 = q.reshape(kvh, rep, d)
    # scales ride as [KvH, 1, S]: Mosaic tiles the LAST TWO dims, so a 2D
    # [KvH, S] array scalar-indexed on dim 0 trips the tiling alignment
    # check ("slice along dim 0 must be aligned to tiling"); with a leading
    # singleton the DMA slice is (1, chunk) over untiled-dim-0
    k_s = k_s.reshape(kvh, 1, s)
    v_s = v_s.reshape(kvh, 1, s)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kvh,),
        in_specs=[
            pl.BlockSpec((1, rep, d), lambda i, pos_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, rep, d), lambda i, pos_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_chunked_kernel_q8, chunk=chunk, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kvh, rep, d), q.dtype),
        interpret=interpret,
    )(pos, q3, k_q8, k_s, v_q8, v_s)
    return out.reshape(h, d)


def _chunked_kernel_q8(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref,
                       *, chunk, scale):
    kvh = pl.program_id(0)
    rep, d = q_ref.shape[1], q_ref.shape[2]
    s = k_ref.shape[1]
    n_chunks = s // chunk
    pos = pos_ref[0]

    def body(k_buf, v_buf, ks_buf, vs_buf, sem_k, sem_v, sem_ks, sem_vs):
        q = q_ref[0].astype(jnp.float32) * scale

        def dmas(slot, c):
            return (
                pltpu.make_async_copy(
                    k_ref.at[kvh, pl.ds(c * chunk, chunk), :],
                    k_buf.at[slot], sem_k.at[slot]),
                pltpu.make_async_copy(
                    v_ref.at[kvh, pl.ds(c * chunk, chunk), :],
                    v_buf.at[slot], sem_v.at[slot]),
                pltpu.make_async_copy(
                    ks_ref.at[kvh, :, pl.ds(c * chunk, chunk)],
                    ks_buf.at[slot], sem_ks.at[slot]),
                pltpu.make_async_copy(
                    vs_ref.at[kvh, :, pl.ds(c * chunk, chunk)],
                    vs_buf.at[slot], sem_vs.at[slot]),
            )

        def start_dma(slot, c):
            for cp in dmas(slot, c):
                cp.start()

        def wait_dma(slot, c):
            for cp in dmas(slot, c):
                cp.wait()

        start_dma(0, 0)

        def loop(c, carry):
            acc, m, l = carry

            @pl.when((c + 1) * chunk <= pos)
            def _():
                start_dma((c + 1) % 2, c + 1)

            def attend(carry):
                acc, m, l = carry
                wait_dma(c % 2, c)
                k = k_buf[c % 2].astype(jnp.float32)
                v = v_buf[c % 2].astype(jnp.float32)
                scores = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                scores = scores * ks_buf[c % 2]               # dequant K [1,S]
                cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) \
                    + c * chunk
                scores = jnp.where(cols <= pos, scores, -jnp.inf)
                m_new = jnp.maximum(m, scores.max(-1, keepdims=True))
                p = jnp.exp(scores - m_new)
                alpha = jnp.exp(m - m_new)
                l_new = l * alpha + p.sum(-1, keepdims=True)
                acc_new = acc * alpha + jax.lax.dot_general(
                    p * vs_buf[c % 2], v,                     # dequant V
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc_new, m_new, l_new

            return jax.lax.cond(c * chunk <= pos, attend, lambda cry: cry,
                                (acc, m, l))

        init = (jnp.zeros((rep, d), jnp.float32),
                jnp.full((rep, 1), -jnp.inf, jnp.float32),
                jnp.zeros((rep, 1), jnp.float32))
        acc, m, l = jax.lax.fori_loop(0, n_chunks, loop, init)
        out_ref[0] = (acc / l).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        k_buf=pltpu.VMEM((2, chunk, d), k_ref.dtype),
        v_buf=pltpu.VMEM((2, chunk, d), v_ref.dtype),
        ks_buf=pltpu.VMEM((2, 1, chunk), ks_ref.dtype),
        vs_buf=pltpu.VMEM((2, 1, chunk), vs_ref.dtype),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
        sem_ks=pltpu.SemaphoreType.DMA((2,)),
        sem_vs=pltpu.SemaphoreType.DMA((2,)),
    )
