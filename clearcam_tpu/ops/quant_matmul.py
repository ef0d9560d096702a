"""Weight-only int8 quantized matmul (Pallas TPU kernel).

Why a kernel: LLM decode is HBM-bandwidth-bound — every generated token
streams every weight matrix out of HBM once. Storing weights as int8 with
per-output-channel scales halves that traffic vs bf16, but only if the
dequantize happens *in VMEM*: the naive XLA expression
``x @ (q.astype(bf16) * s).T`` materializes the dequantized matrix back to
HBM, erasing the win. This kernel streams int8 tiles into VMEM (Pallas
auto-pipelines grid-mapped inputs), converts in-register on the VPU, and
feeds the MXU with f32 accumulation.

The reference serves GGUF-quantized checkpoints by dequantizing whole
tensors to float at load (utils/gguf.py:55-156); this path keeps them
quantized at rest in HBM — a capability the reference lacks.

Format (``QuantLinear``): symmetric per-output-channel int8,
  q [O, I] int8,  s [1, O] f32,  dequant W[o, i] = q[o, i] * s[0, o].
Padding to tile multiples happens at quantization time; the wrapper slices
the result back to the logical output width.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: w tile = TO*TI int8 = 256 KB in VMEM (double-buffered by the
# pipeline), out tile TR*TO f32 = 128 KB. int8 min tile is (32, 128) — both
# dims comply.
TR = 128   # rows (tokens) per block
TO = 256   # output features per block
TI = 1024  # contraction (input features) per block


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantLinear:
    """int8 weight + per-channel scale, drop-in for a dense (out,in) weight.

    Lives inside params dicts and flows through jit as a pytree; the
    ``out_features`` aux field remembers the logical (unpadded) width.
    """

    q: jax.Array   # [O_pad, I_pad] int8
    s: jax.Array   # [1, O_pad] f32
    out_features: int
    in_features: int

    def tree_flatten(self):
        return (self.q, self.s), (self.out_features, self.in_features)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @property
    def shape(self):  # mimic a dense weight's (out, in) shape
        return (self.out_features, self.in_features)

    def dequantize(self) -> jax.Array:
        """Back to a dense f32 (out, in) weight (for tests / fallbacks)."""
        return (self.q.astype(jnp.float32)
                * self.s.T)[: self.out_features, : self.in_features]


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantExpert:
    """int8 stack of per-expert weights [E, O, I] + per-(expert, out-channel)
    scales [E, O, 1]. MoE decode gathers k selected experts per token — the
    gather reads int8 rows from HBM (half the bf16 traffic) and the dequant
    runs on the small gathered slice, so plain XLA suffices (no kernel)."""

    q: jax.Array   # [E, O, I] int8
    s: jax.Array   # [E, O, 1] f32

    def tree_flatten(self):
        return (self.q, self.s), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return 3

    def __getitem__(self, sel):
        """Gather selected experts and dequantize -> f32 [..., O, I]."""
        return self.q[sel].astype(jnp.float32) * self.s[sel]

    def dequantize(self) -> jax.Array:
        return self.q.astype(jnp.float32) * self.s


def quantize_experts_int8(w) -> QuantExpert:
    """Symmetric per-(expert, out-channel) int8 of an [E, O, I] stack."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=2, keepdims=True)           # [E,O,1]
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return QuantExpert(q, s)


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def quantize_int8(w) -> QuantLinear:
    """Symmetric per-output-channel int8 quantization of an (out, in) weight."""
    w = jnp.asarray(w, jnp.float32)
    o, i = w.shape
    amax = jnp.max(jnp.abs(w), axis=1, keepdims=True)           # [O,1]
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    q = _pad_to(_pad_to(q, TO, 0), TI, 1)
    s = _pad_to(s, TO, 0).reshape(1, -1)
    return QuantLinear(q, s, o, i)


# int4: two values per byte, group-wise scales along the contraction dim
GROUP = 128


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantLinear4:
    """Packed int4 weight + per-(out-channel, GROUP) scales.

    Layout (chosen so the kernel needs NO lane interleave/reshape — Mosaic
    rejects those shape casts): within each TI-wide contraction tile, byte j
    packs element j (low nibble) and element j + TI/2 (high nibble). Scales
    are per (out-channel, GROUP of input features), stored group-major
    [I/GROUP, O] so their VMEM blocks tile as (TI//GROUP, TO). The kernel
    runs one K=GROUP dot per group and scales the partial product on the
    output side — algebraically identical because a group never crosses a
    dot. 4x less weight HBM traffic than bf16 — the serving format for
    Q4-class GGUF checkpoints (reference dequantizes those to fp16 at
    load)."""

    packed: jax.Array  # [O_pad, I_pad // 2] int8
    s: jax.Array       # [I_pad // GROUP, O_pad] f32 (group-major)
    out_features: int
    in_features: int

    def tree_flatten(self):
        return (self.packed, self.s), (self.out_features, self.in_features)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @property
    def shape(self):
        return (self.out_features, self.in_features)

    def dequantize(self) -> jax.Array:
        opad = self.packed.shape[0]
        p32 = self.packed.astype(jnp.int32).reshape(opad, -1, TI // 2)
        lo = (p32 << 28) >> 28                      # sign-extended low nibble
        hi = p32 >> 4
        w = jnp.concatenate([lo, hi], -1).reshape(opad, -1)   # [opad, ipad]
        ipad = w.shape[1]
        w = w.reshape(opad, ipad // GROUP, GROUP) * self.s.T[:, :, None]
        return w.reshape(opad, ipad)[: self.out_features, : self.in_features]


def quantize_int4(w, group: int = GROUP) -> QuantLinear4:
    """Symmetric per-(out-channel, group) int4 of an (out, in) weight."""
    assert group == GROUP, "kernel is compiled for GROUP-sized scale blocks"
    w = jnp.asarray(w, jnp.float32)
    o, i = w.shape
    w = _pad_to(_pad_to(w, TO, 0), TI, 1)
    opad, ipad = w.shape
    g = w.reshape(opad, ipad // group, group)
    amax = jnp.max(jnp.abs(g), axis=2, keepdims=True)
    s = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(g / s), -8, 7).astype(jnp.int32) \
        .reshape(opad, ipad // TI, TI)
    lo, hi = q[..., : TI // 2], q[..., TI // 2:]
    packed = ((hi << 4) | (lo & 0xF)).astype(jnp.int8).reshape(opad, ipad // 2)
    return QuantLinear4(packed, s[..., 0].T, o, i)


def _kernel(x_ref, w_ref, s_ref, out_ref, *, n_i):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    wf = w_ref[:].astype(x_ref.dtype)               # int8 -> x dtype (VPU)
    out_ref[:] += jax.lax.dot_general(
        x_ref[:], wf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == n_i - 1)
    def _():
        out_ref[:] *= s_ref[:]                       # [1,TO] broadcast


def _kernel4(x_ref, w_ref, s_ref, out_ref, *, n_i):
    """int4 variant: per-group K=GROUP dots, scales applied to the partial
    products (no lane interleave/reshape — Mosaic rejects those)."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    half = TI // 2
    hg = half // GROUP                               # groups per nibble half
    p32 = w_ref[:].astype(jnp.int32)                 # [TO, TI//2]
    acc = jnp.zeros_like(out_ref)
    for g in range(TI // GROUP):                     # static unroll (8)
        if g < hg:                                   # low-nibble half
            wg = (p32[:, g * GROUP:(g + 1) * GROUP] << 28) >> 28
            xg = x_ref[:, g * GROUP:(g + 1) * GROUP]
        else:                                        # high-nibble half
            wg = p32[:, (g - hg) * GROUP:(g - hg + 1) * GROUP] >> 4
            xg = x_ref[:, g * GROUP:(g + 1) * GROUP]
        part = jax.lax.dot_general(
            xg, wg.astype(x_ref.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [tr, TO]
        acc += part * s_ref[g:g + 1]                 # [1, TO] broadcast
    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("tr", "interpret"))
def _quant_matmul(x2, q, s, tr, interpret=False):
    """x2 [N_pad, I_pad] @ dequant(q).T -> [N_pad, O_pad] f32.

    tr: row-block size (TR for prefill-size inputs; the padded row count
    itself for the one-pass decode path). Dispatches on q's dtype/shape:
    int8 per-channel (s [1, O_pad]) or packed int4 group-wise
    (s [O_pad, I_pad // GROUP])."""
    n, ipad = x2.shape
    opad = q.shape[0]
    int4 = s.shape[0] != 1             # int8 scales are [1, O_pad]
    grid = (n // tr, opad // TO, ipad // TI)
    if int4:
        kernel = functools.partial(_kernel4, n_i=grid[2])
        w_spec = pl.BlockSpec((TO, TI // 2), lambda r, o, i: (o, i),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((TI // GROUP, TO), lambda r, o, i: (i, o),
                              memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(_kernel, n_i=grid[2])
        w_spec = pl.BlockSpec((TO, TI), lambda r, o, i: (o, i),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, TO), lambda r, o, i: (0, o),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, TI), lambda r, o, i: (r, i),
                         memory_space=pltpu.VMEM),
            w_spec,
            s_spec,
        ],
        out_specs=pl.BlockSpec((tr, TO), lambda r, o, i: (r, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, opad), jnp.float32),
        interpret=interpret,
    )(x2, q, s)


def quant_linear(x, w, b=None, interpret: bool | None = None):
    """F.linear semantics (x @ W.T + b) against a QuantLinear/QuantLinear4.

    Any leading batch dims; result cast back to x.dtype. On non-TPU
    backends the kernel runs in interpreter mode (tests / CPU fallback).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    n_real = x2.shape[0]
    # row tile: full TR for prefill-size inputs, one 16-row (bf16 min
    # sublane) pass for decode
    x2 = _pad_to(_pad_to(x2, TR if n_real > 16 else 16, 0), TI, 1)
    qw = w.packed if isinstance(w, QuantLinear4) else w.q
    out = _quant_matmul(x2, qw, w.s,
                        tr=TR if x2.shape[0] % TR == 0 else x2.shape[0],
                        interpret=interpret)
    y = out[:n_real, : w.out_features].reshape(*lead, w.out_features)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)
