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


@functools.partial(jax.jit, static_argnames=("interpret",))
def _quant_matmul(x2, q, s, interpret=False):
    """x2 [N_pad, I_pad] (bf16/f32) @ q.T [I_pad, O_pad] * s -> [N_pad, O_pad] f32."""
    n, ipad = x2.shape
    opad = q.shape[0]
    grid = (n // TR, opad // TO, ipad // TI)
    out = pl.pallas_call(
        functools.partial(_kernel, n_i=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, TI), lambda r, o, i: (r, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, TI), lambda r, o, i: (o, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TO), lambda r, o, i: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, TO), lambda r, o, i: (r, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, opad), jnp.float32),
        interpret=interpret,
    )(x2, q, s)
    return out


def quant_linear(x, w: QuantLinear, b=None, interpret: bool | None = None):
    """F.linear semantics (x @ W.T + b) against a QuantLinear weight.

    Any leading batch dims; result cast back to x.dtype. On non-TPU
    backends the kernel runs in interpreter mode (tests / CPU fallback).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    i_real = x.shape[-1]
    x2 = x.reshape(-1, i_real)
    n_real = x2.shape[0]
    # row tile: full TR for prefill-size inputs, one 16-row (bf16 min
    # sublane) pass for decode
    x2 = _pad_to(_pad_to(x2, TR if n_real > 16 else 16, 0), TI, 1)
    if x2.shape[0] % TR:
        # small-row path: shrink the row tile to the padded row count
        out = _quant_matmul_small(x2, w.q, w.s, interpret=interpret)
    else:
        out = _quant_matmul(x2, w.q, w.s, interpret=interpret)
    y = out[:n_real, : w.out_features].reshape(*lead, w.out_features)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _quant_matmul_small(x2, q, s, interpret=False):
    """Decode path: row count <= 8 — one row tile, grid over (O, I) only."""
    n, ipad = x2.shape
    opad = q.shape[0]
    grid = (1, opad // TO, ipad // TI)
    out = pl.pallas_call(
        functools.partial(_kernel, n_i=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, TI), lambda r, o, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, TI), lambda r, o, i: (o, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TO), lambda r, o, i: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, TO), lambda r, o, i: (0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, opad), jnp.float32),
        interpret=interpret,
    )(x2, q, s)
    return out
