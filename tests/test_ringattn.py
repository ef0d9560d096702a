"""Ring attention (sequence-parallel prefill) parity vs single-device
attention on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from clearcam_tpu.parallel.ringattn import ring_prefill


def reference_attention(q, k, v, causal=True):
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / (d ** 0.5)
    if causal:
        t = q.shape[1]
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


def make_mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("data",))


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full_attention(causal):
    rng = np.random.default_rng(0)
    b, t, h, d = 2, 64, 4, 16          # 8 tokens per shard
    q = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    mesh = make_mesh()
    with mesh:
        out = np.asarray(ring_prefill(mesh, "data", causal=causal)(q, k, v))
    ref = np.asarray(reference_attention(q, k, v, causal=causal))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_ring_long_context_scales():
    """A sequence far beyond one shard's worth works (the point: per-chip
    attention memory is O(T/n))."""
    rng = np.random.default_rng(1)
    b, t, h, d = 1, 1024, 2, 32
    q = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    mesh = make_mesh()
    with mesh:
        out = np.asarray(ring_prefill(mesh, "data")(q, k, v))
    ref = np.asarray(reference_attention(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_ring_gqa_heads():
    """Grouped-query layout (fewer KV heads) matches repeated-head full
    attention — drop-in for the LLM's GQA blocks."""
    rng = np.random.default_rng(3)
    b, t, h, kvh, d = 1, 64, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, kvh, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, kvh, d)).astype(np.float32))
    mesh = make_mesh()
    with mesh:
        out = np.asarray(ring_prefill(mesh, "data")(q, k, v))
    ref = np.asarray(reference_attention(
        q, jnp.repeat(k, h // kvh, 2), jnp.repeat(v, h // kvh, 2)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_first_token_and_shard_boundaries():
    """Token 0 attends only to itself; tokens at shard boundaries see exactly
    their causal prefix (off-by-one around the ring would break these)."""
    rng = np.random.default_rng(2)
    b, t, h, d = 1, 32, 1, 8           # 4 tokens per shard
    q = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    mesh = make_mesh()
    with mesh:
        out = np.asarray(ring_prefill(mesh, "data")(q, k, v))
    ref = np.asarray(reference_attention(q, k, v))
    for pos in (0, 3, 4, 7, 8, 31):    # shard edges for Tl=4
        np.testing.assert_allclose(out[0, pos], ref[0, pos],
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"pos {pos}")
