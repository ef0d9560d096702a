"""Isolate which host<->device operations BLOCK through the axon tunnel.

The serving engine's steady state is one jitted call + one small upload +
one (lagged) small readback per token step; the decode-batch ladder showed
the call itself pipelines (10.5 ms/step at B=8), yet the engine measured
~33 ms/step. This probe times, over a tiny jitted fn on real hardware:

  a) chained calls, one readback at the end      (dispatch cost)
  b) chained calls + fresh small upload per call (upload cost)
  c) chained calls + lagged readback per call    (blocking-readback cost)
  d) c) with copy_to_host_async issued at call time

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -m clearcam_tpu.tools.tunnel_probe
"""
from __future__ import annotations

import json
import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

N = 50


def main():
    @jax.jit
    def f(x, m):
        return x + m.sum()

    x = jnp.zeros((8,), jnp.int32)
    m0 = jnp.zeros((3, 8), jnp.int32)
    np.asarray(f(x, m0))  # compile

    res = {}

    t0 = time.perf_counter()
    y = x
    for _ in range(N):
        y = f(y, m0)
    np.asarray(y)
    res["a_chained_ms"] = round((time.perf_counter() - t0) / N * 1e3, 2)

    t0 = time.perf_counter()
    y = x
    for i in range(N):
        y = f(y, jnp.asarray(np.full((3, 8), i, np.int32)))
    np.asarray(y)
    res["b_upload_per_call_ms"] = round((time.perf_counter() - t0) / N * 1e3, 2)

    for lag, use_async, name in [(4, False, "c_lagged_readback_ms"),
                                 (4, True, "d_lagged_async_readback_ms")]:
        t0 = time.perf_counter()
        y = x
        pend: deque = deque()
        for _ in range(N):
            y = f(y, m0)
            if use_async:
                try:
                    y.copy_to_host_async()
                except Exception as e:  # backend may not support it
                    res["async_err"] = repr(e)
            pend.append(y)
            if len(pend) > lag:
                np.asarray(pend.popleft())
        while pend:
            np.asarray(pend.popleft())
        res[name] = round((time.perf_counter() - t0) / N * 1e3, 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
