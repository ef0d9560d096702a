"""Opt-in real-TPU co-tenancy regression (BASELINE.md's flagship config:
"full 16-stream NVR + Qwen3-VL summaries" on ONE v5e).

    CLEARCAM_COTENANCY_TPU_TEST=1 PYTHONPATH=/root/repo:/root/.axon_site \
        python -m pytest tests/test_cotenancy_tpu.py -q

Asserts the NVR's chunk-granularity interleaving policy holds at the
product bar: with CLIP crop embeds + BlazeFace + a continuously-busy
2B-class Qwen3-VL summary engine sharing the chip, the 16 streams stay
real-time and summaries actually flow. The reference blocks its detect
loop for the whole generation instead (/root/reference/clearcam.py:494-496).
Measured ladder + policy discussion: PERF.md "Chip co-tenancy".
"""
import json
import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("CLEARCAM_COTENANCY_TPU_TEST"),
    reason="real-TPU co-tenancy ladder: CLEARCAM_COTENANCY_TPU_TEST=1 "
           "with the axon tunnel on PYTHONPATH (graphs persistent-cached "
           "by a prior tools/cotenancy_bench run)")


def test_detect_holds_rate_under_full_cotenancy(capsys):
    import jax
    assert jax.default_backend() == "tpu"
    from clearcam_tpu.tools import cotenancy_bench

    cotenancy_bench.main(["--streams", "16", "--ticks", "80"])
    out = capsys.readouterr().out
    final = json.loads([l for l in out.splitlines()
                        if l.startswith("{\"metric\"")][-1])
    a, b = final["detect_only"], final["full"]
    # NOTE on absolutes: every tick syncs detections to the host, and
    # through the axon relay that round trip alone is ~30-45 ms (measured
    # 2026-08-18: detect-only p50 47 ms for ~3 ms of device work), so
    # streams_at_30fps here is tunnel-bound — the DELTAS below are the
    # environment-robust regression surface (PERF.md "Chip co-tenancy").
    # summaries must actually flow while detection keeps ticking
    assert b["summary_tok_s"] > 10, b
    # chunk-granularity preemption: added p50 bounded by a few engine
    # steps (measured +31 ms bf16 / less at int8), not a whole generation
    bound = float(os.environ.get("CLEARCAM_COTENANCY_P50_BOUND_MS", "60"))
    assert b["p50_ms"] - a["p50_ms"] < bound, final
    # no tick ever waits for a full generation (the reference's blocking
    # loop would park detection for seconds per summary)
    assert b["p99_ms"] < 1500, final
