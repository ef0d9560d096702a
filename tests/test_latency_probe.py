"""tools/latency_probe.py: the no-device HTTP-overhead stage runs in CI
(the device stages need the real chip — PERF.md records those). Guards the
probe against rot, not against a perf target: shared-CI wall clocks are
noise, so only sanity bounds are asserted."""
from clearcam_tpu.tools.latency_probe import probe_http


def test_http_overhead_probe():
    r = probe_http(reps=20)
    assert r["stage"] == "http_overhead"
    assert r["n"] == 20
    assert r["body_mb"] > 1.0                  # full 640x640x3 frame rode
    assert 0 < r["p50_ms"] <= r["p90_ms"] < 30_000
