"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (the bench/driver use the real chip separately)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the outer env sets axon (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup, so the env var
# above is captured too late — force the platform through the config API
# (backend init is still lazy at this point).
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: model-graph compiles dominate test time otherwise
# (CLEARCAM_JAX_CACHE_DIR override lets CI measure a true cold run). The path
# is keyed by a host-CPU fingerprint — foreign AOT entries can SIGILL
# (utils/jaxcache.py).
from clearcam_tpu.utils import jaxcache  # noqa: E402

jaxcache.configure(jax)

import re  # noqa: E402
from pathlib import Path  # noqa: E402

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two test tiers: compile-heavy tests listed in slow_tests.txt get the
    `slow` marker so `pytest -m "not slow"` is a <10-min cold fast tier
    (full suite ~62 min cold; see the manifest header to regenerate)."""
    manifest = Path(__file__).parent / "slow_tests.txt"
    entries = {ln.strip() for ln in manifest.read_text().splitlines()
               if ln.strip() and not ln.startswith("#")}
    for item in items:
        base = re.sub(r"\[.*\]$", "", item.nodeid)
        if base in entries or base.split("::")[0] in entries:
            item.add_marker(pytest.mark.slow)
