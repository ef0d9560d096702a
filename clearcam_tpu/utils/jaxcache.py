"""Host-keyed JAX persistent-compile-cache path.

The persistent cache stores serialized (AOT-compiled) CPU executables keyed
by graph — but NOT by the compiling machine's CPU features. When /tmp (or a
shared CLEARCAM_JAX_CACHE_DIR) survives a move to different hardware, XLA
loads foreign AOT results and warns they "could lead to execution errors
such as SIGILL". Key the directory by a fingerprint of the host's CPU flags
so each machine populates (and hits) only its own entries; the driver's
dryrun/test gates can never crash on another machine's codegen.
"""
from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """8-hex-char digest of the CPU feature flags (ISA-compatibility proxy)."""
    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):  # x86 / arm
                    ident += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(ident.encode()).hexdigest()[:8]


def cache_dir(base: str | None = None) -> str:
    """Cache path for this host: <base>-<cpu fingerprint>.

    base defaults to $CLEARCAM_JAX_CACHE_DIR or /tmp/clearcam_jax_cache.
    An explicit CLEARCAM_JAX_CACHE_DIR is still fingerprint-suffixed — the
    override exists to measure cold runs, which stays true per-host.
    """
    if base is None:
        base = os.environ.get("CLEARCAM_JAX_CACHE_DIR",
                              "/tmp/clearcam_jax_cache")
    return f"{base}-{host_fingerprint()}"


def configure(jax_mod) -> str:
    """Apply the standard persistent-cache knobs; returns the directory."""
    d = cache_dir()
    jax_mod.config.update("jax_compilation_cache_dir", d)
    jax_mod.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax_mod.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax_mod.config.update("jax_persistent_cache_enable_xla_caches", "all")
    return d
