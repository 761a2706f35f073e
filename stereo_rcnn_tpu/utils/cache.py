"""Persistent XLA compilation cache setup (shared by the CLIs).

The full-pipeline / train-step programs are large (multi-minute XLA-CPU
compiles, ~30 s TPU compiles); a persistent cache makes repeat invocations
start in seconds.  Each logical program family gets its own directory so
concurrent writers don't corrupt each other's entries (observed as
JaxRuntimeError deserialization failures with pytest-xdist).

CPU-platform caches must additionally be keyed on a host-CPU-feature
fingerprint: these VMs migrate between hosts with different
microarchitectures, and XLA:CPU refuses (with "could lead to execution
errors such as SIGILL" errors, then a full recompile) to load another
machine's AOT result — observed as the round-2 multichip dryrun timeout.
TPU executables are compiled FOR the TPU and don't depend on host CPU
features, so TPU-only cache dirs may skip the fingerprint to survive host
migration warm.
"""

from __future__ import annotations

import hashlib
import os

import jax


def host_cpu_fingerprint() -> str:
    """Short hash of the host CPU feature flags (µarch identity)."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    return hashlib.sha1(flags.encode()).hexdigest()[:8]


def compile_cache_dir(name: str, fingerprint: bool = False) -> str:
    suffix = f"_{host_cpu_fingerprint()}" if fingerprint else ""
    return os.path.expanduser(f"~/.cache/jax_stereo_{name}{suffix}")


def enable_compile_cache(name: str = "tools",
                         fingerprint: bool = False) -> None:
    """Point JAX's persistent compilation cache at a per-family directory.

    Set ``fingerprint=True`` for any cache that will hold XLA:CPU
    executables (tests, multichip dryruns); leave it off for TPU-only
    benchmark caches.
    """
    jax.config.update("jax_compilation_cache_dir",
                      compile_cache_dir(name, fingerprint))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
