"""Persistent XLA compilation cache setup (shared by the CLIs).

The full-pipeline / train-step programs are large (multi-minute XLA-CPU
compiles, ~30 s TPU compiles); a persistent cache makes repeat invocations
start in seconds.  Each logical program family gets its own directory so
concurrent writers don't corrupt each other's entries (observed as
JaxRuntimeError deserialization failures with pytest-xdist)."""

from __future__ import annotations

import os

import jax


def enable_compile_cache(name: str = "tools") -> None:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(f"~/.cache/jax_stereo_{name}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
