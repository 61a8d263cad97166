"""Persistent XLA compile cache setup shared by every entry point.

The 512px step graphs take minutes to compile through the remote-compile
relay; caching the executables makes second runs start in seconds. The
cache directory is keyed by backend plus (on CPU) a host-ISA
fingerprint — XLA:CPU AOT artifacts baked for another machine's vector
extensions crash the thunk executor when loaded (observed with
avx512/prefer-no-scatter mismatches on round hosts).
"""

from __future__ import annotations

import os


def setup_compile_cache(jax=None):
    if jax is None:
        import jax
    backend = jax.default_backend()
    key = backend
    if backend == "cpu":
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        key += "_" + hashlib.md5(line.encode()).hexdigest()[:8]
                        break
        except OSError:
            pass
    prefix = os.environ.get("PPST_JAX_CACHE_PREFIX", "/root/.cache/jax_ppst")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PPST_JAX_CACHE", f"{prefix}_{key}"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
