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


def _cpu_fingerprint() -> str:
    """Hash of everything that determines XLA:CPU codegen for this host.

    Keying on cpuinfo *flags* alone is not enough: XLA picks LLVM target
    features like ``+prefer-no-gather``/``+prefer-no-scatter`` from the
    CPU *model* (e.g. on AVX-512 parts with slow gather), so two hosts
    with identical flag sets can still produce mutually unloadable AOT
    artifacts (observed via cpu_aot_loader errors on round hosts). Key
    on model name + flags + jax version; a false split only costs a
    recompile, a false merge crashes the thunk executor.
    """
    import hashlib

    parts = []
    try:
        import jax as _jax

        parts.append(_jax.__version__)
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    parts.append(line.strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        pass
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def setup_compile_cache(jax=None):
    if jax is None:
        import jax
    backend = jax.default_backend()
    key = backend
    if backend == "cpu":
        key += "_" + _cpu_fingerprint()
    prefix = os.environ.get("PPST_JAX_CACHE_PREFIX", "/root/.cache/jax_ppst")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("PPST_JAX_CACHE", f"{prefix}_{key}"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
