"""Pack the current host's dryrun compile cache into an in-repo seed
tarball (tools/dryrun_cache_seed/<key>.tar.gz).

``__graft_entry__.dryrun_multichip`` seeds its XLA persistent cache from
this tarball when the cache directory is cold, so a session-restart cache
wipe costs a ~1 s extraction instead of a ~300-470 s XLA:CPU compile of
the two sharded train-step executables (driver-budget risk flagged in
VERDICT r3 ask #8). The key includes the CPU-model/jax-version
fingerprint (ppst_tpu.util.cache): on a different host the tarball simply
does not match and the dryrun compiles fresh as before.

Usage: run dryrun_multichip(8) once (hot cache), then
       python tools/pack_dryrun_cache.py
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cache_key() -> str:
    from ppst_tpu.util.cache import _cpu_fingerprint

    return "cpu_" + _cpu_fingerprint()


def seed_path(key: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(root, "tools", "dryrun_cache_seed", f"{key}.tar.gz")


def main():
    key = cache_key()
    prefix = os.environ.get("PPST_JAX_CACHE_PREFIX", "/root/.cache/jax_ppst")
    cache_dir = f"{prefix}_{key}"
    if not os.path.isdir(cache_dir) or not os.listdir(cache_dir):
        raise SystemExit(f"no cache to pack at {cache_dir} — run the dryrun first")
    out = seed_path(key)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    subprocess.run(
        ["tar", "czf", out, "-C", os.path.dirname(cache_dir),
         os.path.basename(cache_dir)],
        check=True,
    )
    print(f"packed {cache_dir} ({sum(os.path.getsize(os.path.join(cache_dir, f)) for f in os.listdir(cache_dir)) >> 20} MiB) -> {out}")


if __name__ == "__main__":
    main()
