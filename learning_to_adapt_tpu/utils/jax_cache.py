"""Persistent XLA compilation cache shared by entry points.

The fused rollout/epoch programs take tens of seconds to compile on TPU;
caching them on disk means the second and later runs (and resumes) start in
seconds. bench.py and tests/conftest.py configure their own cache dirs; run
scripts call this."""
import os

import jax

_DONE = False


def enable_persistent_cache(subdir='.jax_cache'):
    global _DONE
    if _DONE:
        return
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cache = os.path.join(repo, subdir)
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    _DONE = True
