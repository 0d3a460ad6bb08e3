"""Persistent XLA compilation cache shared by entry points.

The fused rollout/epoch programs take tens of seconds to compile on TPU;
caching them on disk means the second and later runs (and resumes) start in
seconds. bench.py and tests/conftest.py configure their own cache dirs; run
scripts call this."""
import os

import jax

_CONFIGURED = None  # resolved cache dir, once set


def enable_persistent_cache(subdir='.jax_cache'):
    """Idempotent per cache path: a second call with the SAME subdir is a
    no-op; a different subdir warns and keeps the first (retargeting the
    cache mid-process would orphan already-written entries). Respects a
    cache dir the embedding process (tests/bench) already configured."""
    global _CONFIGURED
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cache = os.path.join(repo, subdir)
    if _CONFIGURED is not None:
        if _CONFIGURED != cache:
            import warnings
            warnings.warn(
                f'enable_persistent_cache({subdir!r}) ignored: cache already '
                f'configured at {_CONFIGURED}', stacklevel=2)
        return
    existing = jax.config.jax_compilation_cache_dir
    if existing:
        _CONFIGURED = existing  # embedding process configured one — keep it
        return
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    _CONFIGURED = cache
