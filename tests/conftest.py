"""Test harness: force the CPU backend with an 8-device virtual mesh so
sharding tests run without TPU hardware (the 'fake backend' the reference
never had, SURVEY.md section 4).

Note: the ambient environment may pre-import jax with a TPU platform plugin
registered (JAX_PLATFORMS=axon); `jax.config.update` is the reliable way to
pin CPU after that, and it also skips the plugin's expensive init handshake.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# persistent compilation cache: repeat suite runs skip recompiling the fused
# rollout/epoch programs
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache_cpu')
os.makedirs(_cache, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _cache)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
