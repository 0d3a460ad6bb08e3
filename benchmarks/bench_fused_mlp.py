"""Microbenchmark: plain XLA planner forward vs the fused Pallas kernel.

Runs at the bench.py planner shape ((n_candidates * n_envs) rows through a
(512, 512) dynamics MLP in bf16) and prints per-call times plus a numeric
comparison. TPU only; on CPU the dispatcher falls back and the comparison is
trivially exact.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from learning_to_adapt_tpu.models import core
from learning_to_adapt_tpu.ops import fused_mlp

ROWS = 128 * 256
IN_DIM = 26
OUT_DIM = 20
HIDDEN = (512, 512)


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return out, min(times)


def main():
    key = jax.random.PRNGKey(0)
    params = core.init_mlp(key, IN_DIM, HIDDEN, OUT_DIM)
    x = jax.random.normal(jax.random.PRNGKey(1), (ROWS, IN_DIM), jnp.float32)

    plain = jax.jit(lambda p, x: core.mlp_forward(p, x, 'relu', None,
                                                  jnp.bfloat16))
    fused = jax.jit(lambda p, x: fused_mlp.fused_mlp_forward(p, x, 'relu'))

    y_plain, t_plain = timed(plain, params, x)
    y_fused, t_fused = timed(fused, params, x)

    err = float(jnp.max(jnp.abs(y_plain - y_fused)))
    scale = float(jnp.max(jnp.abs(y_plain)))
    print(f'rows={ROWS} plain={t_plain * 1e3:.3f} ms '
          f'fused={t_fused * 1e3:.3f} ms speedup={t_plain / t_fused:.2f}x')
    print(f'max|diff|={err:.5f} (max|y|={scale:.3f})')
    assert err <= 0.05 * max(scale, 1.0), 'fused kernel numerics off'


if __name__ == '__main__':
    main()
