"""Pallas fused-MLP vs XLA at canonical + saturated planner shapes.

Times a chained scan of N forwards (data dependence serializes the device),
at two scan lengths; the differenced time per forward cancels host dispatch
latency (the axon tunnel adds ~20 ms RTT per call on this host).
"""
import time
import jax, jax.numpy as jnp
from learning_to_adapt_tpu.ops import fused_mlp
from learning_to_adapt_tpu.models import core

key = jax.random.PRNGKey(0)
R1, R2 = 8, 208

for rows, hidden, in_dim, out_dim, tag in [
    (2500, (512, 512, 512), 26, 20, 'canonical-grbal'),
    (32768, (512, 512), 26, 20, 'bench-saturated'),
]:
    sizes = (in_dim,) + hidden + (out_dim,)
    ws = [jax.random.normal(jax.random.fold_in(key, i),
                            (sizes[i], sizes[i + 1]), jnp.float32) * 0.05
          for i in range(len(sizes) - 1)]
    bs = [jnp.zeros((sizes[i + 1],), jnp.float32)
          for i in range(len(sizes) - 1)]
    params = {'w': ws, 'b': bs}
    x0 = jax.random.normal(jax.random.fold_in(key, 99), (rows, in_dim),
                           jnp.float32)

    def chained(fwd, reps):
        def body(x, _):
            y = fwd(params, x)
            x = x.at[:, :1].add(jnp.mean(y) * 1e-6)
            return x, None
        return jax.jit(lambda x: jax.lax.scan(body, x, None, length=reps)[0])

    paths = {'xla': lambda p, x: core.mlp_forward(
        p, x, 'relu', None, jnp.bfloat16)}
    if fused_mlp.supported(params):
        paths['pallas'] = lambda p, x: fused_mlp.fused_mlp_forward(
            p, x, 'relu')
    flops = 2 * rows * sum(sizes[i] * sizes[i + 1]
                           for i in range(len(sizes) - 1))
    for name, fwd in paths.items():
        ts = {}
        for reps in (R1, R2):
            fn = chained(fwd, reps)
            jax.block_until_ready(fn(x0))
            best = min(
                (lambda t0=time.perf_counter():
                 (jax.block_until_ready(fn(x0)),
                  time.perf_counter() - t0)[1])()
                for _ in range(4))
            ts[reps] = best
        t = (ts[R2] - ts[R1]) / (R2 - R1)
        print(f"{tag} {name}: {t*1e6:.1f} us/forward  "
              f"{flops/t/1e12:.1f} TFLOP/s")
