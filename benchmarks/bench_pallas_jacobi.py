"""Decision benchmark: XLA fori_loop vs the Pallas VMEM kernel for the
projected-Jacobi contact solve (ops/pallas_jacobi.py), measured where it
matters — inside the latency-bound canonical physics chain.

Methodology (same honesty rules as the round-2 fused-MLP verdict,
docs/DESIGN.md section 1): device-serialized differenced timing. The unit
under test is a jitted lax.scan of K dependent half-cheetah physics steps
for 5 envs (the canonical GrBAL env count); we time K and 2K chains and
difference them, so per-dispatch overhead and data transfer cancel and
only the serial step chain remains. Run on TPU; prints per-step times and
the speedup, and exits nonzero if numerics diverge.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')

from learning_to_adapt_tpu.envs import model_defs
from learning_to_adapt_tpu.ops import pallas_jacobi
from learning_to_adapt_tpu.physics import engine
from learning_to_adapt_tpu.physics.engine import PhysicsState
from learning_to_adapt_tpu.physics.spec import compile_spec, default_mutable

N_ENVS = 5
K = 50


def build_chain(model, mm, n_steps):
    ctrl = jnp.zeros((N_ENVS, model.nu), jnp.float32)

    @jax.jit
    def chain(qpos, qvel):
        def body(carry, _):
            s = PhysicsState(*carry)
            s2 = jax.vmap(lambda st: engine.step(model, mm, st, ctrl[0]))(s)
            return (s2.qpos, s2.qvel), None
        (qp, qv), _ = jax.lax.scan(body, (qpos, qvel), None, length=n_steps)
        return qp, qv
    return chain


def timed(fn, *args, n=15):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return out, min(ts)


def main():
    model = compile_spec(model_defs.half_cheetah_spec())
    mm = jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)),
                      default_mutable(model))
    rng = np.random.RandomState(0)
    qpos = jnp.asarray(model.qpos0[None, :].repeat(N_ENVS, 0)
                       + rng.uniform(-0.01, 0.01, (N_ENVS, model.nq)),
                       jnp.float32)
    qvel = jnp.asarray(rng.uniform(-0.1, 0.1, (N_ENVS, model.nv)),
                       jnp.float32)

    results = {}
    for enabled in (False, True):
        pallas_jacobi.ENABLED = enabled
        c1 = build_chain(model, mm, K)
        c2 = build_chain(model, mm, 2 * K)
        out1, t1 = timed(c1, qpos, qvel)
        out2, t2 = timed(c2, qpos, qvel)
        per_step = (t2 - t1) / K
        results[enabled] = (per_step, out1)
        print(f'pallas={enabled}: chain{K}={t1 * 1e3:.2f}ms '
              f'chain{2 * K}={t2 * 1e3:.2f}ms '
              f'-> {per_step * 1e6:.1f} us/step (5 envs)', flush=True)

    err = float(jnp.max(jnp.abs(results[True][1][0] - results[False][1][0])))
    speedup = results[False][0] / results[True][0]
    print(f'speedup={speedup:.3f}x  max|qpos diff| after {K} steps={err:.2e}')
    if err > 1e-3:
        print('NUMERICS DIVERGED', file=sys.stderr)
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
