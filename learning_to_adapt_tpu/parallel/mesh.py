"""Device-mesh scale-out.

The reference parallelizes env sampling with worker processes and pickled
pipes (vectorized_env_executor.py:72-213) and has no gradient/parameter
distribution at all (SURVEY.md section 2.2). Here scale-out is the JAX
sharding model:

  axis 'env'   — environment instances / rollouts / planner batch rows
  axis 'model' — dynamics-ensemble members (the EP-like axis)

Envs live on device as a batched state pytree; sharding the leading env axis
with NamedSharding makes XLA partition the fused rollout program across
chips with zero code change. Gradient and normalizer reductions ride ICI via
psum inside shard_map-ped train steps.

Multi-host: call jax.distributed.initialize() before building the mesh; the
same code then spans hosts (DCN for cross-slice collectives).
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_env: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Mesh over the available devices with ('env', 'model') axes."""
    devices = list(devices if devices is not None else jax.devices())
    if n_env is None:
        n_env = len(devices) // n_model
    devs = np.asarray(devices[:n_env * n_model]).reshape(n_env, n_model)
    return Mesh(devs, ('env', 'model'))


def stage(mesh: Mesh, tree, spec=P()):
    """device_put a pytree onto the mesh with the given PartitionSpec.

    Works across processes: jax.device_put with a sharding that spans
    non-addressable devices materializes only the local shards from the
    (assumed identical) host-local value on each process — this is how
    host-side numpy (fit datasets, params, PRNG keys) enters a
    multi-controller program."""
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def gather(tree):
    """Bring a (possibly cross-process sharded) pytree fully to host numpy.
    Single-process: plain device_get. Multi-controller: process_allgather
    so every host sees the complete value (the reference's pipe gather,
    vectorized_env_executor.py:116-146, without the pickling)."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree, tiled=True)


def stage_model_state(model):
    """EXPLICITLY replace `model.params` / `model.opt_state` /
    `model.normalizer` with replicated-on-the-mesh copies (no-op without a
    mesh). Explicit shardings on the learner state are what let the same
    fit loop run multi-controller (committed single-device arrays cannot be
    resharded across processes by jit), and the replicated params are
    exactly what the sharded epoch function's in_shardings expect. Model
    fit loops call this alongside stage_fit_data — the mutation lives in a
    function named for it, not hidden in a data stager."""
    mesh = getattr(model, 'mesh', None)
    if mesh is None:
        return
    model.params, model.opt_state, model.normalizer = stage(
        mesh, (model.params, model.opt_state, model.normalizer))


def stage_fit_data(model, train, test):
    """Stage fit datasets on device: with `model.mesh` set, data rows/paths
    shard over the 'env' axis; otherwise a plain device_put. Pure — learner
    state is staged separately by stage_model_state."""
    mesh = getattr(model, 'mesh', None)
    if mesh is None:
        return jax.device_put(train), jax.device_put(test)
    n_env = mesh.shape['env']
    for leaf in jax.tree.leaves((train, test)):
        assert leaf.shape[0] % n_env == 0, (
            f'fit-data leading axis {leaf.shape[0]} does not divide over the '
            f"mesh 'env' axis ({n_env}); pad capacities (PATH_CHUNK / "
            f'PAD_CHUNK) assume the env axis is a power of two <= chunk')
    return stage(mesh, train, P('env')), stage(mesh, test, P('env'))


def shard_batch(mesh: Mesh, tree, axis_name='env'):
    """Put a pytree on device with its leading axis sharded over
    `axis_name` (replicated over the other mesh axes)."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_rollout_fn(rollout_fn, mesh: Mesh, num_rollouts: int):
    """Wraps a fused rollout program so the env axis (num_rollouts) shards
    over the mesh 'env' axis: per-env reset keys go in sharded, path arrays
    come out sharded; params/normalizer stay replicated."""
    env_sharded = NamedSharding(mesh, P('env'))

    @functools.partial(jax.jit,
                       out_shardings=env_sharded)
    def fn(params, norm, key, episode_idx):
        return rollout_fn(params, norm, key, episode_idx)

    return fn


def data_parallel_grad_step(mesh: Mesh, loss_fn, optimizer):
    """Builds a shard_map-ped DP training step: each device computes the
    gradient of `loss_fn(params, *local_batch)` on its shard of the batch,
    gradients are pmean'd over the 'env' axis (ICI collective), and the
    optimizer update is applied identically everywhere."""
    from jax import shard_map

    def step(params, opt_state, *batch):
        def local(params, opt_state, *local_batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, *local_batch)
            grads = jax.lax.pmean(grads, 'env')
            loss = jax.lax.pmean(loss, 'env')
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        sharded = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P()) + tuple(P('env') for _ in batch),
            out_specs=(P(), P(), P()),
            check_vma=False)
        return sharded(params, opt_state, *batch)

    return jax.jit(step)


def psum_normalizer_stats(obs, act, delta, axis_name='env'):
    """Cross-device normalization statistics: local sums psum'd so every
    shard sees global mean/std (use inside shard_map/pjit bodies)."""
    def global_stats(x):
        n = jax.lax.psum(jnp.asarray(x.shape[0], x.dtype), axis_name)
        s = jax.lax.psum(jnp.sum(x, axis=0), axis_name)
        ss = jax.lax.psum(jnp.sum(jnp.square(x), axis=0), axis_name)
        mean = s / n
        var = jnp.maximum(ss / n - jnp.square(mean), 0.0)
        return mean, jnp.sqrt(var)
    return tuple(global_stats(x) for x in (obs, act, delta))


def jit_epoch_sharded(mesh: Mesh, epoch_fn, n_args: int, data_argnums):
    """jit an epoch function with the pytree arguments at `data_argnums`
    sharded on their leading axis over the mesh 'env' axis and everything
    else (params, opt state, normalizer, PRNG key) replicated. GSPMD then
    partitions the whole epoch — per-shard grads, automatic psum for the
    loss/grad reductions — with numerics matching the single-device
    program (same batch composition; only reduction order differs).

    This is the path the real model fit loops use when `model.mesh` is set
    (models/{mlp,meta_mlp,rnn}.py::_get_epoch_fn) — the learner itself
    trains data-parallel, not just the rollout (BASELINE config #5)."""
    data = NamedSharding(mesh, P('env'))
    repl = NamedSharding(mesh, P())
    in_sh = tuple(data if i in set(data_argnums) else repl
                  for i in range(n_args))
    return jax.jit(epoch_fn, in_shardings=in_sh, out_shardings=repl)
