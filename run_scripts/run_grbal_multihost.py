"""Multi-chip / multi-host GrBAL (BASELINE.json config #5).

Same algorithm as run_grbal.py, with the env/rollout axis sharded over a
device mesh: the fused sampling program partitions across all chips
(collectives ride ICI within a slice, DCN across hosts). On a multi-host pod
slice, launch one process per host with the usual JAX distributed env
(COORDINATOR_ADDRESS etc.) — `jax.distributed.initialize()` is called when a
coordinator is configured; single-host multi-chip works with no extra setup.

For a hardware-free check this also runs on the virtual CPU mesh:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python run_scripts/run_grbal_multihost.py --n_itr 2 \
        --max_path_length 50
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402

from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize  # noqa: E402
from learning_to_adapt_tpu.models import MetaMLPDynamicsModel  # noqa: E402
from learning_to_adapt_tpu.parallel.mesh import make_mesh  # noqa: E402
from learning_to_adapt_tpu.policies import MPCController  # noqa: E402
from learning_to_adapt_tpu.samplers import (  # noqa: E402
    ModelSampleProcessor, Sampler)
from learning_to_adapt_tpu.trainers import Trainer  # noqa: E402
from learning_to_adapt_tpu.utils import logging as logger  # noqa: E402
from learning_to_adapt_tpu.utils.config import ClassEncoder  # noqa: E402
from learning_to_adapt_tpu.utils.jax_cache import (  # noqa: E402
    enable_persistent_cache)
from run_grbal import config as base_config  # noqa: E402

EXP_NAME = 'grbal_multihost'


def run_experiment(config):
    enable_persistent_cache()
    if os.environ.get('COORDINATOR_ADDRESS'):
        jax.distributed.initialize()

    n_dev = len(jax.devices())
    mesh = make_mesh(n_env=n_dev, n_model=1)
    # scale rollouts to fill the mesh: at least the canonical count, rounded
    # up to a multiple of the env-axis size
    per = max(config['num_rollouts'], 1)
    config['num_rollouts'] = ((per + n_dev - 1) // n_dev) * n_dev

    exp_dir = os.path.join(os.getcwd(), 'data', EXP_NAME,
                           config.get('exp_name', ''))
    logger.configure(dir=exp_dir, format_strs=['stdout', 'log', 'csv'],
                     snapshot_mode='last')
    json.dump(config, open(os.path.join(exp_dir, 'params.json'), 'w'),
              indent=2, sort_keys=True, cls=ClassEncoder)

    env = normalize(config['env'](reset_every_episode=True,
                                  task=config['task']))
    dynamics_model = MetaMLPDynamicsModel(
        name='dyn_model', env=env,
        meta_batch_size=config['meta_batch_size'],
        inner_learning_rate=config['inner_learning_rate'],
        learning_rate=config['learning_rate'],
        hidden_sizes=config['hidden_sizes_model'],
        valid_split_ratio=config['valid_split_ratio'],
        rolling_average_persitency=config['rolling_average_persitency'],
        hidden_nonlinearity=config['hidden_nonlinearity_model'],
        batch_size=config['adapt_batch_size'])
    # train the meta-learner itself sharded: path-major batches over the
    # mesh 'env' axis, grads psum'd by GSPMD (models/meta_mlp.py +
    # parallel/mesh.py::jit_epoch_sharded)
    dynamics_model.mesh = mesh
    policy = MPCController(
        name='policy', env=env, dynamics_model=dynamics_model,
        discount=config['discount'], n_candidates=config['n_candidates'],
        horizon=config['horizon'], use_cem=config['use_cem'],
        num_cem_iters=config['num_cem_iters'])
    sampler = Sampler(
        env=env, policy=policy, num_rollouts=config['num_rollouts'],
        max_path_length=config['max_path_length'],
        adapt_batch_size=config['adapt_batch_size'], mesh=mesh)
    algo = Trainer(
        env=env, policy=policy, dynamics_model=dynamics_model,
        sampler=sampler,
        sample_processor=ModelSampleProcessor(recurrent=True),
        n_itr=config['n_itr'],
        initial_random_samples=config['initial_random_samples'],
        dynamics_model_max_epochs=config['dynamic_model_epochs'],
        config=config)
    with mesh:
        algo.train()


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--n_itr', type=int, default=None)
    p.add_argument('--max_path_length', type=int, default=None)
    p.add_argument('--exp_name', type=str, default='')
    args = p.parse_args()
    config = dict(base_config)
    if args.n_itr:
        config['n_itr'] = args.n_itr
    if args.max_path_length:
        config['max_path_length'] = args.max_path_length
    config['exp_name'] = args.exp_name
    run_experiment(config)
