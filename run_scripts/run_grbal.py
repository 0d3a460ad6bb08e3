"""GrBAL: gradient-based adaptive learner — MAML dynamics model + MPC with
per-step fast adaptation inside the rollout (reference run_scripts/
run_grbal.py; canonical config at its lines 74-107)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from learning_to_adapt_tpu.envs import (  # noqa: E402
    AntEnv, Arm7DofEnv, HalfCheetahBlocksEnv, HalfCheetahEnv,
    HalfCheetahHFieldEnv, normalize)
from learning_to_adapt_tpu.models import MetaMLPDynamicsModel  # noqa: E402
from learning_to_adapt_tpu.policies import MPCController  # noqa: E402
from learning_to_adapt_tpu.samplers import (  # noqa: E402
    ModelSampleProcessor, Sampler)
from learning_to_adapt_tpu.trainers import Trainer  # noqa: E402
from learning_to_adapt_tpu.utils import logging as logger  # noqa: E402
from learning_to_adapt_tpu.utils.config import (  # noqa: E402
    ClassEncoder, add_task_distribution_args,
    apply_task_distribution_args, check_resume_config,
    task_env_kwargs)
from learning_to_adapt_tpu.utils.jax_cache import (  # noqa: E402
    enable_persistent_cache)

EXP_NAME = 'grbal'

ENVS = {c.__name__: c for c in
        (HalfCheetahEnv, HalfCheetahHFieldEnv, HalfCheetahBlocksEnv,
         AntEnv, Arm7DofEnv)}


def run_experiment(config):
    enable_persistent_cache()
    exp_dir = os.path.join(os.getcwd(), 'data', EXP_NAME,
                           config.get('exp_name', ''))
    if config.get('resume'):
        # refuse to resume under a mismatched task distribution
        # (would contaminate the holdout split and clobber the
        # recorded config)
        check_resume_config(exp_dir, config)
    logger.configure(dir=exp_dir, format_strs=['stdout', 'log', 'csv'],
                     snapshot_mode='last')
    json.dump(config, open(os.path.join(exp_dir, 'params.json'), 'w'),
              indent=2, sort_keys=True, cls=ClassEncoder)

    env_kw = task_env_kwargs(config)
    env = normalize(config['env'](reset_every_episode=True,
                                  task=config['task'], **env_kw))

    dynamics_model = MetaMLPDynamicsModel(
        name='dyn_model',
        env=env,
        seed=config.get('seed', 0),
        meta_batch_size=config['meta_batch_size'],
        inner_learning_rate=config['inner_learning_rate'],
        learning_rate=config['learning_rate'],
        hidden_sizes=config['hidden_sizes_model'],
        valid_split_ratio=config['valid_split_ratio'],
        rolling_average_persitency=config['rolling_average_persitency'],
        hidden_nonlinearity=config['hidden_nonlinearity_model'],
        batch_size=config['adapt_batch_size'],
    )

    policy = MPCController(
        name='policy',
        env=env,
        dynamics_model=dynamics_model,
        discount=config['discount'],
        n_candidates=config['n_candidates'],
        horizon=config['horizon'],
        use_cem=config['use_cem'],
        num_cem_iters=config['num_cem_iters'],
    )

    sampler = Sampler(
        env=env,
        policy=policy,
        seed=config.get('seed', 0),
        n_parallel=config['n_parallel'],
        max_path_length=config['max_path_length'],
        num_rollouts=config['num_rollouts'],
        adapt_batch_size=config['adapt_batch_size'],
    )

    start_itr = 0
    if config.get('resume'):
        from learning_to_adapt_tpu.utils.checkpoint import resume_trainer
        start_itr = resume_trainer(exp_dir, dynamics_model, sampler)
        logger.log(f'Resuming from iteration {start_itr}')

    sample_processor = ModelSampleProcessor(recurrent=True)

    algo = Trainer(
        env=env,
        policy=policy,
        dynamics_model=dynamics_model,
        sampler=sampler,
        sample_processor=sample_processor,
        n_itr=config['n_itr'],
        start_itr=start_itr,
        initial_random_samples=config['initial_random_samples'],
        dynamics_model_max_epochs=config['dynamic_model_epochs'],
        config=config,
        profile_dir=(os.path.join(exp_dir, 'profile')
                     if config.get('profile') else None),
    )
    algo.train()


config = {
    # Environment
    'env': HalfCheetahEnv,
    'max_path_length': 1000,
    'task': None,
    'normalize': True,
    'n_itr': 50,
    'discount': 1.,

    # Policy
    'n_candidates': 500,
    'horizon': 10,
    'use_cem': False,
    'num_cem_iters': 5,

    # Training
    'num_rollouts': 5,
    'valid_split_ratio': 0.1,
    'rolling_average_persitency': 0.99,
    'initial_random_samples': True,

    # Dynamics Model
    'meta_batch_size': 10,
    'hidden_nonlinearity_model': 'relu',
    'learning_rate': 1e-3,
    'inner_learning_rate': 0.001,
    'hidden_sizes_model': (512, 512, 512),
    'dynamic_model_epochs': 100,
    'adapt_batch_size': 16,

    # Other
    'n_parallel': 5,
}


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--n_itr', type=int, default=None)
    p.add_argument('--exp_name', type=str, default='')
    p.add_argument('--resume', action='store_true')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--profile', action='store_true',
                   help='capture jax.profiler traces of one sampling '
                        'iteration and one model fit into <exp>/profile')
    p.add_argument('--env', type=str, default=None,
                   help='env class name, e.g. AntEnv '
                        '(default HalfCheetahEnv)')
    p.add_argument('--task', type=str, default=None,
                   help="task distribution, e.g. 'cripple'")
    add_task_distribution_args(p)
    args = p.parse_args()
    if args.env:
        config['env'] = ENVS[args.env]
    if args.task:
        config['task'] = args.task
    apply_task_distribution_args(args, config)
    config['resume'] = args.resume
    config['seed'] = args.seed
    config['profile'] = args.profile
    if args.n_itr:
        config['n_itr'] = args.n_itr
    config['exp_name'] = args.exp_name
    run_experiment(config)
