"""Worker for the multi-controller integration test (BASELINE config #5;
reference analog: the multiprocess env-worker layer,
vectorized_env_executor.py:72-213).

Launched by tests/test_multihost.py as 1 or 2 OS processes. With 2
processes each contributes 4 virtual CPU devices; `jax.distributed`
spans them into one 8-device platform, and the SAME Sampler/model.fit
code as single-controller runs over the spanning mesh (gloo collectives
over the loopback standing in for ICI/DCN). Prints one fingerprint JSON
line that the driver compares across processes and against the
single-process run.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    n_proc = int(sys.argv[1])
    pid = int(sys.argv[2])
    port = sys.argv[3]
    if n_proc > 1:
        jax.config.update('jax_cpu_collectives_implementation', 'gloo')
        jax.distributed.initialize(f'localhost:{port}',
                                   num_processes=n_proc, process_id=pid)
    assert len(jax.devices()) == 8, jax.devices()

    from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize
    from learning_to_adapt_tpu.models import (MetaMLPDynamicsModel,
                                              MLPDynamicsModel)
    from learning_to_adapt_tpu.parallel.mesh import make_mesh
    from learning_to_adapt_tpu.policies import MPCController
    from learning_to_adapt_tpu.samplers import ModelSampleProcessor, Sampler

    mesh = make_mesh(n_env=8, n_model=1)
    env = normalize(HalfCheetahEnv(task=None))
    model = MLPDynamicsModel('dyn', env, hidden_sizes=(32, 32),
                             batch_size=64, seed=3)
    model.mesh = mesh
    policy = MPCController('policy', env, model, n_candidates=24, horizon=3)
    sampler = Sampler(env=env, policy=policy, num_rollouts=8,
                      max_path_length=25, seed=5, mesh=mesh)
    proc = ModelSampleProcessor(recurrent=False)

    with mesh:
        paths = sampler.obtain_samples(random=True)
        samples = proc.process_samples(paths)
        fit = model.fit(samples['observations'], samples['actions'],
                        samples['next_observations'], epochs=3)
        paths2 = sampler.obtain_samples(random=False)

    # the flagship multihost workload is GrBAL (run_grbal_multihost.py):
    # also fit the second-order meta-learner sharded over the spanning
    # mesh on the same path-major data (recurrent [paths, T, dim] layout)
    meta = MetaMLPDynamicsModel('meta', env, meta_batch_size=2,
                                hidden_sizes=(16,), batch_size=3, seed=7)
    meta.mesh = mesh
    with mesh:
        rec = ModelSampleProcessor(recurrent=True).process_samples(paths)
        meta_fit = meta.fit(rec['observations'], rec['actions'],
                            rec['next_observations'], epochs=2)

    def param_sum(m):
        return round(float(sum(np.abs(np.asarray(x)).sum()
                               for x in jax.tree.leaves(
                                   jax.device_get(m.params)))), 4)

    print('FINGERPRINT ' + json.dumps({
        'rand_reward_sum': round(float(paths['rewards'].sum()), 4),
        'plan_reward_sum': round(float(paths2['rewards'].sum()), 4),
        'train_loss': round(float(fit['train_loss']), 6),
        'param_sum': param_sum(model),
        'meta_post_loss': round(float(meta_fit['post_loss']), 6),
        'meta_param_sum': param_sum(meta),
    }), flush=True)


if __name__ == '__main__':
    main()
