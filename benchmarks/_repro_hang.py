import faulthandler, sys
faulthandler.dump_traceback_later(240, exit=True)
import jax, numpy as np
from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize
from learning_to_adapt_tpu.models import MLPDynamicsModel
from learning_to_adapt_tpu.policies import MPCController
from learning_to_adapt_tpu.samplers import Sampler
print('building env...', flush=True)
env = normalize(HalfCheetahEnv(task=None))
model = MLPDynamicsModel('dyn', env, hidden_sizes=(512, 512), batch_size=128)
policy = MPCController('policy', env, model, n_candidates=2000, horizon=20)
sampler = Sampler(env=env, policy=policy, num_rollouts=10,
                  max_path_length=100, n_parallel=2)
print('obtaining random samples...', flush=True)
paths = sampler.obtain_samples(random=True)
print('ok random', flush=True)
paths = sampler.obtain_samples(random=False)
print('ok planned', flush=True)
