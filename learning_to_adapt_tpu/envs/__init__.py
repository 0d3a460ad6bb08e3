from learning_to_adapt_tpu.envs.base import (
    EnvState, NormalizedEnv, TPUEnv, normalize)
from learning_to_adapt_tpu.envs.half_cheetah import (
    HalfCheetahBlocksEnv, HalfCheetahEnv, HalfCheetahHFieldEnv)
from learning_to_adapt_tpu.envs.ant import AntEnv
from learning_to_adapt_tpu.envs.arm import Arm7DofEnv
