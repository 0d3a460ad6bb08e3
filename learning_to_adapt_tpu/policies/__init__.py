from learning_to_adapt_tpu.policies.controllers import (
    MPCController, RNNMPCController)
