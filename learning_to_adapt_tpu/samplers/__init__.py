from learning_to_adapt_tpu.samplers.sampler import (
    ModelSampleProcessor, Sampler)
