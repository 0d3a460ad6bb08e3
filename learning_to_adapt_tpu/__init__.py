"""learning_to_adapt_tpu: TPU-native model-based meta-RL framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
iclavera/learning_to_adapt (model-based meta-RL via MPC over learned dynamics
models: MB-MPC, GrBAL, ReBAL) for TPU hardware: batched jittable physics,
fully on-device planners and adaptation, mesh-sharded scale-out.
"""

__version__ = '0.1.0'
