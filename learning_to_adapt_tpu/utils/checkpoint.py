"""Checkpoint / resume helpers.

The reference snapshots {itr, policy, env, dynamics_model} as joblib pickles
through the rllab Serializable ctor-replay protocol (reference
logger/logger.py:376-396, utils/serializable.py). Here snapshots are plain
pickles of pytree state dicts (params / optimizer state / normalizer /
dataset buffers) — no ctor replay needed because models rebuild from config
and load state explicitly.
"""
import os
import pickle


def save_snapshot(path, itr, dynamics_model, config=None, extra=None):
    snap = dict(itr=itr, dynamics_model=dynamics_model.state_dict(),
                config=config)
    if extra:
        snap.update(extra)
    with open(path, 'wb') as f:
        pickle.dump(snap, f)


def load_snapshot(path):
    with open(path, 'rb') as f:
        return pickle.load(f)


def resume_trainer(exp_dir, dynamics_model, sampler=None):
    """Restores model state (params/opt/normalizer AND the aggregated
    dataset + split RNG, full-fidelity) plus the sampler's PRNG/episode
    stream from an experiment dir; returns the next iteration index (the
    reference exposes Trainer(start_itr=...) but never wires it — reference
    trainers/mb_trainer.py:29; here resume is first-class and
    resume-equivalent: train(N) == train(k) + resume(N-k) up to f32
    reduction order, tested in tests/test_replay_e2e.py)."""
    path = os.path.join(exp_dir, 'params.pkl')
    if not os.path.exists(path):
        return 0
    snap = load_snapshot(path)
    dynamics_model.load_state_dict(snap['dynamics_model'])
    if sampler is not None and snap.get('sampler') is not None:
        sampler.load_state_dict(snap['sampler'])
    return snap['itr'] + 1
