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


def resume_trainer(exp_dir, dynamics_model):
    """Restores model state from an experiment dir; returns the next
    iteration index (the reference exposes Trainer(start_itr=...) but never
    wires it — reference trainers/mb_trainer.py:29; here resume is
    first-class)."""
    path = os.path.join(exp_dir, 'params.pkl')
    if not os.path.exists(path):
        return 0
    snap = load_snapshot(path)
    dynamics_model.load_state_dict(snap['dynamics_model'])
    return snap['itr'] + 1
