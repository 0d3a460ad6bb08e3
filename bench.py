"""Benchmark: batched MPC env-steps/s on one chip, plus canonical-config
workloads, MFU, and a *measured* reference-architecture CPU baseline.

Workloads
  saturated   256 envs x 128 candidates x horizon 10, (512,512) model —
              the throughput-bound regime (headline, tracked across rounds).
  grbal       canonical GrBAL HalfCheetah sampling: 5 envs x 500 candidates
              x horizon 10, (512,512,512) meta model with per-step
              adaptation — the latency-bound regime the actual experiments
              run (reference run_scripts/run_grbal.py:74-107).
  mb_mpc      canonical MB-MPC: 10 envs x 2000 candidates x horizon 20,
              (512,512) (reference run_scripts/run_mb_mpc.py:71-103).

Baseline: a faithful re-creation of the reference architecture measured on
THIS host's CPU — per-env-step host planning (horizon sequential numpy
batch forwards standing in for sess.run, reference mpc_controller.py:108-129)
plus the f64 C++ physics oracle standing in for libmujoco131
(mujoco_env.py:160-167). The reference itself (TF 1.13 + mjpro131) cannot
be installed in this image; this baseline is architecture-faithful and
hardware-generous (modern many-core CPU + OpenBLAS vs 2019 TF1).

The baseline is measured at BOTH workload shapes so every vs_baseline
ratio divides like-for-like (same n_envs / n_candidates / hidden sizes on
both sides): `vs_baseline_saturated` for the headline saturated workload
and `vs_baseline_canonical` for the canonical GrBAL workload. The stdout
JSON reports which baseline value and source it used.

MFU counts planner model-forward matmul FLOPs (the MXU work) against the
chip's peak bf16 FLOP/s.

Prints aux metric JSON lines to stderr and ONE JSON line to stdout:
{"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the fused rollout programs compile once per
# machine; subsequent bench runs (the driver's) start in seconds
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          '.jax_cache')
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE_DIR)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

# peak bf16 FLOP/s per chip by device kind (public spec sheets)
_PEAK_BF16 = {
    'TPU v4': 275e12,
    'TPU v5 lite': 197e12,   # v5e
    'TPU v5e': 197e12,
    'TPU v5': 459e12,        # v5p
    'TPU v5p': 459e12,
    'TPU v6 lite': 918e12,   # v6e (Trillium)
    'TPU v6e': 918e12,
}


def _peak_flops():
    kind = jax.devices()[0].device_kind
    for k in sorted(_PEAK_BF16, key=len, reverse=True):
        if kind.startswith(k):
            return _PEAK_BF16[k], kind
    return None, kind


def _mlp_flops_per_row(sizes):
    return 2 * sum(sizes[i] * sizes[i + 1] for i in range(len(sizes) - 1))


def _aux(name, value, unit):
    print(json.dumps({'metric': name, 'value': value, 'unit': unit}),
          file=sys.stderr)


def _time_rollout(rollout, model, n_timed, key):
    # warmup/compile (2 calls: the first pays compilation, the second any
    # post-compile autotuning/transfer settling)
    for i in range(2):
        paths = rollout(model.params, model.normalizer,
                        jax.random.fold_in(key, 100 + i), np.int32(1))
        jax.block_until_ready(paths)
    times = []
    for i in range(n_timed):
        t0 = time.perf_counter()
        paths = rollout(model.params, model.normalizer,
                        jax.random.fold_in(key, i), np.int32(1))
        jax.block_until_ready(paths)
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_saturated(num_envs=256, path_len=64):
    """Throughput-bound workload. The 256-env shape is the round-1..3
    tracked headline; the DESIGN.md shape sweep found saturation near 512
    envs (256: 86.9k, 512: 103.0k, 1024: 99.4k at path 32), so main()
    measures BOTH and reports the saturating one with its like-for-like
    baseline (VERDICT round-3 next-step #2)."""
    from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize
    from learning_to_adapt_tpu.models import MLPDynamicsModel
    from learning_to_adapt_tpu.policies import MPCController
    from learning_to_adapt_tpu.samplers.rollout import make_rollout_fn

    n_cand, horizon = 128, 10
    env = normalize(HalfCheetahEnv(task='cripple', reset_every_episode=True))
    model = MLPDynamicsModel('dyn', env, hidden_sizes=(512, 512),
                             batch_size=128)
    policy = MPCController('policy', env, model, n_candidates=n_cand,
                           horizon=horizon)
    rollout = make_rollout_fn(env, policy, model, num_envs, path_len)
    t = _time_rollout(rollout, model, 8, jax.random.PRNGKey(0))
    steps = num_envs * path_len
    sps = steps / t
    # planner model-forward FLOPs per env step (f32->bf16 MXU matmuls)
    sizes = (26,) + (512, 512) + (20,)
    flops_per_step = horizon * n_cand * _mlp_flops_per_row(sizes)
    peak, kind = _peak_flops()
    _aux(f'saturated env-steps/s/chip ({num_envs} envs)', round(sps, 1),
         'env-steps/s')
    if peak:
        mfu = sps * flops_per_step / peak
        _aux(f'saturated planner MFU ({kind}, {num_envs} envs)',
             round(mfu * 100, 1), '%')
    return sps


def bench_grbal_canonical():
    from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize
    from learning_to_adapt_tpu.models import MetaMLPDynamicsModel
    from learning_to_adapt_tpu.policies import MPCController
    from learning_to_adapt_tpu.samplers.rollout import make_rollout_fn

    num_envs, path_len, n_cand, horizon = 5, 1000, 500, 10
    # exactly the reference config: task=None, reset_every_episode=True
    # (reference run_grbal.py:21,77)
    env = normalize(HalfCheetahEnv(task=None, reset_every_episode=True))
    model = MetaMLPDynamicsModel('dyn', env, meta_batch_size=10,
                                 hidden_sizes=(512, 512, 512),
                                 batch_size=16)
    policy = MPCController('policy', env, model, n_candidates=n_cand,
                           horizon=horizon)
    rollout = make_rollout_fn(env, policy, model, num_envs, path_len,
                              adapt_batch_size=16)
    t = _time_rollout(rollout, model, 4, jax.random.PRNGKey(1))
    steps = num_envs * path_len
    sps = steps / t
    sizes = (26,) + (512, 512, 512) + (20,)
    flops_per_step = horizon * n_cand * _mlp_flops_per_row(sizes)
    peak, kind = _peak_flops()
    _aux('canonical GrBAL env-steps/s (5 envs, per-step adaptation)',
         round(sps, 1), 'env-steps/s')
    _aux('canonical GrBAL s/1000 env-steps', round(1000.0 / sps, 3), 's')
    if peak:
        mfu = sps * flops_per_step / peak
        _aux(f'canonical GrBAL planner MFU ({kind})',
             round(mfu * 100, 1), '%')
    return sps


def bench_mb_mpc_canonical():
    from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize
    from learning_to_adapt_tpu.models import MLPDynamicsModel
    from learning_to_adapt_tpu.policies import MPCController
    from learning_to_adapt_tpu.samplers.rollout import make_rollout_fn

    num_envs, path_len, n_cand, horizon = 10, 100, 2000, 20
    env = normalize(HalfCheetahEnv(task=None))
    model = MLPDynamicsModel('dyn', env, hidden_sizes=(512, 512),
                             batch_size=128)
    policy = MPCController('policy', env, model, n_candidates=n_cand,
                           horizon=horizon)
    rollout = make_rollout_fn(env, policy, model, num_envs, path_len)
    t = _time_rollout(rollout, model, 4, jax.random.PRNGKey(2))
    sps = num_envs * path_len / t
    sizes = (26,) + (512, 512) + (20,)
    flops_per_step = horizon * n_cand * _mlp_flops_per_row(sizes)
    peak, kind = _peak_flops()
    _aux('canonical MB-MPC env-steps/s (10 envs)', round(sps, 1),
         'env-steps/s')
    if peak:
        mfu = sps * flops_per_step / peak
        _aux(f'canonical MB-MPC planner MFU ({kind})',
             round(mfu * 100, 1), '%')
    return sps


def bench_cpu_reference_baseline(label, num_envs=5, n_cand=500, horizon=10,
                                 hidden=(512, 512, 512), n_cycles=8):
    """Reference-architecture host loop, measured on this CPU.

    Per env step (reference sampler.py:73-127 + mpc_controller.py:108-129):
    horizon sequential batched numpy model forwards over
    (n_candidates * num_envs) rows (the sess.run boundary), argmax action
    selection, then per-env C++ oracle physics steps (libmujoco131 stand-in,
    reference mujoco_env.py:160-167). Workload shape is parameterized so the
    baseline can be measured at exactly the shapes the TPU benches run.

    Returns ONE repeat's peak-cycle steps/s; main() interleaves several
    repeats per shape and takes the median so the quoted ratio is robust
    to host-load swings between captures (a single draw was observed to
    move +-30% between driver runs — VERDICT round-4 weak #1).
    """
    from learning_to_adapt_tpu.envs import HalfCheetahEnv
    from learning_to_adapt_tpu.native import oracle

    sizes = (26,) + tuple(hidden) + (20,)
    rng = np.random.RandomState(0)
    ws = [rng.randn(sizes[i], sizes[i + 1]).astype(np.float32) * 0.05
          for i in range(len(sizes) - 1)]
    bs_ = [np.zeros(sizes[i + 1], np.float32) for i in range(len(sizes) - 1)]

    env = HalfCheetahEnv(task=None)
    if not oracle.available():
        _aux(f'cpu reference baseline ({label})', None, 'oracle unavailable')
        return None
    phys = [oracle.NativePhysics(env.model) for _ in range(num_envs)]
    init_qpos = np.asarray(env.model.qpos0 if env.model.init_qpos is None
                           else env.model.init_qpos, np.float64)
    qpos = [init_qpos.copy() for _ in range(num_envs)]
    qvel = [np.zeros(env.model.nv) for _ in range(num_envs)]
    act_dim = env.model.nu
    obs_dim = 20
    frame_skip = env.frame_skip

    def host_forward(x):
        h = x
        for i, (w, b) in enumerate(zip(ws, bs_)):
            h = h @ w + b
            if i < len(ws) - 1:
                h = np.maximum(h, 0.0)
        return h

    cycle_times = []
    for _ in range(n_cycles):
        t0 = time.perf_counter()
        # --- plan: h sequential host-boundary batch forwards ---
        obs = rng.randn(num_envs, obs_dim).astype(np.float32)
        obs_rep = np.repeat(obs, n_cand, axis=0)
        cand = rng.uniform(-1, 1, (horizon, n_cand * num_envs, act_dim)
                           ).astype(np.float32)
        returns = np.zeros(n_cand * num_envs, np.float32)
        cur = obs_rep
        for t in range(horizon):
            delta = host_forward(np.concatenate([cur, cand[t]], axis=1))
            nxt = cur + delta
            returns += (nxt[:, -3] - cur[:, -3]) / env.dt \
                - 0.05 * np.sum(np.square(cand[t]), axis=1)
            cur = nxt
        best = returns.reshape(num_envs, n_cand).argmax(axis=1)
        acts = cand[0].reshape(num_envs, n_cand, act_dim)[
            np.arange(num_envs), best]
        # --- step the physics, frame_skip x per env (worker stand-in) ---
        for e in range(num_envs):
            for _ in range(frame_skip):
                qpos[e], qvel[e] = phys[e].step(qpos[e], qvel[e], acts[e])
        cycle_times.append(time.perf_counter() - t0)
    # best cycle: the baseline's peak capability, insensitive to whatever
    # else this host happens to be running during the bench
    sps = num_envs / min(cycle_times)
    _aux(f'cpu reference-architecture baseline, {label} workload '
         '(measured this host)', round(sps, 2), 'env-steps/s')
    return sps


BASELINE_REPEATS = 5


def _measure_baselines(repeats=BASELINE_REPEATS):
    """Median-of-repeats CPU baselines at every workload shape.

    The repeats are INTERLEAVED across shapes (shape1, shape2, shape3,
    shape1, ...) so each shape's repeats sample host-load variation across
    the whole measurement window rather than one contiguous burst; the
    median + dispersion make the quoted ratio reproducible between driver
    captures (two captures agree within the stated dispersion)."""
    shapes = {
        'canonical GrBAL': dict(num_envs=5, n_cand=500, horizon=10,
                                hidden=(512, 512, 512), n_cycles=8),
        'saturated': dict(num_envs=256, n_cand=128, horizon=10,
                          hidden=(512, 512), n_cycles=3),
        'saturated-512': dict(num_envs=512, n_cand=128, horizon=10,
                              hidden=(512, 512), n_cycles=3),
    }
    draws = {label: [] for label in shapes}
    for _ in range(repeats):
        for label, kw in shapes.items():
            try:
                sps = bench_cpu_reference_baseline(label, **kw)
                if sps:
                    draws[label].append(sps)
            except Exception as e:  # noqa: BLE001 — baseline is auxiliary
                print(f'cpu {label} baseline repeat failed: {e}',
                      file=sys.stderr)
    out = {}
    for label, ds in draws.items():
        if not ds:
            out[label] = (None, None, 0)
            continue
        med = float(np.median(ds))
        disp = ((max(ds) - min(ds)) / med * 100.0) if med else None
        _aux(f'cpu baseline {label}: median of {len(ds)} interleaved '
             'repeats', round(med, 2), 'env-steps/s')
        _aux(f'cpu baseline {label}: repeat dispersion (max-min)/median',
             round(disp, 1), '%')
        out[label] = (med, disp, len(ds))
    return out


def main():
    # measure the CPU reference-architecture baseline at BOTH workload
    # shapes so each vs_baseline divides matching numerator/denominator;
    # median of interleaved repeats (capture-robust — see
    # _measure_baselines)
    bases = _measure_baselines()
    base_canon, _, _ = bases.get('canonical GrBAL', (None, None, 0))
    base_sat, disp_sat, n_sat = bases.get('saturated', (None, None, 0))
    base_sat512, disp_sat512, n_sat512 = bases.get(
        'saturated-512', (None, None, 0))
    sps_canon = None
    try:
        sps_canon = bench_grbal_canonical()
    except Exception as e:  # noqa: BLE001
        print(f'grbal canonical failed: {e}', file=sys.stderr)
    try:
        bench_mb_mpc_canonical()
    except Exception as e:  # noqa: BLE001
        print(f'mb_mpc canonical failed: {e}', file=sys.stderr)

    sps256 = bench_saturated(num_envs=256)
    sps512 = None
    try:
        sps512 = bench_saturated(num_envs=512)
    except Exception as e:  # noqa: BLE001
        print(f'saturated-512 failed: {e}', file=sys.stderr)
    if sps_canon and base_canon:
        _aux('vs_baseline_canonical (GrBAL shapes, both sides measured)',
             round(sps_canon / base_canon, 1), 'x')
    if base_sat:
        _aux('vs_baseline_saturated_256 (256-env shapes, both sides '
             'measured)', round(sps256 / base_sat, 1), 'x')
    if sps512 and base_sat512:
        _aux('vs_baseline_saturated_512 (512-env shapes, both sides '
             'measured)', round(sps512 / base_sat512, 1), 'x')
    # headline = the saturating shape, with the baseline measured at THAT
    # shape (numerator and denominator always share the workload); among
    # shapes, prefer the fastest candidate that HAS a measured baseline —
    # never report the max-throughput shape with a null ratio while
    # another shape had a like-for-like denominator (advisor round-4)
    candidates = [(sps256, base_sat, disp_sat, n_sat, 256)]
    if sps512:
        candidates.append((sps512, base_sat512, disp_sat512, n_sat512, 512))
    with_base = [c for c in candidates if c[1]]
    sps, base, disp, n_reps, shape = max(with_base or candidates,
                                         key=lambda c: c[0])
    # never fabricate a denominator: if no shape has a measured baseline,
    # vs_baseline is reported as null rather than against a number from a
    # different workload
    print(json.dumps({
        'metric': 'env-steps/s/chip (batched MPC rollouts, saturated)',
        'value': round(sps, 1),
        'unit': 'env-steps/s',
        'vs_baseline': (round(sps / base, 2) if base else None),
        'baseline': (round(base, 2) if base else None),
        'baseline_dispersion_pct': (round(disp, 1) if disp is not None
                                    else None),
        'baseline_repeats': n_reps,
        'baseline_source': (f'measured: reference architecture on this host '
                            f'CPU at the same {shape}-env saturated workload '
                            f'shapes (median of {n_reps} interleaved repeats'
                            f'{"" if n_reps == BASELINE_REPEATS else f" — {BASELINE_REPEATS - n_reps} of {BASELINE_REPEATS} failed, see stderr"}'
                            ') ' if base
                            else 'unavailable (baseline measurement failed '
                                 'on this host — see stderr)'),
    }))


if __name__ == '__main__':
    main()
