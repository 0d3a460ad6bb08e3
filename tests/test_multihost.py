"""Multi-controller (multi-host) integration test.

Exercises the code path run_scripts/run_grbal_multihost.py uses on a real
pod slice — `jax.distributed.initialize` + a device mesh spanning
processes — entirely on the CPU backend: 2 OS processes x 4 virtual
devices each vs 1 process x 8 devices, same seeds, asserting the sharded
rollout and the sharded model.fit agree to rtol=2e-3 (the same program up
to f32 reduction order — GSPMD partitions reductions differently across
process topologies, so bitwise equality is not expected). This is the
distributed-correctness test the reference never had (its pipe protocol
was exercised only by running training, SURVEY.md section 4).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = os.path.join(os.path.dirname(__file__), '_multihost_worker.py')
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker_env(n_local_devices):
    env = dict(os.environ)
    # drop the ambient TPU plugin (sitecustomize registers it when
    # PALLAS_AXON_POOL_IPS is set) and pin the virtual CPU platform
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = (
        f'--xla_force_host_platform_device_count={n_local_devices}')
    return env


def _free_port():
    """A port for the jax.distributed coordinator. Probing with bind(0)
    then closing leaves a TOCTOU window; offsetting by PID keeps parallel
    test runs on this host from racing each other for the same port, and
    the bind-probe still rejects ports already in use."""
    base = 20011 + (os.getpid() % 20000)
    for port in range(base, base + 50):
        s = socket.socket()
        try:
            s.bind(('localhost', port))
        except OSError:
            continue
        finally:
            s.close()
        return port
    raise RuntimeError('no free port found')


def _parse(out):
    for line in out.splitlines():
        if line.startswith('FINGERPRINT '):
            return json.loads(line[len('FINGERPRINT '):])
    raise AssertionError(f'no fingerprint in output:\n{out}')


def _run_single():
    r = subprocess.run(
        [sys.executable, _WORKER, '1', '0', '0'], env=_worker_env(8),
        capture_output=True, text=True, timeout=600, cwd=_REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    return _parse(r.stdout)


def _run_pair():
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, '2', str(i), str(port)],
        env=_worker_env(4), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, cwd=_REPO)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), '\n'.join(outs)
    return [_parse(o) for o in outs]


def test_two_process_mesh_matches_single_process():
    single = _run_single()
    pair = _run_pair()
    # both controllers computed the same global program
    assert pair[0] == pair[1], (pair, single)
    # vs single-process: same math, different reduction order (f32) —
    # rtol=2e-3 is the agreement bound, not bitwise identity
    for k in single:
        np.testing.assert_allclose(pair[0][k], single[k], rtol=2e-3,
                                   err_msg=f'{k}: {pair[0]} vs {single}')
