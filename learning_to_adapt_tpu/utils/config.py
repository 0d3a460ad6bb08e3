"""Config serialization helpers (reference utils/utils.py:213-219:
ClassEncoder dumps classes/callables by name so params.json stays readable
and viskit-style grouping works)."""
import json
import os

#: config keys that define the training task distribution / run identity —
#: a resumed run silently continuing with different values for any of
#: these would contaminate the experiment (e.g. forgetting --cripple_set
#: on --resume would train on the held-out actuator and clobber the
#: recorded config; advisor round-4 finding)
RESUME_IDENTITY_KEYS = ('env', 'task', 'cripple_set', 'terrain_set',
                        'damping_range', 'seed')


def _norm_cfg_value(key, v):
    if key == 'env':
        if isinstance(v, dict):
            v = v.get('$class', '')
        if isinstance(v, type):
            v = v.__module__ + '.' + v.__name__
        return str(v).split('.')[-1]
    if isinstance(v, (list, tuple)):
        return tuple(v)
    return v


def check_resume_config(exp_dir, config, keys=RESUME_IDENTITY_KEYS):
    """Guard --resume against a mismatched CLI config: compare the saved
    exp_dir/params.json against the rebuilt config on the task-identity
    keys and raise before anything is overwritten."""
    path = os.path.join(exp_dir, 'params.json')
    if not os.path.exists(path):
        return
    with open(path) as f:
        saved = json.load(f)
    for k in keys:
        old = _norm_cfg_value(k, saved.get(k))
        new = _norm_cfg_value(k, config.get(k))
        if old != new:
            raise ValueError(
                f"--resume config mismatch for '{k}': the snapshot in "
                f'{exp_dir} was trained with {old!r} but the command line '
                f'rebuilds {new!r}. Pass the original flags (or a new '
                f'--exp_name) — resuming would silently continue training '
                f'on a different task distribution and overwrite the '
                f'recorded config.')


class ClassEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, type):
            return {'$class': o.__module__ + '.' + o.__name__}
        if callable(o):
            return {'$function': getattr(o, '__module__', '?') + '.' +
                    getattr(o, '__name__', repr(o))}
        try:
            return json.JSONEncoder.default(self, o)
        except TypeError:
            return repr(o)
