"""Config serialization helpers (reference utils/utils.py:213-219:
ClassEncoder dumps classes/callables by name so params.json stays readable
and viskit-style grouping works)."""
import json


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
