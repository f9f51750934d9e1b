"""numba stand-in: njit as a no-op decorator (pure-python execution).

The reference uses @njit only on `_compute_direction`
(/root/reference/autolabel/dataset.py:17-37); running it un-jitted slows
the host ray pipeline but keeps semantics identical.
"""


def njit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def decorator(fn):
        return fn

    return decorator


def jit(*args, **kwargs):
    return njit(*args, **kwargs)
