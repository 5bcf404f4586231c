"""Small framework-wide helpers.

Behavioral parity with the reference helper set
(`denoising_diffusion/utils.py:3-49` in lbarseghyan/diffusion-models).
"""

import math


def exists(x):
    return x is not None


def default(val, d):
    if exists(val):
        return val
    return d() if callable(d) else d


def cast_tuple(t, length=1):
    if isinstance(t, tuple):
        return t
    return (t,) * length


def divisible_by(numer, denom):
    return (numer % denom) == 0


def identity(t, *args, **kwargs):
    return t


def cycle(iterable):
    while True:
        for data in iterable:
            yield data


def has_int_squareroot(num):
    return (math.isqrt(num) ** 2) == num


def num_to_groups(num, divisor):
    groups, remainder = divmod(num, divisor)
    arr = [divisor] * groups
    if remainder > 0:
        arr.append(remainder)
    return arr


def normalize_to_neg_one_to_one(img):
    return img * 2 - 1


def unnormalize_to_zero_to_one(t):
    return (t + 1) * 0.5


def parallel_data_prefetch(func, data, n_workers: int = 8, as_array: bool = True):
    """Parallel map over a sequence (reference `ldm/util.py:108`
    `parallel_data_prefetch`, which shells out to mp.Process/Queue). Threads
    suffice here: the intended workloads (image decode/IO) release the GIL."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max(1, n_workers)) as pool:
        out = list(pool.map(func, data))
    if as_array:
        import numpy as np

        try:
            return np.stack(out)
        except ValueError:
            return out
    return out


def count_params(params, verbose: bool = False) -> int:
    """Total parameter count of a pytree (reference `ldm/util.py:71`)."""
    import jax

    total = sum(p.size for p in jax.tree_util.tree_leaves(params))
    if verbose:
        print(f"{total * 1e-6:.2f} M params.")
    return total
