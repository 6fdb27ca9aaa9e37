"""Small shared utilities: seeding, early stopping, formatting.

Semantics follow the reference (`/root/reference/src/utils/utils.py:48-117`):
``early_stopping`` keeps a step counter that resets on improvement and flags a
stop once ``max_step`` evaluations pass without one.
"""

from __future__ import annotations

import datetime
import random
from typing import Dict, Tuple

import numpy as np


def init_seed(seed: int) -> None:
    """Seed python + numpy RNGs (reference `utils.py:48-54`).

    JAX randomness is explicitly keyed (`jax.random.key(seed)`) by callers,
    so no global JAX state needs seeding here.
    """
    random.seed(seed)
    np.random.seed(seed)


def get_local_time() -> str:
    return datetime.datetime.now().strftime("%b-%d-%Y-%H-%M-%S")


def early_stopping(
    value: float,
    best: float,
    cur_step: int,
    max_step: int,
    bigger: bool = True,
) -> Tuple[float, int, bool, bool]:
    """Early-stopping bookkeeping (reference `utils.py:57-98`).

    Returns:
        (best, cur_step, stop_flag, update_flag)
    """
    stop_flag = False
    update_flag = False
    improved = value > best if bigger else value < best
    if improved:
        best = value
        cur_step = 0
        update_flag = True
    else:
        cur_step += 1
        if cur_step > max_step:
            stop_flag = True
    return best, cur_step, stop_flag, update_flag


def dict2str(result_dict: Dict[str, float]) -> str:
    """Format a metric dict for logging (reference `utils.py:101-117`)."""
    return "    ".join(f"{metric}: {value:.4f}" for metric, value in result_dict.items())
