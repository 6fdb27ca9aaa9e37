"""Optimizer construction (reference `/root/reference/src/common/trainer.py:126-143`).

Supports the same four learners (adam / sgd / adagrad / rmsprop) with
torch-style coupled weight decay (decay added to the gradient *before* the
adaptive scaling, matching ``torch.optim.Adam(weight_decay=...)``), plus
optional global-norm gradient clipping (`trainer.py:236-237`).

The learning rate is exposed through ``optax.inject_hyperparams`` so the
host-side per-epoch exponential decay schedule
``lr(epoch) = lr0 * s0 ** (epoch / s1)`` (`trainer.py:96-99`) can update it
in-place in the optimizer state without recompiling the train step.
"""

from __future__ import annotations

from typing import Any, Optional

import optax


def build_optimizer(config) -> optax.GradientTransformation:
    learner = str(config.get("learner", "adam")).lower()
    lr0 = float(config.get("learning_rate", 1e-3))
    wd = config.get("weight_decay") or 0.0
    if isinstance(wd, str):
        wd = float(eval(wd))  # reference does the same for string decay values
    clip = config.get("clip_grad_norm")

    def opt_fn(learning_rate):
        txs = []
        if clip:
            max_norm = clip.get("max_norm") if isinstance(clip, dict) else float(clip)
            txs.append(optax.clip_by_global_norm(float(max_norm)))
        if wd:
            txs.append(optax.add_decayed_weights(float(wd)))
        if learner == "adam":
            txs.append(optax.scale_by_adam())
        elif learner == "sgd":
            pass
        elif learner == "adagrad":
            txs.append(optax.scale_by_rss(initial_accumulator_value=0.0, eps=1e-10))
        elif learner == "rmsprop":
            txs.append(optax.scale_by_rms(decay=0.99, eps=1e-8))
        else:
            txs.append(optax.scale_by_adam())
        txs.append(optax.scale(-learning_rate))
        return optax.chain(*txs)

    return optax.inject_hyperparams(opt_fn)(learning_rate=lr0)


def set_learning_rate(opt_state, lr: float):
    """Write the injected learning rate into an existing optimizer state."""
    opt_state.hyperparams["learning_rate"] = type(
        opt_state.hyperparams["learning_rate"]
    )(lr) if not hasattr(opt_state.hyperparams["learning_rate"], "dtype") else (
        opt_state.hyperparams["learning_rate"] * 0 + lr
    )
    return opt_state


def lr_schedule(config):
    """Return lr(epoch) following the reference LambdaLR (`trainer.py:96-99`)."""
    lr0 = float(config.get("learning_rate", 1e-3))
    sched = config.get("learning_rate_scheduler") or [1.0, 50]
    s0, s1 = float(sched[0]), float(sched[1])

    def fn(epoch: int) -> float:
        return lr0 * (s0 ** (epoch / s1))

    return fn
