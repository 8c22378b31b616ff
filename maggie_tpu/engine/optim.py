"""Optimizer + LR schedule factory (reference ``maggie/engine/optim.py:97-141``).

Schedules are optax functions of the step index, matched to the torch schedulers the
reference instantiates:
- ``poly``: (1 - x/(max_iter+1))**power  (LambdaLR, ``optim.py:125``)
- ``step``: gamma**(x // step_size)      (StepLR, ``optim.py:127``)
- ``warmup_decay``: linear warmup then inverse-sqrt (``optim.py:128-134``)
- ``cosine``: OneCycleLR with cosine anneal and warmup pct (``optim.py:135-137``);
  torch's OneCycle ramps lr from max_lr/div_factor (25) up over pct_start, then
  cosine-anneals to max_lr/final_div_factor (1e4).

The global grad clip of 0.01 lives in the train step (reference keeps it in the
train loop at ``engine/train.py:273-274``, not in the optimizer).
"""

from __future__ import annotations

from typing import Any, Callable

import optax


def build_lr_schedule(cfg: Any) -> Callable[[int], float]:
    sc = cfg.train.scheduler
    base_lr = float(cfg.train.optimizer.lr)
    max_iter = int(cfg.train.max_iter)
    name = sc.name

    if name == "poly":
        power = float(sc.power)
        return lambda step: base_lr * (1.0 - step / (max_iter + 1)) ** power
    if name == "step":
        size, gamma = int(sc.step_size), float(sc.gamma)
        return optax.exponential_decay(base_lr, transition_steps=size, decay_rate=gamma, staircase=True)
    if name == "warmup_decay":
        warm = int(sc.warmup_iters)

        def fn(step):
            import jax.numpy as jnp
            s = jnp.asarray(step, jnp.float32)
            return base_lr * jnp.where(s < warm, s / warm, jnp.sqrt(warm / jnp.maximum(s, 1.0)))
        return fn
    if name == "cosine":
        # torch OneCycleLR defaults: div_factor=25, final_div_factor=1e4, cos anneal
        warm = max(int(sc.warmup_iters), 1)
        pct_start = warm / max_iter
        initial = base_lr / 25.0
        final = initial / 1e4
        up_steps = max(int(round(pct_start * max_iter)) - 1, 1)

        def fn(step):
            import jax.numpy as jnp
            s = jnp.asarray(step, jnp.float32)
            up = initial + (base_lr - initial) * 0.5 * (1 - jnp.cos(jnp.pi * jnp.minimum(s / up_steps, 1.0)))
            down_t = jnp.clip((s - up_steps) / max(max_iter - 1 - up_steps, 1), 0.0, 1.0)
            down = final + (base_lr - final) * 0.5 * (1 + jnp.cos(jnp.pi * down_t))
            return jnp.where(s <= up_steps, up, down)
        return fn
    raise NotImplementedError(f"scheduler {name}")


def build_optimizer(cfg: Any) -> tuple[optax.GradientTransformation, Callable[[int], float]]:
    oc = cfg.train.optimizer
    schedule = build_lr_schedule(cfg)
    wd = float(oc.weight_decay)
    name = oc.name
    if name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(learning_rate=schedule, momentum=float(oc.momentum)),
        )
    elif name == "adam":
        b1, b2 = [float(b) for b in oc.betas]
        # torch Adam applies weight decay as L2 on the gradient
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(learning_rate=schedule, b1=b1, b2=b2),
        )
    elif name == "adamw":
        b1, b2 = [float(b) for b in oc.betas]
        tx = optax.adamw(learning_rate=schedule, b1=b1, b2=b2, weight_decay=wd)
    else:
        raise NotImplementedError(f"optimizer {name}")
    # reference clips grads to global-norm 0.01 in the train loop (train.py:273-274)
    return optax.chain(optax.clip_by_global_norm(0.01), tx), schedule
