"""Jitted training step: loss, grads, optimizer update, mutable-state carry.

TPU-native replacement for the reference train-loop body
(``maggie/engine/train.py:211-283``): autocast/GradScaler become bf16 params with f32
master math (no loss scaling needed on TPU), DDP's gradient all-reduce becomes the
collectives XLA inserts for the sharded batch, and the Python-level randomness (the
75% PRM-weight draw, warmup gates) enters as STATIC flags so each of the few variants
compiles once and is cached.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any
    spectral: Any

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.spectral:
            v["spectral"] = self.spectral
        return v


def create_train_state(model, tx: optax.GradientTransformation, init_batch: dict,
                       rng: jax.Array) -> TrainState:
    variables = model.init(
        {"params": rng, "unknown": jax.random.fold_in(rng, 1), "dropout": jax.random.fold_in(rng, 2)},
        init_batch, train=False)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
        spectral=variables.get("spectral", {}),
    )


def make_train_step(model, tx: optax.GradientTransformation,
                    remat: bool | str = False) -> Callable:
    """Returns train_step(state, batch, rng, **static flags) -> (state, loss_dict).

    Static flags (each combination compiles once):
      use_mask_atten, use_gt_guidance, use_prm_weights, atten_loss_enabled.

    ``remat`` trades FLOPs for HBM on large crops:
      - False / "none": store all activations;
      - True / "full": whole-forward ``jax.checkpoint`` — nothing stored, the
        entire forward recomputes once during backward;
      - "selective": store ONLY the stage-boundary activations tagged with
        ``checkpoint_name(x, "stage")`` in the model (encoder skips, os8
        attention output, ladder rung boundaries) — backward recomputes within
        a stage instead of the whole net, cutting the remat overhead while
        keeping peak memory close to the full-remat point.
    """
    policy = None
    if remat == "selective":
        policy = jax.checkpoint_policies.save_only_these_names("stage")
        remat = True

    @functools.partial(jax.jit, static_argnames=(
        "use_mask_atten", "use_gt_guidance", "use_prm_weights", "atten_loss_enabled"))
    def train_step(state: TrainState, batch: dict, rng: jax.Array, *,
                   use_mask_atten: bool = False,
                   use_gt_guidance: bool = False,
                   use_prm_weights: bool = True,
                   atten_loss_enabled: bool = True):
        k_unknown, k_dropout = jax.random.split(jax.random.fold_in(rng, state.step))

        def forward(params):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats, "spectral": state.spectral},
                batch, train=True, update_sn=True,
                use_mask_atten=use_mask_atten,
                use_gt_guidance=use_gt_guidance,
                use_prm_weights=use_prm_weights,
                atten_loss_enabled=atten_loss_enabled,
                rngs={"unknown": k_unknown, "dropout": k_dropout},
                mutable=["batch_stats", "spectral"])

        if remat and remat != "none":
            forward = (jax.checkpoint(forward, policy=policy) if policy is not None
                       else jax.checkpoint(forward))

        def loss_fn(params):
            (out, loss_dict), mutated = forward(params)
            return loss_dict["total"], (loss_dict, mutated)

        (_, (loss_dict, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            spectral=mutated.get("spectral", state.spectral),
        )
        return new_state, loss_dict

    return train_step


def make_eval_step(model) -> Callable:
    @jax.jit
    def eval_step(variables: dict, batch: dict):
        return model.apply(variables, batch, train=False)
    return eval_step
