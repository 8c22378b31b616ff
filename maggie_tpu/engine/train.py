"""Training engine (reference ``maggie/engine/train.py:115-348``).

Iteration-based loop with the reference's cadence (log/vis/val iters, best/last
checkpointing, shape-tolerant pretrained load, resume). TPU-native differences:

- the step body is one jitted function (``engine/train_step.py``) over a ``data``
  mesh axis — DDP/SyncBN/GradScaler all disappear into XLA collectives and bf16;
- Python-level randomness (the 75% PRM draw, warmup-gate randomness) is drawn
  host-side per step and dispatched as STATIC flags, so the few variants compile
  once each;
- checkpoints are orbax + npz (``best_model``/``last_model``/``last_opt`` roles kept).
"""

from __future__ import annotations

import json
import logging
import os
import time

import numpy as np

from ..data import build_dataset
from ..data.loader import DataLoader
from ..utils.meters import AverageMeter
from ..utils.metrics import build_metric
from .optim import build_optimizer
from .train_step import TrainState, create_train_state, make_train_step

logger = logging.getLogger(__name__)


def _wandb():
    try:
        import wandb
        return wandb
    except ImportError:
        return None


def _host_batch_to_device(batch: dict, mesh=None):
    import jax
    import jax.numpy as jnp
    keep = {"image", "mask", "alpha", "transition"}
    b = {k: jnp.asarray(v) for k, v in batch.items() if k in keep}
    if mesh is not None:
        from ..parallel import shard_batch
        b = shard_batch(b, mesh)
    return b


def train(cfg, use_wandb: bool | None = None, is_sweep: bool = False):
    import jax

    from ..models import build_model
    from ..parallel import create_mesh, replicate
    from ..utils.checkpoint import (partial_load, restore_checkpoint, save_checkpoint,
                                    save_variables_npz)

    wandb = _wandb() if (use_wandb if use_wandb is not None else cfg.wandb.use) else None
    if wandb is not None and jax.process_index() == 0:
        # reference tools/main.py:45-53: sweep jobs skip init (the wandb agent
        # already did it); cfg.wandb.id resumes an existing run
        try:
            if not is_sweep:
                if cfg.wandb.id:
                    wandb.init(project=cfg.wandb.project, entity=cfg.wandb.entity,
                               name=cfg.name, id=cfg.wandb.id, resume="must")
                else:
                    wandb.init(project=cfg.wandb.project, entity=cfg.wandb.entity,
                               name=cfg.name)
            wandb.config.update(cfg.to_dict(), allow_val_change=True)
        except Exception as exc:  # offline box / no API key: degrade to logs only
            logger.warning(f"wandb unavailable ({exc}); continuing without it")
            wandb = None
    elif wandb is not None:
        wandb = None  # non-zero process: rank-0-only logging, reference parity
    seed = cfg.train.seed if cfg.train.seed >= 0 else 2023

    logger.info("Creating train dataset...")
    train_dataset = build_dataset(cfg, is_train=True, random_seed=seed)
    nproc, pid = jax.process_count(), jax.process_index()
    train_loader = DataLoader(train_dataset, batch_size=cfg.train.batch_size,
                              shuffle=True, drop_last=True, seed=seed,
                              num_shards=nproc, shard_index=pid, infinite=True)

    logger.info("Creating val dataset...")
    val_dataset = build_dataset(cfg, is_train=False)
    val_loader = DataLoader(val_dataset, batch_size=cfg.test.batch_size, shuffle=False,
                            num_shards=nproc if cfg.train.val_dist else 1,
                            shard_index=pid if cfg.train.val_dist else 0)

    logger.info("Building model...")
    model = build_model(cfg.model)
    tx, schedule = build_optimizer(cfg)

    # data-axis size must divide the per-process batch; use the largest divisor
    n_dev = len(jax.devices())
    mesh_size = 1
    for d in range(min(n_dev, cfg.train.batch_size), 0, -1):
        if cfg.train.batch_size % d == 0:
            mesh_size = d
            break
    if mesh_size < n_dev:
        logger.warning(f"Using {mesh_size}/{n_dev} devices (batch {cfg.train.batch_size} "
                       f"not divisible by device count)")
    mesh = create_mesh(mesh_size) if mesh_size > 1 else None

    # init from the first batch's shapes
    first = next(iter(DataLoader(train_dataset, batch_size=1, seed=seed)))
    init_batch = _host_batch_to_device(first)
    rng = jax.random.PRNGKey(seed)
    state = create_train_state(model, tx, init_batch, rng)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(state.params))
    logger.info(f"Number of trainable parameters: {n_params}")

    # pretrained weights (shape-tolerant partial load, reference train.py:171-180)
    if cfg.model.weights and os.path.isfile(cfg.model.weights) and cfg.model.weights.endswith(".npz"):
        from flax.traverse_util import flatten_dict
        data = np.load(cfg.model.weights)
        loaded = {tuple(k.split("/")): v for k, v in data.items()}
        params_flat = {k[1:]: v for k, v in loaded.items() if k[0] == "params"}
        state = state.replace(params=partial_load(state.params, params_flat))
        logger.info(f"Loaded pretrained weights from {cfg.model.weights}")

    it = 0
    best_score = 99999999999.0
    resumed = False

    # resume (reference train.py:182-190)
    if cfg.train.resume != "" or cfg.train.resume_last:
        model_path = cfg.train.resume if cfg.train.resume != "" else cfg.output_dir
        last = os.path.join(model_path, "last_state")
        if os.path.isdir(last):
            state = restore_checkpoint(last, state)
            it = int(state.step)
            resumed = True
            if os.path.exists(os.path.join(model_path, "best_score.txt")):
                best_score = float(open(os.path.join(model_path, "best_score.txt")).read().strip())
            logger.info(f"Resuming from iter {it}, best score {best_score}")
        else:
            raise ValueError(f"Cannot resume model from {model_path}")

    if mesh is not None:
        state = replicate(state, mesh)

    # pass the raw value: "selective"/"none" are modes, not truthiness
    train_step = make_train_step(model, tx, remat=cfg.model.get("remat", False))
    batch_time = AverageMeter("batch_time")
    data_time = AverageMeter("data_time")
    log_metrics: dict[str, AverageMeter] = {}

    val_error_dict = build_metric(cfg.train.val_metrics)
    assert val_error_dict, "No validation metrics found!"
    assert cfg.train.val_best_metric in val_error_dict, "Best validation metric not found!"

    dargs = cfg.model.decoder_args
    warmup_atten = int(dargs.get("warmup_mask_atten_iter", 4000))
    warmup_detail = int(dargs.get("warmup_detail_iter", 3000))
    host_rng = np.random.RandomState(seed + 77)
    step_rng = jax.random.PRNGKey(seed + 1)

    from .test import eval_image, eval_video
    eval_fn = eval_video if cfg.dataset.test.name == "VIM" else eval_image

    def save_last():
        save_checkpoint(os.path.join(cfg.output_dir, "last_state"),
                        jax.device_get(state))
        with open(os.path.join(cfg.output_dir, "best_score.txt"), "w") as f:
            f.write(str(best_score))
        # progress sidecar read by tools/train_supervisor.py (crash-loop detection)
        with open(os.path.join(cfg.output_dir, "last_step.txt"), "w") as f:
            f.write(str(it))

    # periodic checkpoint cadence independent of validation (elastic recovery;
    # the reference only saves at val_iter) + fault injection for testing it
    ckpt_iter = int(cfg.train.get("ckpt_iter", 0))
    fault_iter = int(os.environ.get("MAGGIE_FAULT_INJECT_ITER", "0"))

    logger.info("Start training...")
    end_time = time.time()
    from .infeed import DeviceInfeed
    infeed = DeviceInfeed(iter(train_loader), mesh=mesh)
    os.makedirs(cfg.output_dir, exist_ok=True)

    # release the infeed producer thread + prefetched HBM buffers even when
    # the loop aborts (fault injection / preemption -- tools/train_supervisor.py
    # restarts train() in the same process in tests)
    try:
        while it < cfg.train.max_iter:
            # packed single-transfer infeed, prefetched on a background thread so
            # the H2D rides under the previous step's compute (engine/infeed.py)
            batch, dbatch = next(infeed)
            data_time.update(time.time() - end_time)
            it += 1
            if fault_iter and it == fault_iter and not resumed:
                # fires only in a fresh run so a supervisor restart makes progress
                raise RuntimeError(f"fault injection at iter {it} (MAGGIE_FAULT_INJECT_ITER)")
            use_mask_atten = it < warmup_atten
            use_gt_guidance = bool(it < warmup_detail or
                                   (it < warmup_detail * 3 and host_rng.rand() < 0.5))
            use_prm_weights = bool(host_rng.rand() < 0.75)
            atten_loss_enabled = it >= warmup_atten

            state, loss_dict = train_step(
                state, dbatch, step_rng,
                use_mask_atten=use_mask_atten,
                use_gt_guidance=use_gt_guidance,
                use_prm_weights=use_prm_weights,
                atten_loss_enabled=atten_loss_enabled)

            if it % cfg.train.log_iter == 0:
                # materialize loss scalars only on log steps (keeps the device pipeline full)
                host_losses = {k: float(v) for k, v in loss_dict.items()}
                if not np.isfinite(host_losses["total"]):
                    logger.error(f"Iter {it}: non-finite loss {host_losses['total']}")
                for k, v in host_losses.items():
                    log_metrics.setdefault(k, AverageMeter(k)).update(v)
                lr = float(schedule(it))
                s = f"Iter: {it}/{cfg.train.max_iter}"
                s += "".join(f", {k}: {v.avg:.4f}" for k, v in log_metrics.items())
                s += f", lr: {lr:.6f}, batch_time: {batch_time.avg:.4f}s, data_time: {data_time.avg:.4f}s"
                from ..utils.memory import device_peak_memory_mb
                peak_mb = device_peak_memory_mb()
                if peak_mb is not None:  # reference parity: peak device MB per run
                    s += f", max_mem: {peak_mb:.0f}MB"
                logger.info(s)
                if wandb is not None and pid == 0:
                    wandb.log({f"train/{k}": v.val for k, v in log_metrics.items()} |
                              {"train/lr": lr, "train/iter": it})

            batch_time.update(time.time() - end_time)
            if batch_time.count == 1:
                # exclude the first iteration (train-step compile / cache load)
                # from the sustained averages; the logged avgs and the
                # train_meters.json sidecar then measure steady-state only
                batch_time.reset()
                data_time.reset()

            if wandb is not None and it % cfg.train.vis_iter == 0 and pid == 0:
                # vis only under wandb (reference gates the panel the same way,
                # train.py:286-291) — it costs an eval-graph compile + an extra
                # eval forward per vis_iter
                # visualization panel (reference wandb_log_image, train.py:286-291):
                # an extra eval-mode forward of the current params on this batch
                try:
                    from .vis import save_train_visualization
                    eval_batch = {k: v for k, v in dbatch.items() if k != "transition"}
                    out = model.apply(state.variables(), eval_batch, train=False)
                    path = save_train_visualization(dbatch, out, it, cfg.output_dir)
                    if wandb is not None:
                        wandb.log({"train/vis": wandb.Image(path)}, commit=False)
                except Exception as exc:  # vis must never kill training (ref wraps in try)
                    logger.warning(f"visualization failed at iter {it}: {exc}")

            if it % cfg.train.val_iter == 0:
                logger.info("Start validation...")
                for v in val_error_dict.values():
                    v.reset()
                eval_fn(model, state.variables(), val_loader, cfg.test.log_iter,
                        val_error_dict, do_postprocessing=False, callback=None)
                if cfg.train.val_dist:
                    for v in val_error_dict.values():
                        v.gather_metric()
                if pid == 0:
                    logger.info("Validation:" + ", ".join(
                        f"{k}: {v.average():.4f}" for k, v in val_error_dict.items()))
                    total_error = val_error_dict[cfg.train.val_best_metric].average()
                    if total_error < best_score:
                        logger.info(f"Best score changed from {best_score:.4f} to {total_error:.4f}")
                        best_score = total_error
                        save_variables_npz(os.path.join(cfg.output_dir, "best_model.npz"),
                                           jax.device_get(state.variables()))
                        with open(os.path.join(cfg.output_dir, "best_metrics.txt"), "w") as f:
                            f.write(f"iter: {it}\n")
                            for k, v in val_error_dict.items():
                                f.write(f"{k}: {v.average():.4f}\n")
                    if wandb is not None:
                        wandb.log({f"val/{k}": v.average() for k, v in val_error_dict.items()} |
                                  {"val/best_error": best_score, "val/iter": it})
                    logger.info("Saving the last model...")
                    save_last()
            elif ckpt_iter and it % ckpt_iter == 0 and pid == 0:
                save_last()
            end_time = time.time()
    finally:
        infeed.close()

    # sustained-throughput sidecar (first iteration excluded above): the
    # reference prints batch_time/data_time averages in its logs
    # (maggie/engine/train.py:192-218); persisting them makes the sustained
    # train number a recorded artifact instead of a log-scrape
    if pid == 0 and batch_time.count > 0:
        from ..utils.memory import device_peak_memory_mb
        meters = {
            "iters_measured": batch_time.count,
            "batch_size": cfg.train.batch_size,
            "batch_time_avg_s": round(batch_time.avg, 4),
            "data_time_avg_s": round(data_time.avg, 4),
            "samples_per_sec_sustained": round(cfg.train.batch_size / batch_time.avg, 4),
            "infeed_stall_frac": round(data_time.avg / batch_time.avg, 4),
            "peak_mem_mb": device_peak_memory_mb(),
        }
        try:
            with open(os.path.join(cfg.output_dir, "train_meters.json"), "w") as f:
                json.dump(meters, f, indent=1)
        except OSError as exc:
            logger.warning(f"could not write train_meters.json: {exc}")

    return state
