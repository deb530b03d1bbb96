"""Training: the published FBANet recipe on a TPU data-parallel mesh.

Functional parity with the legacy trainer that produced the 31.012 dB
checkpoint (reference: fba_net/train.py.bak):
- loss = Charbonnier + 3*GWLoss on the clamped prediction (:117-119,165-168),
- Adam/AdamW(lr 1e-4, betas 0.9/0.999, eps 1e-8, wd 0.02) (:71-78),
- 3-epoch linear warmup -> cosine to 1e-6, or StepLR(50, 0.5) (:103-115),
- per-epoch validation with boundary-40 PSNR; best/latest/periodic
  checkpoints; resume restores epoch + switches to cosine-only (:87-100,
  173-246),
- seeds 1234 (:56-59), stdout + append-only txt logging (:45-53,222-235).

TPU-native execution replaces the torch machinery:
- `torch.nn.DataParallel` -> params replicated + batch sharded over a
  `Mesh(("data",))`; XLA emits the gradient psum over ICI (SURVEY.md §2.3),
- AMP autocast + NativeScaler -> bf16 activations / f32 params, no loss
  scaling needed,
- DataLoader workers -> `BurstLoader` threaded decode + prefetch straight
  into sharded HBM buffers,
- the whole step (forward+backward+update) is one jitted, buffer-donated
  XLA program.

Per-epoch LR stepping (not per-step) is preserved exactly, including the
reference's quirk of calling `scheduler.step()` once before training, so
epoch e in [1..nepoch] trains at `lr_for_epoch(e)`.
"""

from __future__ import annotations

import argparse
import contextlib
import datetime
import itertools
import math
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fbanet_tpu.config import Config, TrainConfig, add_cli_args, from_cli
from fbanet_tpu.data.loader import BurstLoader
from fbanet_tpu.data.realbsr import RealBSRDataset
from fbanet_tpu.losses import fbanet_training_loss
from fbanet_tpu.metrics import psnr as psnr_metric
from fbanet_tpu.models import init_model
from fbanet_tpu.parallel.mesh import batch_sharding, make_mesh
from fbanet_tpu.utils.checkpoint import CheckpointTriad, load_checkpoint


def lr_for_epoch(epoch: int, cfg: TrainConfig, *, start_epoch: int = 1,
                 resumed: bool = False,
                 resumed_base: float | None = None) -> float:
    """Learning rate for 1-indexed `epoch`, matching the reference schedules
    *as executed* (validated against the reference's own torch schedulers in
    tests/test_reference_golden.py).

    - warmup (the published recipe): lr = base * e / warmup_epochs for
      e <= warmup_epochs (fba_net/warmup_scheduler/scheduler.py:24-39), then
      the GradualWarmupScheduler+CosineAnnealingLR chain with the pre-step
      quirk (fba_net/train.py.bak:103-110). Because the wrapper calls the
      cosine's *recursive* get_lr out of phase, the realized schedule is NOT
      the textbook cosine: telescoping the recursion gives
          lr(e) = emin + (base-emin) * (1 + cos(pi*(e-W-1)/T)) / (1 + cos(pi/T)),
      T = nepoch - warmup_epochs — one epoch ~0.85% *above* base at e=W+1,
      back to base at e=W+2, ending at ~1.85*emin instead of emin.
    - resume: cosine over (nepoch - start_epoch + 1) annealed from the LR the
      checkpoint's optimizer state was saved with (`resumed_base`, extracted
      by `_get_lr`); the first resumed epoch trains at that restored LR
      (train.py.bak:87-100 restores the optimizer and anneals from its lr).
      (In the reference this scheduler is immediately overwritten by the
      warmup/StepLR block — a bug per SURVEY.md §7; we implement the intended
      line-100 behavior.)
    - otherwise StepLR: base * gamma^floor(e / step) — including the
      reference's pre-stepped scheduler, so the decay boundary falls after
      epoch `step` (:111-115).
    """
    base, emin = cfg.lr_initial, cfg.cosine_eta_min
    if resumed:
        if resumed_base is not None:
            base = resumed_base
        t_max = max(1, cfg.nepoch - start_epoch + 1)
        t = epoch - start_epoch  # first resumed epoch trains at the restored LR
        return emin + (base - emin) * (1 + math.cos(math.pi * t / t_max)) / 2
    if cfg.warmup:
        if epoch <= cfg.warmup_epochs:
            return base * epoch / cfg.warmup_epochs
        t = epoch - cfg.warmup_epochs - 1
        t_max = max(1, cfg.nepoch - cfg.warmup_epochs)
        if t_max == 1:  # single post-warmup epoch: 1+cos(pi/T) degenerates
            return base
        return emin + (base - emin) * ((1 + math.cos(math.pi * t / t_max))
                                       / (1 + math.cos(math.pi / t_max)))
    return base * (cfg.step_lr_gamma ** (epoch // cfg.step_lr_step))


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW/Adam with lr injected per step (we drive the schedule by epoch)."""
    opt_cls = optax.adamw if cfg.optimizer.lower() == "adamw" else optax.adam
    kw = dict(b1=0.9, b2=0.999, eps=1e-8)
    if cfg.optimizer.lower() == "adamw":
        kw["weight_decay"] = cfg.weight_decay
    tx = optax.inject_hyperparams(opt_cls)(learning_rate=cfg.lr_initial, **kw)
    if cfg.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx


def _set_lr(opt_state, lr):
    """Functionally set the injected learning_rate hyperparameter.

    Raises if no `inject_hyperparams` state is found: silently returning the
    state unchanged would train at the init LR forever with no schedule.
    """
    def visit(node):
        hp = dict(node.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return node._replace(hyperparams=hp)

    if hasattr(opt_state, "hyperparams"):
        return visit(opt_state)
    # chained (e.g. with grad clipping): find the injected state in the tuple
    if isinstance(opt_state, tuple) and any(
            hasattr(s, "hyperparams") for s in opt_state):
        return tuple(visit(s) if hasattr(s, "hyperparams") else s
                     for s in opt_state)
    raise TypeError(
        "optimizer state has no inject_hyperparams node to set the learning "
        "rate on — build the optimizer with optax.inject_hyperparams "
        "(see make_optimizer)")


def _get_lr(opt_state) -> float | None:
    """Read the injected learning_rate out of an optimizer state (the LR the
    state was last stepped/saved with), or None if there is no
    inject_hyperparams node. Used to anneal the resumed-cosine schedule from
    the checkpointed LR (reference: train.py.bak:87-100)."""
    # NB: the inject state is itself a NamedTuple — check it before iterating
    # (mirrors _set_lr's dispatch)
    if hasattr(opt_state, "hyperparams"):
        return float(opt_state.hyperparams["learning_rate"])
    if isinstance(opt_state, tuple):
        for s in opt_state:
            if hasattr(s, "hyperparams"):
                return float(s.hyperparams["learning_rate"])
    return None


def mixup(hr: jnp.ndarray, lr_burst: jnp.ndarray, lam: jnp.ndarray,
          indices: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mix each sample with a permuted partner, one lambda per sample, the
    same lambda for HR target and LR burst
    (reference: fba_net/utils/dataset_utils.py:221-236, MixUp_AUG.aug)."""
    lam_hr = lam.reshape((-1,) + (1,) * (hr.ndim - 1))
    lam_lr = lam.reshape((-1,) + (1,) * (lr_burst.ndim - 1))
    hr_mix = lam_hr * hr + (1.0 - lam_hr) * hr[indices]
    lr_mix = lam_lr * lr_burst + (1.0 - lam_lr) * lr_burst[indices]
    return hr_mix, lr_mix


def to_unit_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Storage-integer wire batches -> f32 [0,1], on device, in-step.

    The multiply is the exact f32 op the host normalize performs
    (`x.astype(f32) * (1/255)`, matching `RealBSRDataset._storage_to_f32`
    and the native pass's `* (1.0f/255.0f)`), so wire_dtype="storage" is
    bit-identical to the f32 wire — at a quarter of the host->device bytes.
    Float inputs pass through untouched."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    if x.dtype == jnp.uint16:
        return x.astype(jnp.float32) * jnp.float32(1.0 / 16383.0)
    return x


def make_train_step(model, optimizer, cfg: TrainConfig,
                    online_align: str = "none"):
    """Jitted (params, opt_state, batch, rng, lr) -> (params, opt_state, loss)."""

    if online_align != "none":
        # import OUTSIDE the traced function: importing a module during
        # tracing turns its module-level jnp constants into leaked tracers
        from fbanet_tpu.ops.registration import online_register

    def loss_fn(params, lr_burst, hr, rng):
        lr_burst, hr = to_unit_f32(lr_burst), to_unit_f32(hr)
        if cfg.mixup:
            b = lr_burst.shape[0]
            lam = jax.random.beta(jax.random.fold_in(rng, 1),
                                  cfg.mixup_alpha, cfg.mixup_alpha, (b,))
            idx = jax.random.permutation(jax.random.fold_in(rng, 2), b)
            hr, lr_burst = mixup(hr, lr_burst, lam, idx)
        if online_align != "none":
            lr_burst = online_register(lr_burst, online_align)
        pred = model.apply(params, lr_burst, deterministic=False,
                           rngs={"dropout": rng})
        return fbanet_training_loss(pred, hr,
                                    charbonnier_eps=cfg.charbonnier_eps,
                                    gw_weight=cfg.gw_loss_weight)

    ga = max(1, int(getattr(cfg, "grad_accum", 1)))

    @partial(jax.jit, donate_argnums=(0, 1) if cfg.donate_state else ())
    def step(params, opt_state, lr_burst, hr, rng, lr):
        if ga == 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, lr_burst, hr,
                                                      rng)
        else:
            # lr_burst/hr arrive as ga-tuples of microbatches; one scan
            # iteration per microbatch keeps the activation footprint at
            # the microbatch size (the whole point — B=16 activations
            # spill HBM on one v5e, docs/ROUND4.md §4b) while the stacked
            # wire batches (storage integers) stay small in HBM.
            lrb = jnp.stack(lr_burst)
            hrb = jnp.stack(hr)
            rngs = jax.random.split(rng, ga)

            def micro(carry, xs):
                g_acc, l_acc = carry
                lb, h, r = xs
                l, g = jax.value_and_grad(loss_fn)(params, lb, h, r)
                return (jax.tree.map(jnp.add, g_acc, g), l_acc + l), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            (grads, loss), _ = jax.lax.scan(
                micro, (zeros, jnp.float32(0.0)), (lrb, hrb, rngs))
            inv = jnp.float32(1.0 / ga)
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss = loss * inv
        opt_state = _set_lr(opt_state, lr)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_eval_step(model, boundary_ignore: int = 40,
                   online_align: str = "none"):
    """Jitted (params, lr_burst, hr) -> per-image boundary-cropped PSNR [B]
    (the reference evaluates with boundary_ignore=40,
    fba_net/utils/image_utils.py:152)."""

    if online_align != "none":
        from fbanet_tpu.ops.registration import online_register

    @jax.jit
    def step(params, lr_burst, hr):
        lr_burst, hr = to_unit_f32(lr_burst), to_unit_f32(hr)
        if online_align != "none":
            lr_burst = online_register(lr_burst, online_align)
        pred = model.apply(params, lr_burst, deterministic=True)
        pred = jnp.clip(pred, 0.0, 1.0)
        return psnr_metric(pred, hr, boundary_ignore=boundary_ignore)

    return step


def evaluate_psnr(eval_step, params, loader: BurstLoader, epoch: int) -> float:
    """Sum of finite per-image PSNRs / dataset size — the reference's
    averaging (batch_PSNR(average=False) summed, / len_valset;
    fba_net/train.py.bak:191-193 with image_utils.py:143's nan filtering).
    Shares `metrics.finite_average` with evaluate.py so best-checkpoint
    selection and the reported eval metric use one convention."""
    from fbanet_tpu.metrics import finite_average

    # keep per-batch results on device and fetch once at the end: the
    # host then decodes/ships batch N+1 while the device evaluates batch N
    # (a per-batch np.asarray sync serialized eval with the wire).
    # pad_last batches carry batch["valid"]; the padded tail entries are
    # duplicates of the last real image and are sliced off host-side.
    vals_all, count = [], 0
    for batch in loader.epoch(epoch):
        vals = eval_step(params, batch["LR"], batch["HR"])
        valid = batch.get("valid", vals.shape[0])
        vals_all.append((vals, valid))
        count += valid
    vals = (np.concatenate([np.asarray(v)[:n] for v, n in vals_all])
            if vals_all else [])
    return finite_average(vals, count)


def train(cfg: Config) -> dict:
    tcfg = cfg.train
    # use the largest device count that divides the batch (a batch smaller
    # than the chip count falls back to fewer chips rather than erroring)
    n_dev = len(jax.devices())
    while tcfg.batch_size % n_dev != 0:
        n_dev -= 1
    mesh = make_mesh(jax.devices()[:n_dev])

    # --- logging dirs (reference: train.py.bak:44-53) ---
    log_dir = Path(tcfg.save_dir) / "log" / f"{tcfg.arch}{tcfg.env}"
    model_dir = log_dir / "models"
    model_dir.mkdir(parents=True, exist_ok=True)
    logname = log_dir / (datetime.datetime.now().isoformat() + ".txt")

    def log(msg: str) -> None:
        print(msg, flush=True)
        with open(logname, "a") as f:
            f.write(msg + "\n")

    # --- model / optimizer ---
    # rngs are keyed by (seed, epoch, step) via fold_in — no mutable rng
    # state, so a mid-epoch resume reproduces the exact dropout/mixup streams
    base_rng = jax.random.key(tcfg.seed)
    init_rng = jax.random.fold_in(base_rng, 0)
    model, params = init_model(cfg.model, init_rng, batch_size=1)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    log(f"FBANet created, parameters: {n_params}")

    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)

    # --- resume (reference: train.py.bak:87-100; plus mid-epoch positions) ---
    start_epoch, best_psnr, resumed = 1, 0.0, False
    resume_step, resume_loss, resumed_lr = 0, 0.0, None
    triad = CheckpointTriad(model_dir, period=tcfg.checkpoint_every)
    if tcfg.resume:
        src = Path(tcfg.pretrain_weights) if tcfg.pretrain_weights else None
        if src is None or not src.with_suffix(".msgpack").exists():
            latest = triad.latest()
            src = latest
        if src is not None:
            state = load_checkpoint(src, params_template=params,
                                    opt_state_template=opt_state)
            params, opt_state = state["params"], state["opt_state"]
            best_psnr = state.get("best_psnr", 0.0)
            resume_step = int(state.get("step_in_epoch", 0))
            if resume_step > 0:
                # continue the interrupted epoch at the saved step
                start_epoch = state["epoch"]
                resume_loss = float(state.get("epoch_loss", 0.0))
                log(f"==> Resuming from {src} mid-epoch {start_epoch} "
                    f"at step {resume_step}")
            else:
                start_epoch = state["epoch"] + 1
                log(f"==> Resuming from {src} at epoch {start_epoch}")
            # epoch-granular resume switches to the cosine-only schedule,
            # annealed from the LR stored in the checkpointed optimizer state
            # (reference semantics); a mid-epoch continuation is crash
            # recovery and must be transparent — keep the original schedule
            # so the resumed run reproduces the uninterrupted trajectory.
            resumed = resume_step == 0
            if resumed:
                resumed_lr = _get_lr(opt_state)

    # --- data ---
    sharding = batch_sharding(mesh)
    # multi-host: each process reads its own dataset shard (the reference's
    # shard_id/num_shards semantics keyed by process index, SURVEY.md §2.3)
    shard_id, num_shards = cfg.data.shard_id, cfg.data.num_shards
    if jax.process_count() > 1 and num_shards == 1:
        shard_id, num_shards = jax.process_index(), jax.process_count()
    train_ds = RealBSRDataset(
        cfg.data.dataroot, split="train", layout=cfg.data.layout,
        burst_size=cfg.data.burst_size, crop_size=cfg.data.crop_size,
        scale=cfg.data.scale, channels=cfg.data.channels, seed=cfg.data.seed,
        cache_decoded=cfg.data.cache_decoded,
        cache_limit_bytes=int(cfg.data.cache_gb * (1 << 30)),
        wire_dtype=cfg.data.wire_dtype,
        shard_id=shard_id, num_shards=num_shards)
    val_ds = RealBSRDataset(
        cfg.data.dataroot, split="val", layout=cfg.data.layout,
        burst_size=cfg.data.burst_size, crop_size=cfg.data.crop_size,
        scale=cfg.data.scale, channels=cfg.data.channels, seed=cfg.data.seed,
        cache_decoded=cfg.data.cache_decoded,
        cache_limit_bytes=int(cfg.data.cache_gb * (1 << 30)),
        wire_dtype=cfg.data.wire_dtype)
    train_loader = BurstLoader(train_ds, batch_size=tcfg.batch_size,
                               num_workers=cfg.data.num_workers,
                               prefetch_depth=cfg.data.prefetch_depth,
                               sharding=sharding, seed=tcfg.seed)
    # per-epoch eval is data-parallel too (the reference even ran eval under
    # DataParallel, fba_net/test.py:55): batches shard over the same mesh,
    # with the final partial batch padded to the full batch size (pad_last)
    # so the batch axis always divides the device count; evaluate_psnr
    # slices per-image results to batch["valid"].
    val_loader = BurstLoader(val_ds, batch_size=tcfg.batch_size,
                             num_workers=cfg.data.eval_workers,
                             drop_last=False, sharding=sharding,
                             pad_last=True, seed=tcfg.seed)
    log(f"Sizeof training set: {len(train_ds)}, sizeof validation set: "
        f"{len(val_ds)}; {n_dev} device(s)")

    if cfg.data.warm_start and cfg.data.cache_decoded:
        # move the decode-bound cold epoch ahead of step 1 (the compile
        # below hides part of it on wall clock; the device-starved first
        # epoch disappears entirely)
        t0 = time.time()
        n_warm = train_ds.warm_cache() + val_ds.warm_cache()
        log(f"warm_start: pre-decoded {n_warm} bursts into the frame cache "
            f"in {time.time() - t0:.1f}s")

    train_step = make_train_step(model, optimizer, tcfg,
                                 online_align=cfg.data.online_align)
    # guard: boundary crop must leave pixels on the eval images
    bi = cfg.eval.boundary_ignore
    if cfg.data.crop_size and cfg.data.crop_size * cfg.data.scale <= 2 * bi:
        bi = 0
    eval_step = make_eval_step(model, boundary_ignore=bi,
                               online_align=cfg.data.online_align)

    from fbanet_tpu.utils.profiling import StepTimer, trace as profiler_trace

    best_epoch = 0
    history = []
    for epoch in range(start_epoch, tcfg.nepoch + 1):
        t0 = time.time()
        lr = lr_for_epoch(epoch, tcfg, start_epoch=start_epoch,
                          resumed=resumed, resumed_base=resumed_lr)
        start_step = resume_step if epoch == start_epoch else 0
        epoch_loss = resume_loss if epoch == start_epoch else 0.0
        steps = start_step
        epoch_rng = jax.random.fold_in(base_rng, epoch)
        timer = StepTimer(skip_first=1 if epoch == start_epoch else 0)
        profile_ctx = (profiler_trace(tcfg.profile_dir)
                       if tcfg.profile_dir and epoch == start_epoch
                       else contextlib.nullcontext())
        stopped_early = False
        with profile_ctx:
            # `steps` counts optimizer steps; with grad_accum each one
            # consumes grad_accum loader batches, so the loader resumes at
            # the microbatch position
            batches = iter(train_loader.epoch(
                epoch, start_step=start_step * max(1, tcfg.grad_accum)))
            # One-step-deep loss pipeline: step N's loss is fetched AFTER
            # step N+1 is dispatched, so the host<->device round trip (and
            # the producer-staged transfer of batch N+2) overlaps the
            # device's compute on N+1. Exactly one step in flight — the
            # sync on the previous loss still paces the loop, so step
            # timings stay honest and HBM holds at most prefetch_depth+1
            # staged batches. epoch_loss is flushed before every
            # checkpoint, keeping mid-epoch resume bit-exact.
            pending_loss = None
            ga = max(1, tcfg.grad_accum)
            while True:
                with timer.data_wait():  # host starvation vs device time
                    if ga == 1:
                        batch = next(batches, None)
                    else:
                        # one optimizer step consumes ga loader batches; a
                        # trailing partial group (< ga batches) is dropped,
                        # mirroring the loader's drop-remainder batching
                        group = list(itertools.islice(batches, ga))
                        batch = (None if len(group) < ga else
                                 {"LR": tuple(b["LR"] for b in group),
                                  "HR": tuple(b["HR"] for b in group)})
                if batch is None:
                    break
                step_rng = jax.random.fold_in(epoch_rng, steps)
                with timer.step():
                    params, opt_state, loss = train_step(
                        params, opt_state, batch["LR"], batch["HR"],
                        step_rng, lr)
                    if pending_loss is not None:
                        epoch_loss += float(pending_loss)
                pending_loss = loss
                steps += 1
                if tcfg.save_every_steps and steps % tcfg.save_every_steps == 0:
                    epoch_loss += float(pending_loss)
                    pending_loss = None
                    triad.on_step(epoch, steps, epoch_loss, params=params,
                                  opt_state=opt_state, best_psnr=best_psnr)
                if tcfg.stop_after_steps and steps >= tcfg.stop_after_steps:
                    batches.close()  # stop the loader's producer thread
                    stopped_early = True
                    break
            if pending_loss is not None:
                epoch_loss += float(pending_loss)
        if stopped_early:
            triad.on_step(epoch, steps, epoch_loss, params=params,
                          opt_state=opt_state, best_psnr=best_psnr)
            log(f"==> Stopped after {steps} steps of epoch {epoch} "
                f"(interrupt checkpoint written)")
            history.append({"epoch": epoch, "loss": epoch_loss, "psnr": None,
                            "lr": lr, "steps": steps, "interrupted": True})
            return {"params": params, "best_psnr": best_psnr,
                    "best_epoch": best_epoch, "history": history,
                    "model_dir": str(model_dir)}

        # per-epoch eval (reference cadence: eval_now == len(train_loader))
        psnr_val = evaluate_psnr(eval_step, params, val_loader, epoch)
        if psnr_val > best_psnr:
            best_psnr, best_epoch = psnr_val, epoch
            triad.on_best(params=params, opt_state=opt_state, epoch=epoch,
                          best_psnr=best_psnr)
        log(f"[Ep {epoch} PSNR: {psnr_val:.4f}] ---- "
            f"[best_Ep {best_epoch} Best_PSNR {best_psnr:.4f}]")
        log(f"Epoch: {epoch}\tTime: {time.time() - t0:.4f}\t"
            f"Loss: {epoch_loss:.4f}\tLearningRate {lr:.6f}\t"
            + timer.report())
        triad.on_epoch_end(epoch, params=params, opt_state=opt_state,
                           best_psnr=best_psnr)
        history.append({"epoch": epoch, "loss": epoch_loss, "psnr": psnr_val,
                        "lr": lr, "steps": steps})

    return {"params": params, "best_psnr": best_psnr,
            "best_epoch": best_epoch, "history": history,
            "model_dir": str(model_dir)}


def main(argv: list[str] | None = None) -> None:
    parser = add_cli_args(argparse.ArgumentParser(description="FBANet TPU training"))
    cfg = from_cli(parser.parse_args(argv))
    train(cfg)


if __name__ == "__main__":
    main()
