"""Training-loop tests: LR schedule parity, optimizer plumbing, smoke train,
checkpoint triad + resume."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbanet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from fbanet_tpu.data.synthetic import write_synthetic_realbsr
from fbanet_tpu.models import init_model
from fbanet_tpu.train import (
    evaluate_psnr,
    lr_for_epoch,
    make_eval_step,
    make_optimizer,
    make_train_step,
    train,
)
from fbanet_tpu.utils.checkpoint import (
    CheckpointTriad,
    load_checkpoint,
    load_params,
    save_checkpoint,
)

TINY_MODEL = ModelConfig(num_frames=3, img_size=16, embed_dim=8, window_size=4,
                         heads=(1, 2, 4, 8, 4, 4, 2, 2, 2), dtype="float32",
                         drop_path_rate=0.0)


def test_lr_schedule_warmup_cosine():
    cfg = TrainConfig(warmup=True, warmup_epochs=3, nepoch=203, lr_initial=1e-4)
    # warmup: e/3 * base
    assert math.isclose(lr_for_epoch(1, cfg), 1e-4 / 3)
    assert math.isclose(lr_for_epoch(2, cfg), 2e-4 / 3)
    assert math.isclose(lr_for_epoch(3, cfg), 1e-4)
    # the realized reference schedule (see lr_for_epoch docstring): one epoch
    # slightly above base right after warmup, back to base the next epoch
    assert 1e-4 < lr_for_epoch(4, cfg) < 1.01e-4
    assert math.isclose(lr_for_epoch(5, cfg), 1e-4)
    # tail ends near (about 1.85x) eta_min, not exactly at it
    assert 1e-6 < lr_for_epoch(203, cfg) < 2.2e-6
    # monotone decreasing after the post-warmup bump
    lrs = [lr_for_epoch(e, cfg) for e in range(4, 204)]
    assert all(a >= b for a, b in zip(lrs, lrs[1:]))
    # exact torch parity is asserted in tests/test_reference_golden.py


def test_lr_schedule_steplr():
    cfg = TrainConfig(warmup=False, step_lr_step=50, step_lr_gamma=0.5,
                      lr_initial=1e-4)
    assert math.isclose(lr_for_epoch(1, cfg), 1e-4)
    assert math.isclose(lr_for_epoch(49, cfg), 1e-4)
    assert math.isclose(lr_for_epoch(50, cfg), 5e-5)
    assert math.isclose(lr_for_epoch(100, cfg), 2.5e-5)


def test_lr_schedule_resume_from_restored_lr():
    """Epoch-granular resume anneals the cosine from the LR saved in the
    checkpoint's optimizer state (reference: train.py.bak:87-100 restores the
    optimizer and anneals from its lr), not from lr_initial."""
    import jax.numpy as jnp

    from fbanet_tpu.train import _get_lr, _set_lr

    cfg = TrainConfig(warmup=True, nepoch=100, lr_initial=1e-4)
    tx = make_optimizer(cfg)
    state = tx.init({"w": jnp.zeros((3,))})
    assert math.isclose(_get_lr(state), 1e-4, rel_tol=1e-6)  # f32 storage
    state = _set_lr(state, 2.5e-5)
    assert math.isclose(_get_lr(state), 2.5e-5, rel_tol=1e-6)
    # first resumed epoch trains at the restored LR
    lr0 = lr_for_epoch(51, cfg, start_epoch=51, resumed=True,
                       resumed_base=2.5e-5)
    assert math.isclose(lr0, 2.5e-5)
    # ... and anneals to eta_min by the final epoch
    lr_end = lr_for_epoch(100, cfg, start_epoch=51, resumed=True,
                          resumed_base=2.5e-5)
    assert cfg.cosine_eta_min * 0.99 < lr_end < 2.5e-5


def test_lr_schedule_resume_cosine_only():
    cfg = TrainConfig(warmup=True, nepoch=100, lr_initial=1e-4)
    lr = lr_for_epoch(60, cfg, start_epoch=51, resumed=True)
    assert 1e-6 < lr < 1e-4


def test_optimizer_lr_injection():
    tx = make_optimizer(TrainConfig(optimizer="adamw"))
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    from fbanet_tpu.train import _set_lr

    state2 = _set_lr(state, 5e-5)
    grads = {"w": jnp.ones((3,))}
    updates, _ = tx.update(grads, state2, params)
    # first adam step: update ~= -lr * sign-ish; magnitude must scale with lr
    state3 = _set_lr(state, 5e-6)
    updates2, _ = tx.update(grads, state3, params)
    ratio = float(updates["w"][0] / updates2["w"][0])
    assert 9 < ratio < 11


def _tiny_batch(b=2):
    rng = np.random.default_rng(0)
    return {
        "LR": jnp.asarray(rng.uniform(size=(b, 3, 16, 16, 3)).astype(np.float32)),
        "HR": jnp.asarray(rng.uniform(size=(b, 64, 64, 3)).astype(np.float32)),
    }


def test_train_step_reduces_loss():
    model, params = init_model(TINY_MODEL, jax.random.key(0))
    cfg = TrainConfig(lr_initial=1e-3, donate_state=False)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    batch = _tiny_batch()
    rng = jax.random.key(1)
    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, batch["LR"],
                                       batch["HR"], rng, 1e-3)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_eval_step_psnr_matches_manual():
    """Eval-step PSNR equals a hand-computed PSNR of the clipped prediction
    (boundary_ignore=0 so the 64px images keep all pixels)."""
    model, params = init_model(TINY_MODEL, jax.random.key(0))
    es = make_eval_step(model, boundary_ignore=0)
    batch = _tiny_batch()
    vals = np.asarray(es(params, batch["LR"], batch["HR"]))
    assert vals.shape == (2,)
    pred = np.clip(np.asarray(
        model.apply(params, batch["LR"], deterministic=True)), 0.0, 1.0)
    hr = np.asarray(batch["HR"])
    for i in range(2):
        mse = np.mean((pred[i] - hr[i]) ** 2)
        expect = 20 * np.log10(1.0 / np.sqrt(mse))
        np.testing.assert_allclose(vals[i], expect, rtol=1e-5)

    # 64px images with the reference's boundary_ignore=40 crop everything ->
    # NaN, which evaluate_psnr filters (reference: image_utils.py:143)
    vals40 = np.asarray(make_eval_step(model, boundary_ignore=40)(
        params, batch["LR"], batch["HR"]))
    assert vals40.shape == (2,)


def test_set_lr_raises_without_injected_state():
    import optax

    from fbanet_tpu.train import _set_lr

    tx = optax.adam(1e-4)  # no inject_hyperparams
    state = tx.init({"w": jnp.ones((3,))})
    with pytest.raises(TypeError, match="inject_hyperparams"):
        _set_lr(state, 1e-5)


def test_mixup_formula():
    """MixUp mixes HR and LR with the same per-sample lambda against the same
    permuted partner (reference: fba_net/utils/dataset_utils.py:221-236)."""
    from fbanet_tpu.train import mixup

    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.uniform(size=(4, 8, 8, 3)).astype(np.float32))
    lr = jnp.asarray(rng.uniform(size=(4, 3, 2, 2, 3)).astype(np.float32))
    lam = jnp.asarray([0.25, 0.5, 0.75, 1.0], jnp.float32)
    idx = jnp.asarray([1, 0, 3, 2])
    hr_m, lr_m = mixup(hr, lr, lam, idx)
    np.testing.assert_allclose(
        np.asarray(hr_m[0]), 0.25 * np.asarray(hr[0]) + 0.75 * np.asarray(hr[1]),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lr_m[2]), 0.75 * np.asarray(lr[2]) + 0.25 * np.asarray(lr[3]),
        rtol=1e-6)
    # lam=1 -> unchanged
    np.testing.assert_array_equal(np.asarray(hr_m[3]), np.asarray(hr[3]))


def test_train_step_with_mixup_runs():
    model, params = init_model(TINY_MODEL, jax.random.key(0))
    cfg = TrainConfig(lr_initial=1e-3, donate_state=False, mixup=True)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    batch = _tiny_batch()
    params, opt_state, loss = step(params, opt_state, batch["LR"],
                                   batch["HR"], jax.random.key(1), 1e-3)
    assert np.isfinite(float(loss))


def test_checkpoint_roundtrip(tmp_path):
    model, params = init_model(TINY_MODEL, jax.random.key(0))
    tx = make_optimizer(TrainConfig())
    opt_state = tx.init(params)
    save_checkpoint(tmp_path / "ck", params=params, opt_state=opt_state,
                    epoch=7, best_psnr=30.5)
    zero_p = jax.tree.map(jnp.zeros_like, params)
    zero_o = jax.tree.map(jnp.zeros_like, opt_state)
    state = load_checkpoint(tmp_path / "ck", params_template=zero_p,
                            opt_state_template=zero_o)
    assert state["epoch"] == 7 and state["best_psnr"] == 30.5
    ref_leaves = jax.tree.leaves(params)
    got_leaves = jax.tree.leaves(state["params"])
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params-only loader works on full checkpoints
    p2 = load_params(tmp_path / "ck", zero_p)
    for a, b in zip(ref_leaves, jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_triad_policy(tmp_path):
    triad = CheckpointTriad(tmp_path, period=2)
    dummy = {"x": jnp.ones((2,))}
    triad.on_best(params=dummy, opt_state=dummy, epoch=1, best_psnr=1.0)
    triad.on_epoch_end(1, params=dummy, opt_state=dummy)
    triad.on_epoch_end(2, params=dummy, opt_state=dummy)
    names = {p.name for p in tmp_path.iterdir()}
    assert "model_best.msgpack" in names
    assert "model_latest.msgpack" in names
    assert "model_epoch_2.msgpack" in names
    assert "model_epoch_1.msgpack" not in names


@pytest.fixture(scope="module")
def tiny_dataroot(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_ds")
    write_synthetic_realbsr(root, num_bursts=4, num_frames=3, lr_size=16,
                            layout="aligned")
    return root


def test_train_end_to_end_smoke(tiny_dataroot, tmp_path):
    """2-epoch full train() on synthetic data: loss finite, checkpoints laid
    out, eval PSNR recorded, resume picks up at the right epoch."""
    cfg = Config(
        model=TINY_MODEL,
        data=DataConfig(dataroot=str(tiny_dataroot), burst_size=3, crop_size=16,
                        num_workers=2, eval_workers=2),
        train=TrainConfig(batch_size=2, nepoch=2, warmup=True, warmup_epochs=1,
                          lr_initial=1e-3, checkpoint_every=1,
                          save_dir=str(tmp_path), env="_smoke", seed=1234,
                          donate_state=False),
    )
    out = train(cfg)
    assert len(out["history"]) == 2
    assert all(np.isfinite(h["loss"]) for h in out["history"])
    assert all(h["steps"] == 2 for h in out["history"])  # 4 bursts / batch 2
    model_dir = tmp_path / "log" / "BaseModel_smoke" / "models"
    assert (model_dir / "model_latest.msgpack").exists()
    assert (model_dir / "model_best.msgpack").exists()

    # resume for one more epoch
    cfg2 = cfg.replace(train=cfg.train.replace(nepoch=3, resume=True))
    out2 = train(cfg2)
    assert out2["history"][0]["epoch"] == 3


def test_midepoch_checkpoint_resume_reproduces_trajectory(tiny_dataroot,
                                                          tmp_path):
    """Kill-and-resume: stop after 1 of 2 steps, resume mid-epoch, and the
    final state equals the uninterrupted run bit for bit (same sample order,
    same rng streams, same LR)."""
    def cfg_for(save_dir, **train_kw):
        return Config(
            model=TINY_MODEL,
            data=DataConfig(dataroot=str(tiny_dataroot), burst_size=3,
                            crop_size=16, num_workers=2, eval_workers=2),
            train=TrainConfig(batch_size=2, nepoch=2, warmup=True,
                              warmup_epochs=1, lr_initial=1e-3,
                              checkpoint_every=100, save_dir=str(save_dir),
                              env="_mid", seed=1234, donate_state=False,
                              **train_kw),
        )

    # uninterrupted reference run
    out_full = train(cfg_for(tmp_path / "full"))
    # interrupted run: stop 1 step into epoch 1, then resume to completion
    out_a = train(cfg_for(tmp_path / "kill", stop_after_steps=1))
    assert out_a["history"][0]["interrupted"]
    assert out_a["history"][0]["steps"] == 1
    out_b = train(cfg_for(tmp_path / "kill", resume=True))

    # same epochs trained, same per-epoch losses, identical final params
    full_hist = {h["epoch"]: h for h in out_full["history"]}
    resumed_hist = {h["epoch"]: h for h in out_b["history"]}
    assert set(resumed_hist) == set(full_hist) == {1, 2}
    for e in (1, 2):
        assert resumed_hist[e]["steps"] == full_hist[e]["steps"] == 2
        np.testing.assert_allclose(resumed_hist[e]["loss"],
                                   full_hist[e]["loss"], rtol=1e-6)
        np.testing.assert_allclose(resumed_hist[e]["lr"], full_hist[e]["lr"])
    for a, b in zip(jax.tree.leaves(out_full["params"]),
                    jax.tree.leaves(out_b["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _tiny_batch_pair():
    rng = np.random.default_rng(7)
    mk = lambda: {  # noqa: E731
        "LR": jnp.asarray(rng.uniform(size=(2, 3, 16, 16, 3)).astype(np.float32)),
        "HR": jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)),
    }
    return mk(), mk()


def test_grad_accum_matches_manual_average():
    """A grad_accum=2 step equals manually averaged per-microbatch grads
    followed by one optimizer update (TINY_MODEL has drop_path 0, mixup off,
    so the loss is rng-independent)."""
    from fbanet_tpu.losses import fbanet_training_loss
    from fbanet_tpu.train import _set_lr

    model, params = init_model(TINY_MODEL, jax.random.key(0))
    cfg = TrainConfig(grad_accum=2, donate_state=False)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    b1, b2 = _tiny_batch_pair()
    rng = jax.random.key(3)
    p_ga, _o, loss_ga = step(params, opt_state, (b1["LR"], b2["LR"]),
                             (b1["HR"], b2["HR"]), rng, 1e-3)

    def loss_fn(p, lr_burst, hr):
        pred = model.apply(p, lr_burst, deterministic=False,
                           rngs={"dropout": rng})
        return fbanet_training_loss(pred, hr,
                                    charbonnier_eps=cfg.charbonnier_eps,
                                    gw_weight=cfg.gw_loss_weight)

    l1, g1 = jax.value_and_grad(loss_fn)(params, b1["LR"], b1["HR"])
    l2, g2 = jax.value_and_grad(loss_fn)(params, b2["LR"], b2["HR"])
    grads = jax.tree.map(lambda a, b: (a + b) * 0.5, g1, g2)
    ost = _set_lr(tx.init(params), 1e-3)
    updates, _ = tx.update(grads, ost, params)
    import optax
    p_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_ga), float((l1 + l2) * 0.5),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_ga), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_grad_accum_matches_concat_batch():
    """Estimator identity: two microbatches of 2 == one batch of 4 (equal
    microbatch sizes make mean-of-means the large-batch mean)."""
    model, params = init_model(TINY_MODEL, jax.random.key(0))
    b1, b2 = _tiny_batch_pair()
    rng = jax.random.key(5)

    cfg_ga = TrainConfig(grad_accum=2, donate_state=False)
    tx = make_optimizer(cfg_ga)
    p_ga, _o, loss_ga = make_train_step(model, tx, cfg_ga)(
        params, tx.init(params), (b1["LR"], b2["LR"]), (b1["HR"], b2["HR"]),
        rng, 1e-3)

    cfg_1 = TrainConfig(grad_accum=1, donate_state=False)
    tx1 = make_optimizer(cfg_1)
    lr_cat = jnp.concatenate([b1["LR"], b2["LR"]])
    hr_cat = jnp.concatenate([b1["HR"], b2["HR"]])
    p_cat, _o, loss_cat = make_train_step(model, tx1, cfg_1)(
        params, tx1.init(params), lr_cat, hr_cat, rng, 1e-3)

    np.testing.assert_allclose(float(loss_ga), float(loss_cat), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_ga), jax.tree.leaves(p_cat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_grad_accum_end_to_end(tiny_dataroot, tmp_path):
    """train() with grad_accum=2: 4 bursts / batch 2 -> 1 optimizer step per
    epoch; loss finite; mid-epoch resume machinery keeps working."""
    cfg = Config(
        model=TINY_MODEL,
        data=DataConfig(dataroot=str(tiny_dataroot), burst_size=3,
                        crop_size=16, num_workers=2, eval_workers=2),
        train=TrainConfig(batch_size=2, nepoch=2, grad_accum=2,
                          lr_initial=1e-3, checkpoint_every=1,
                          save_dir=str(tmp_path), env="_ga", seed=1234,
                          donate_state=False),
    )
    out = train(cfg)
    assert len(out["history"]) == 2
    assert all(np.isfinite(h["loss"]) for h in out["history"])
    assert all(h["steps"] == 1 for h in out["history"])  # 2 batches / ga 2
