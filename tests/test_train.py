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
    # cosine tail reaches eta_min at nepoch
    assert math.isclose(lr_for_epoch(203, cfg), 1e-6, rel_tol=1e-6)
    # monotone decreasing after warmup
    lrs = [lr_for_epoch(e, cfg) for e in range(4, 204)]
    assert all(a >= b for a, b in zip(lrs, lrs[1:]))


def test_lr_schedule_steplr():
    cfg = TrainConfig(warmup=False, step_lr_step=50, step_lr_gamma=0.5,
                      lr_initial=1e-4)
    assert math.isclose(lr_for_epoch(1, cfg), 1e-4)
    assert math.isclose(lr_for_epoch(49, cfg), 1e-4)
    assert math.isclose(lr_for_epoch(50, cfg), 5e-5)
    assert math.isclose(lr_for_epoch(100, cfg), 2.5e-5)


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


def test_eval_step_psnr_finite():
    model, params = init_model(TINY_MODEL, jax.random.key(0))
    es = make_eval_step(model)
    batch = _tiny_batch()
    vals = np.asarray(es(params, batch["LR"], batch["HR"]))
    assert vals.shape == (2,)
    # 64px images with boundary_ignore=40 -> NaN is expected & filtered upstream
    # (SKILL gotcha); just check dtype/shape here.


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
