"""Typed configuration tree with CLI parity.

The reference has three coexisting config systems: a central argparse builder
(reference: fba_net/options.py:9-56), per-script argparse (fba_net/test.py:14-44)
and frozen dataclasses on the JAX pipeline (fba_net/pipeline/real_bsr_iterator.py:17-45).
Here everything is one dataclass tree; `add_cli_args`/`from_cli` reproduce the
reference flag names so published commands keep working
(e.g. `--arch BaseModel --batch_size 16 --train_ps 160 --embed_dim 64 --warmup`,
reference: README.md:98, running_command.txt).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Literal


@dataclass(frozen=True)
class ModelConfig:
    """FBANet model hyperparameters (reference: fba_net/models/fba_net.py:30-47)."""

    num_frames: int = 14
    img_size: int = 160
    in_channels: int = 3
    embed_dim: int = 32
    depths: tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2, 2)
    heads: tuple[int, ...] = (1, 2, 4, 8, 16, 16, 8, 4, 2)
    window_size: int = 8
    mlp_ratio: float = 4.0
    use_qkv_bias: bool = True
    qk_scale: float | None = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    token_projection: Literal["linear", "conv"] = "linear"
    token_mlp: Literal["ffn", "leff"] = "leff"
    use_se_layer: bool = False
    # TPU-native knobs (no reference equivalent):
    dtype: str = "bfloat16"  # compute dtype inside the network
    param_dtype: str = "float32"  # parameter/optimizer dtype
    # window attention implementation: "pallas" = fused kernel
    # (ops/attention_pallas.py), "xla" = composed flax ops, "auto" = pallas
    # on TPU / xla elsewhere. The parameter tree is identical either way.
    attention_impl: Literal["auto", "xla", "pallas"] = "auto"
    remat: bool = False  # rematerialize attention layers in the backward pass
    # (jax.checkpoint per SwinLayer). Default OFF since r3: the fused Pallas
    # kernels' custom_vjp saves only layer INPUTS (~26 MB/layer at B=8
    # 160px), so the remat that once rescued >3-sample/chip training (the
    # XLA path materializes [G,N,N] attention probs) now buys little memory
    # and costs a full re-forward in the backward — measured 326 -> 306 ms
    # per B=8 train step by turning it off. Re-enable for very large
    # batch/resolution on small-HBM parts.

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class DataConfig:
    """RealBSR data pipeline (reference: fba_net/pipeline/real_bsr_dataset.py,
    fba_net/ManualDataset.py.bak)."""

    dataroot: str = ""
    burst_size: int = 14
    crop_size: int = 160  # LR patch size (--train_ps)
    scale: int = 4
    # 3 = RealBSR-RGB (8-bit PNG /255); 4 = RealBSR-RAW packed-Bayer RGGB
    # (16-bit 4-channel PNG /16383 — the storage format of the reference's
    # RAW visualization path, fba_net/utils/post_processing_vis.py:104-119;
    # BASELINE.json configs[3])
    channels: int = 3
    # decoded-frame RAM cache (see RealBSRDataset.cache_decoded): decode each
    # burst once, then assemble samples via the native crop/augment/normalize
    # pass. On a host with few cores the steady-state loader is otherwise
    # decode-bound and starves the chip.
    cache_decoded: bool = True
    cache_gb: float = 8.0
    # pre-fill the decoded-frame cache before step 1: moves the decode-bound
    # cold epoch ahead of training so epoch 1 is not device-starved on
    # few-core hosts (RealBSRDataset.warm_cache). Default ON whenever the
    # decoded-frame cache is on (the shipped configuration must never train
    # against a ~8 bursts/s cold loader, docs/ROUND4.md §1); --no_warm_start
    # opts out, and train() skips the warm pass when cache_decoded is off
    # (nothing to fill).
    warm_start: bool = True
    # host->device wire format: "storage" ships the PNG integers (uint8 /255,
    # RAW uint16 /16383) and normalizes on device inside the jitted step —
    # bit-identical to the f32 wire at 4x fewer transfer bytes
    # (RealBSRDataset.wire_dtype / train.to_unit_f32). --wire_f32 restores
    # the float wire.
    wire_dtype: Literal["storage", "float32"] = "storage"
    seed: int = 0
    num_workers: int = 16
    eval_workers: int = 8
    prefetch_depth: int = 2
    shard_id: int = 0
    num_shards: int = 1
    # online on-device registration applied inside the train/eval step
    # (the reference's DALI decode->flow->remap graph; "none" expects the
    # pre-aligned LR_aligned tree like the legacy recipe)
    online_align: Literal["none", "ecc", "flow"] = "none"
    # filename grammar variant: "aligned" = {b}_MFSR_Sony_{p:04d}_x1_{f:02d}.png
    # under LR_aligned/ + {b}_MFSR_Sony_{p:04d}_x4.png under HR/
    # (reference: fba_net/ManualDataset.py.bak:83,97); "warp" = the DALI tree
    # variant ..._x{s}_{f:02d}.png / ..._x4warp.png in one directory
    # (reference: fba_net/pipeline/real_bsr_dataset.py:40-55).
    layout: Literal["aligned", "warp"] = "aligned"

    def replace(self, **kw) -> "DataConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TrainConfig:
    """Training recipe (reference: fba_net/train.py.bak + fba_net/options.py:9-56).

    Defaults follow options.py; the published 31.012 dB run used
    batch_size=16, nepoch=200, embed_dim=64, warmup=True (README.md:95-98).
    """

    batch_size: int = 32
    nepoch: int = 250
    optimizer: Literal["adam", "adamw"] = "adamw"
    lr_initial: float = 1e-4
    weight_decay: float = 0.02
    warmup: bool = False
    warmup_epochs: int = 3
    cosine_eta_min: float = 1e-6
    step_lr_step: int = 50
    step_lr_gamma: float = 0.5
    checkpoint_every: int = 50  # epochs between periodic checkpoints (--checkpoint)
    # mid-epoch checkpointing: write model_latest with the step position
    # every N steps (0 = epoch boundaries only). Resume continues the SAME
    # epoch at that step with the identical sample sequence and rng — the
    # reference's DALI enable_checkpointing capability
    # (fba_net/pipeline/real_bsr_iterator.py:34-35).
    save_every_steps: int = 0
    # stop after N train steps of the first epoch (testing/smoke hook; the
    # interrupt checkpoint is written before returning)
    stop_after_steps: int = 0
    # gradient accumulation: each optimizer step averages grads over this
    # many consecutive loader batches, so the published global-batch-16
    # recipe (README.md:95-98) runs on one chip as --batch_size 8
    # --grad_accum 2 without the B=16 activation footprint that spills HBM
    # on a single v5e (docs/ROUND4.md §4b). Same estimator as the large
    # batch (mean-of-means == large-batch mean for equal microbatches);
    # mixup/dropout draw per-microbatch streams. No reference equivalent —
    # the reference requires the full batch to fit (fba_net/train.py.bak).
    grad_accum: int = 1
    eval_every_epochs: int = 1  # reference evaluates once per epoch (train.py.bak:173)
    gw_loss_weight: float = 3.0  # loss = charbonnier + 3*GWLoss (train.py.bak:168)
    charbonnier_eps: float = 1e-3
    # MixUp batch augmentation (reference: fba_net/utils/dataset_utils.py:221-236;
    # present in the codebase but commented out of the published recipe at
    # train.py.bak:163-164 — default off to match)
    mixup: bool = False
    mixup_alpha: float = 1.2
    seed: int = 1234  # reference seeds everything with 1234 (train.py.bak:56-59)
    save_dir: str = "./log"
    env: str = "_"
    arch: str = "BaseModel"
    resume: bool = False
    pretrain_weights: str = ""
    grad_clip_norm: float = 0.0  # 0 = off (reference has none)
    donate_state: bool = True
    profile_dir: str = ""  # capture a jax.profiler trace of epoch 1 here

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation settings (reference: fba_net/test.py:14-44,
    fba_net/test_in_any_resolution.py:55-56)."""

    weights: str = ""
    batch_size: int = 16
    save_images: bool = False
    result_dir: str = "./results"
    boundary_ignore: int = 40
    # overlap-tile inference (LR space); merge uses psize*scale / overlap*scale
    tile_psize: int = 80
    tile_overlap: int = 40

    def replace(self, **kw) -> "EvalConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def add_cli_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """Register the reference's flag names (reference: fba_net/options.py:9-56)."""
    p = parser
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--nepoch", type=int, default=250)
    p.add_argument("--train_workers", type=int, default=16)
    p.add_argument("--eval_workers", type=int, default=8)
    p.add_argument("--dataroot", type=str, default="")
    p.add_argument("--pretrain_weights", type=str, default="")
    p.add_argument("--optimizer", type=str, default="adamw")
    p.add_argument("--lr_initial", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.02)
    p.add_argument("--arch", type=str, default="BaseModel")
    p.add_argument("--save_dir", type=str, default="./log")
    p.add_argument("--save_images", action="store_true", default=False)
    p.add_argument("--env", type=str, default="_")
    p.add_argument("--checkpoint", type=int, default=50)
    p.add_argument("--save_every_steps", type=int, default=0)
    p.add_argument("--embed_dim", type=int, default=32)
    p.add_argument("--win_size", type=int, default=8)
    p.add_argument("--token_projection", type=str, default="linear")
    p.add_argument("--token_mlp", type=str, default="leff")
    p.add_argument("--att_se", action="store_true", default=False)
    p.add_argument("--train_ps", type=int, default=160)
    p.add_argument("--burst_size", type=int, default=14)
    p.add_argument("--in_channels", type=int, default=3, choices=[3, 4],
                   help="3 = RealBSR-RGB; 4 = RealBSR-RAW packed Bayer "
                        "(16-bit PNGs, /16383)")
    p.add_argument("--no_cache_decoded", action="store_true", default=False,
                   help="disable the decoded-frame RAM cache")
    p.add_argument("--cache_gb", type=float, default=8.0)
    p.add_argument("--warm_start", action="store_true", default=True,
                   help="pre-fill the decoded-frame cache before step 1 so "
                        "the decode-bound cold epoch does not starve the "
                        "device (default on when the cache is on)")
    p.add_argument("--no_warm_start", action="store_true", default=False,
                   help="skip the pre-training cache warm pass")
    p.add_argument("--wire_f32", action="store_true", default=False,
                   help="ship normalized f32 batches to the device instead "
                        "of the storage integers (4x the transfer bytes; "
                        "bit-identical results)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="average grads over N consecutive batches per "
                        "optimizer step (global batch = N * batch_size); "
                        "lets the published batch-16 recipe run on one "
                        "chip as --batch_size 8 --grad_accum 2")
    p.add_argument("--online_align", type=str, default="none",
                   choices=["none", "ecc", "flow"])
    p.add_argument("--resume", action="store_true", default=False)
    p.add_argument("--mixup", action="store_true", default=False)
    p.add_argument("--warmup", action="store_true", default=False)
    p.add_argument("--warmup_epochs", type=int, default=3)
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--seed", type=int, default=1234)
    return p


def from_cli(args: argparse.Namespace) -> Config:
    """Build the typed config from parsed reference-style CLI flags."""
    model = ModelConfig(
        num_frames=args.burst_size,
        img_size=args.train_ps,
        in_channels=args.in_channels,
        embed_dim=args.embed_dim,
        window_size=args.win_size,
        token_projection=args.token_projection,
        token_mlp=args.token_mlp,
        use_se_layer=args.att_se,
        dtype=args.dtype,
    )
    data = DataConfig(
        dataroot=args.dataroot,
        online_align=args.online_align,
        burst_size=args.burst_size,
        crop_size=args.train_ps,
        channels=args.in_channels,
        cache_decoded=not args.no_cache_decoded,
        cache_gb=args.cache_gb,
        warm_start=args.warm_start and not args.no_warm_start,
        wire_dtype="float32" if args.wire_f32 else "storage",
        num_workers=args.train_workers,
        eval_workers=args.eval_workers,
    )
    train = TrainConfig(
        batch_size=args.batch_size,
        nepoch=args.nepoch,
        optimizer=args.optimizer,
        lr_initial=args.lr_initial,
        weight_decay=args.weight_decay,
        warmup=args.warmup,
        warmup_epochs=args.warmup_epochs,
        checkpoint_every=args.checkpoint,
        save_every_steps=args.save_every_steps,
        grad_accum=args.grad_accum,
        save_dir=args.save_dir,
        env=args.env,
        arch=args.arch,
        resume=args.resume,
        mixup=args.mixup,
        pretrain_weights=args.pretrain_weights,
        seed=args.seed,
    )
    ev = EvalConfig(weights=args.weights, save_images=args.save_images)
    return Config(model=model, data=data, train=train, eval=ev)
