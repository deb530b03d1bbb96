"""Fixed-resolution evaluation with the reference's metric protocol.

Parity with `python test.py` (reference: fba_net/test.py): validation split at
the training patch size, batched forward, clamp to [0, 1], per-image PSNR /
SSIM (and LPIPS when weights are available) each with a 40-pixel boundary
crop, optional PNG dumps.

Averaging: the reference divides summed PSNR by the dataset length but SSIM/
LPIPS by the loader length (test.py:86-90) — a bug when batch_size > 1. Here
every metric uses one convention, shared with train.evaluate_psnr via
`metrics.finite_average`: sum of finite per-image values / total image count
(the legacy trainer's semantics, train.py.bak:191-193 + image_utils.py:143).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fbanet_tpu.config import Config, add_cli_args, from_cli
from fbanet_tpu.data.loader import BurstLoader
from fbanet_tpu.data.realbsr import RealBSRDataset
from fbanet_tpu.metrics import psnr as psnr_metric, ssim as ssim_metric
from fbanet_tpu.models import init_model
from fbanet_tpu.utils.checkpoint import load_params


def evaluate(cfg: Config, *, save_images: bool = False,
             result_dir: str = "./results",
             lpips_weights: str | None = None) -> dict:
    model, params = init_model(cfg.model, jax.random.key(0))
    weights = cfg.eval.weights or cfg.train.pretrain_weights
    if weights:
        params = load_params(weights, params)

    bi = cfg.eval.boundary_ignore
    # guard: the crop must leave pixels (plus SSIM's 11px window) on small images
    if cfg.data.crop_size and cfg.data.crop_size * cfg.data.scale <= 2 * bi + 11:
        bi = 0

    lpips_fn = None
    if lpips_weights:
        from fbanet_tpu.models.lpips import load_lpips

        lpips_model = load_lpips(lpips_weights)
        lpips_fn = jax.jit(lambda a, b: lpips_model(a, b, boundary_ignore=bi))

    from fbanet_tpu.train import to_unit_f32

    online_align = cfg.data.online_align
    if online_align != "none":
        # the same in-step registration train.py applies (train.make_eval_step)
        # — an accepted flag must not be a silent no-op here (the reference's
        # online DALI graph registers before the forward,
        # fba_net/pipeline/real_bsr_iterator.py:121-166)
        from fbanet_tpu.ops.registration import online_register

    @jax.jit
    def step(p, lr, hr):
        lr, hr = to_unit_f32(lr), to_unit_f32(hr)
        if online_align != "none":
            lr = online_register(lr, online_align)
        pred = jnp.clip(model.apply(p, lr, deterministic=True), 0.0, 1.0)
        return (pred,
                psnr_metric(pred, hr, boundary_ignore=bi),
                ssim_metric(pred, hr, boundary_ignore=bi), hr)

    # data-parallel eval: shard each batch over the mesh (the reference even
    # evaluated under DataParallel, fba_net/test.py:55). The last partial
    # batch is padded to the full batch size (pad_last) so the sharded jit
    # shape stays constant; padded results are sliced off via batch["valid"].
    from fbanet_tpu.parallel.mesh import batch_sharding, make_mesh

    n_dev = len(jax.devices())
    while cfg.eval.batch_size % n_dev != 0:
        n_dev -= 1
    mesh = make_mesh(jax.devices()[:n_dev])
    sharding = batch_sharding(mesh) if n_dev > 1 else None

    ds = RealBSRDataset(cfg.data.dataroot, split="val", layout=cfg.data.layout,
                        burst_size=cfg.data.burst_size,
                        crop_size=cfg.data.crop_size,
                        channels=cfg.data.channels,
                        cache_decoded=cfg.data.cache_decoded,
                        wire_dtype=cfg.data.wire_dtype,
                        augment=False)
    loader = BurstLoader(ds, batch_size=cfg.eval.batch_size,
                         num_workers=cfg.data.eval_workers, drop_last=False,
                         sharding=sharding, pad_last=sharding is not None)

    out_dir = Path(result_dir)
    if save_images:
        out_dir.mkdir(parents=True, exist_ok=True)

    psnrs, ssims, lpipses = [], [], []
    for batch in loader.epoch(0):
        pred, p, s, hr_unit = step(params, jnp.asarray(batch["LR"]),
                                   jnp.asarray(batch["HR"]))
        valid = batch.get("valid", len(batch["burst_name"]))
        psnrs.extend(np.asarray(p)[:valid].tolist())
        ssims.extend(np.atleast_1d(np.asarray(s))[:valid].tolist())
        if lpips_fn is not None:
            lpipses.extend(np.asarray(lpips_fn(pred, hr_unit))[:valid].tolist())
        if save_images:
            from PIL import Image

            arr = np.asarray(pred)
            if arr.shape[-1] == 4:  # RAW: visualize via the reference's
                # post-processing (packed Bayer -> display RGB)
                from fbanet_tpu.utils.raw import postprocess_raw, to_uint8

                arr = to_uint8(postprocess_raw(arr, return_rgb=True))
            else:
                arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
            for img, name in zip(arr, batch["burst_name"]):
                Image.fromarray(img).save(out_dir / f"{name}.png")

    # one averaging convention shared with train.evaluate_psnr: finite sum /
    # total count (reference: train.py.bak:191-193 + image_utils.py:143)
    from fbanet_tpu.metrics import finite_average

    results = {"psnr": finite_average(psnrs), "ssim": finite_average(ssims),
               "num_images": len(psnrs)}
    if lpipses:
        results["lpips"] = finite_average(lpipses)
    line = (f"PSNR: {results['psnr']:.4f}  SSIM: {results['ssim']:.4f}")
    if "lpips" in results:
        line += f"  LPIPS: {results['lpips']:.4f}"
    print(line + f"  ({results['num_images']} images)")
    return results


def main(argv: list[str] | None = None) -> None:
    parser = add_cli_args(argparse.ArgumentParser(description="FBANet evaluation"))
    parser.add_argument("--result_dir", type=str, default="./results")
    parser.add_argument("--lpips_weights", type=str, default="",
                        help=".npz from scripts/export_lpips_weights.py")
    args = parser.parse_args(argv)
    cfg = from_cli(args)
    evaluate(cfg, save_images=args.save_images, result_dir=args.result_dir,
             lpips_weights=args.lpips_weights or None)


if __name__ == "__main__":
    main()
