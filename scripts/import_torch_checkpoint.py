#!/usr/bin/env python
"""Import a legacy torch FBANet checkpoint (.pth) into this framework.

The published 31.012 dB checkpoint is a torch `state_dict` saved by the
legacy trainer as {"epoch", "state_dict", "optimizer"} with DataParallel's
"module." prefix (reference: fba_net/train.py.bak:199-246,
fba_net/utils/model_utils.py:22-38).

This script maps the torch parameter layout onto fbanet_tpu's flax tree:
- torch Conv2d weight [O, I, Kh, Kw]  -> flax Conv kernel [Kh, Kw, I, O]
- torch ConvTranspose2d [I, O, Kh, Kw] -> flax ConvTranspose [Kh, Kw, I, O]
  (flax's ConvTranspose kernel is [K..., in, out]; torch stores [in, out,...])
- torch Linear weight [O, I]           -> flax Dense kernel [I, O]
- LayerNorm/PReLU transfer directly.

The torch-side module names depend on the exact upstream checkpoint
revision, so the mapping table below is keyed by *shape-matched order within
named groups* and prints a full report; verify the reported pairing and the
post-import eval PSNR before trusting an imported model.

Usage:
    python scripts/import_torch_checkpoint.py model_best.pth out_ckpt \
        --embed_dim 64 --train_ps 160
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def convert_tensor(name: str, array):
    import numpy as np

    a = np.asarray(array)
    if a.ndim == 4:
        if "transpose" in name or "up" in name.lower() and a.shape[0] < a.shape[1]:
            # ConvTranspose2d: [I, O, Kh, Kw] -> [Kh, Kw, I, O]
            return a.transpose(2, 3, 0, 1)
        # Conv2d: [O, I, Kh, Kw] -> [Kh, Kw, I, O]
        return a.transpose(2, 3, 1, 0)
    if a.ndim == 2:  # Linear [O, I] -> [I, O]
        return a.T
    return a


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("torch_ckpt")
    p.add_argument("out_path")
    p.add_argument("--embed_dim", type=int, default=64)
    p.add_argument("--train_ps", type=int, default=160)
    p.add_argument("--win_size", type=int, default=8)
    args = p.parse_args()

    import numpy as np
    import torch

    import jax
    from flax import traverse_util

    from fbanet_tpu.config import ModelConfig
    from fbanet_tpu.models import init_model
    from fbanet_tpu.utils.checkpoint import save_checkpoint

    state = torch.load(args.torch_ckpt, map_location="cpu",
                       weights_only=False)
    sd = state.get("state_dict", state)
    # strip the DataParallel prefix (reference: model_utils.py:28-38)
    sd = {k.removeprefix("module."): v.numpy() for k, v in sd.items()}

    cfg = ModelConfig(img_size=args.train_ps, embed_dim=args.embed_dim,
                      window_size=args.win_size, dtype="float32")
    model, params = init_model(cfg, jax.random.key(0))
    flat = traverse_util.flatten_dict(params, sep="/")

    # group torch + flax params by shape after conversion and pair in order
    converted = {k: convert_tensor(k, v) for k, v in sd.items()}
    by_shape_torch: dict[tuple, list[str]] = {}
    for k, v in converted.items():
        by_shape_torch.setdefault(tuple(v.shape), []).append(k)
    matched, missed = 0, []
    for fk, fv in flat.items():
        shape = tuple(np.asarray(fv).shape)
        cands = by_shape_torch.get(shape, [])
        if cands:
            tk = cands.pop(0)
            flat[fk] = converted[tk].astype(np.asarray(fv).dtype)
            print(f"map {tk} -> {fk} {shape}")
            matched += 1
        else:
            missed.append((fk, shape))
    print(f"\nmatched {matched}/{len(flat)}; unmatched flax params:")
    for fk, shape in missed:
        print(f"  MISSING {fk} {shape}")

    params = traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()})
    save_checkpoint(args.out_path, params=params, opt_state={}, epoch=0,
                    extra={"imported_from": str(args.torch_ckpt),
                           "matched": matched, "total": len(flat)})
    print(f"wrote {args.out_path}.msgpack — validate with "
          f"`python -m fbanet_tpu.evaluate --weights {args.out_path} ...`")


if __name__ == "__main__":
    main()
