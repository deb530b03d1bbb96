#!/usr/bin/env python
"""Import a legacy torch FBANet checkpoint (.pth) into this framework.

The published 31.012 dB checkpoint is a torch `state_dict` saved by the
legacy trainer as {"epoch", "state_dict", "optimizer"} with DataParallel's
"module." prefix (reference: fba_net/train.py.bak:199-246,
fba_net/utils/model_utils.py:22-38).

Conversion uses the explicit, invertible name/layout mapping in
fbanet_tpu/utils/torch_io.py (validated by tests/test_torch_io.py, which
round-trips a synthesized torch state_dict and asserts a bit-identical
forward). The import is STRICT: every flax parameter must be sourced from
the checkpoint by name, or the script fails listing the gaps — no
shape-based guessing (dozens of convs here share shapes; guessing scrambles
them silently).

A checkpoint from the original torch codebase will use its own module
names; provide `--map_json` with {"torch.name": "our.canonical.name"}
entries to bridge them (run once to see both name lists side by side).

Usage:
    python scripts/import_torch_checkpoint.py model_best.pth out_ckpt \
        --embed_dim 64 --train_ps 160 [--map_json rename.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("torch_ckpt")
    p.add_argument("out_path")
    p.add_argument("--embed_dim", type=int, default=64)
    p.add_argument("--train_ps", type=int, default=160)
    p.add_argument("--win_size", type=int, default=8)
    p.add_argument("--map_json", type=str, default="",
                   help="JSON file mapping torch keys to canonical names")
    args = p.parse_args()

    import torch

    import jax

    from fbanet_tpu.config import ModelConfig
    from fbanet_tpu.models import init_model
    from fbanet_tpu.utils.checkpoint import save_checkpoint
    from fbanet_tpu.utils.torch_io import torch_to_flax_params

    state = torch.load(args.torch_ckpt, map_location="cpu",
                       weights_only=False)
    sd = state.get("state_dict", state)

    cfg = ModelConfig(img_size=args.train_ps, embed_dim=args.embed_dim,
                      window_size=args.win_size, dtype="float32")
    model, params = init_model(cfg, jax.random.key(0))

    rename = None
    if args.map_json:
        rename = json.loads(Path(args.map_json).read_text())

    params, report = torch_to_flax_params(sd, params, rename=rename,
                                          strict=True)
    print(f"imported {len(sd)} torch tensors; "
          f"{len(report['unused'])} unused torch keys")

    save_checkpoint(args.out_path, params=params, opt_state={},
                    epoch=int(state.get("epoch", 0)),
                    extra={"imported_from": str(args.torch_ckpt)})
    print(f"wrote {args.out_path}.msgpack — validate with "
          f"`python -m fbanet_tpu.evaluate --weights {args.out_path} ...`")


if __name__ == "__main__":
    main()
