#!/usr/bin/env python
"""Export the torch `lpips` package's AlexNet-LPIPS weights to .npz.

Run this on any machine with `torch` and `lpips` installed (and network
access for the pretrained download):

    python scripts/export_lpips_weights.py lpips_alex.npz

then use the file with `fbanet_tpu.models.lpips.load_lpips`.

Key mapping (torch -> npz):
- lpips.LPIPS(net='alex').scaling_layer.{shift,scale}: [1,3,1,1] -> [3]
- .net.slice{1..5} conv weights: OIHW -> HWIO as conv{i}_{w,b}
- .lin{0..4}.model[1].weight: [1,C,1,1] -> [C] as lin{i}_w
"""

import sys

import numpy as np


def convert_state_dict(sd: dict) -> dict[str, np.ndarray]:
    """lpips.LPIPS(net='alex') state_dict (numpy values) -> our npz layout.

    Pure tensor-layout conversion, unit-tested in tests/test_lpips_torch.py
    against a torch re-evaluation of the same weights.
    """
    out: dict[str, np.ndarray] = {
        "shift": sd["scaling_layer.shift"].reshape(3).astype(np.float32),
        "scale": sd["scaling_layer.scale"].reshape(3).astype(np.float32),
    }
    # torchvision alexnet.features conv indices inside lpips' AlexNet slices
    conv_keys = [k for k in sd if k.startswith("net.") and k.endswith(".weight")
                 and sd[k].ndim == 4]
    conv_keys.sort(key=lambda k: int(k.split(".")[2]))
    assert len(conv_keys) == 5, conv_keys
    for i, k in enumerate(conv_keys):
        w = sd[k]  # [O, I, Kh, Kw]
        b = sd[k.replace(".weight", ".bias")]
        out[f"conv{i}_w"] = w.transpose(2, 3, 1, 0).astype(np.float32)
        out[f"conv{i}_b"] = b.astype(np.float32)
    for i in range(5):
        lin = sd[f"lin{i}.model.1.weight"]  # [1, C, 1, 1]
        out[f"lin{i}_w"] = lin.reshape(-1).astype(np.float32)
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz"
    import lpips  # type: ignore
    import torch  # noqa: F401

    model = lpips.LPIPS(net="alex")
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    out = convert_state_dict(sd)
    np.savez(out_path, **out)
    print(f"wrote {out_path}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main()
