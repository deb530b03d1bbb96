"""Torch <-> flax checkpoint conversion with an explicit, invertible mapping.

The published 31.012 dB checkpoint is a torch `state_dict` saved as
{"epoch", "state_dict", "optimizer"} with DataParallel's "module." prefix
(reference: fba_net/train.py.bak:199-246, fba_net/utils/model_utils.py:22-38).

Name mapping: every flax parameter path maps deterministically to a torch
key — path separators become dots, flax leaf names become torch ones
(kernel/scale/alpha -> weight). Tensor layout transforms are keyed by the
*module type visible in the path* (flax auto-names its submodules
Conv_0/ConvTranspose_0/Dense_0, and our named modules keep those class
names in scope), making the transform unambiguous:

    Conv kernel           [Kh, Kw, I, O] <-> torch Conv2d.weight    [O, I, Kh, Kw]
    ConvTranspose kernel  [Kh, Kw, I, O] <-> torch ConvTranspose2d  [I, O, Kh, Kw]
      (torch's kernel is additionally spatially flipped relative to flax's
       cross-correlation convention — handled with a flip)
    Dense kernel          [I, O]         <-> torch Linear.weight    [O, I]
    LayerNorm scale       [C]            <-> torch LayerNorm.weight [C]
    PReLU alpha           scalar         <-> torch PReLU.weight     [1]
    everything else transfers unchanged.

A checkpoint from a *different* torch codebase will use different module
names; pass `rename` (torch-name -> our-canonical-name) to bridge them.
Import is strict: any flax parameter without a torch source is an error —
no silent shape-based guessing (that scrambles the dozens of
identically-shaped 3x3 convs in this model).

The roundtrip (export -> import -> bit-identical forward) is pinned by
tests/test_torch_io.py.
"""

from __future__ import annotations

import numpy as np


def _is_transpose_conv(path: tuple[str, ...]) -> bool:
    return any("ConvTranspose" in seg for seg in path)


def _torch_key(path: tuple[str, ...]) -> str:
    """Canonical torch name for a flax parameter path ('params' stripped)."""
    *mods, leaf = path
    if mods and mods[0] == "params":
        mods = mods[1:]
    leaf = {"kernel": "weight", "scale": "weight", "alpha": "weight"}.get(
        leaf, leaf)
    return ".".join([*mods, leaf])


def flax_to_torch_state_dict(params) -> dict[str, np.ndarray]:
    """Export a flax parameter tree as a torch-layout state_dict (numpy)."""
    from flax import traverse_util

    out: dict[str, np.ndarray] = {}
    for path, value in traverse_util.flatten_dict(params).items():
        a = np.asarray(value)
        leaf = path[-1]
        if leaf == "kernel" and a.ndim == 4:
            if _is_transpose_conv(path):
                # flax ConvTranspose [Kh,Kw,I,O] -> torch [I,O,Kh,Kw] + flip
                a = a[::-1, ::-1].transpose(2, 3, 0, 1)
            else:
                a = a.transpose(3, 2, 0, 1)  # -> [O, I, Kh, Kw]
        elif leaf == "kernel" and a.ndim == 2:
            a = a.T  # Dense [I, O] -> Linear [O, I]
        elif leaf == "alpha" and a.ndim == 0:
            a = a.reshape(1)  # PReLU scalar -> [1]
        key = _torch_key(path)
        assert key not in out, f"duplicate torch key {key}"
        out[key] = np.ascontiguousarray(a)
    return out


def torch_to_flax_params(state_dict: dict, params_template, *,
                         rename: dict[str, str] | None = None,
                         strict: bool = True):
    """Import a torch state_dict onto the flax tree `params_template`.

    `state_dict` values may be torch tensors or numpy arrays. `rename` maps
    raw torch keys (after the DataParallel "module." strip) to our canonical
    names. With `strict`, raises on any unmatched flax parameter or shape
    mismatch, listing the offenders.
    """
    from flax import traverse_util

    sd: dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        k = k.removeprefix("module.")  # reference: model_utils.py:28-38
        if rename and k in rename:
            k = rename[k]
        sd[k] = np.asarray(v.numpy() if hasattr(v, "numpy") else v)

    flat = traverse_util.flatten_dict(params_template)
    new_flat = {}
    missing: list[str] = []
    mismatched: list[str] = []
    used: set[str] = set()
    for path, value in flat.items():
        key = _torch_key(path)
        tmpl = np.asarray(value)
        if key not in sd:
            missing.append(f"{key} {tmpl.shape}")
            new_flat[path] = value
            continue
        used.add(key)
        a = sd[key]
        leaf = path[-1]
        if leaf == "kernel" and tmpl.ndim == 4:
            if _is_transpose_conv(path):
                a = a.transpose(2, 3, 0, 1)[::-1, ::-1]
            else:
                a = a.transpose(2, 3, 1, 0)
        elif leaf == "kernel" and tmpl.ndim == 2:
            a = a.T
        elif leaf == "alpha" and tmpl.ndim == 0:
            a = a.reshape(())
        if a.shape != tmpl.shape:
            mismatched.append(f"{key}: torch {sd[key].shape} -> {a.shape}, "
                              f"flax wants {tmpl.shape}")
            new_flat[path] = value
            continue
        # NB: np.ascontiguousarray promotes 0-d to 1-d — keep the shape
        new_flat[path] = np.asarray(
            np.ascontiguousarray(a).astype(tmpl.dtype)).reshape(tmpl.shape)

    unused = sorted(set(sd) - used)
    if strict and (missing or mismatched):
        lines = ["torch checkpoint does not cover the model:"]
        lines += [f"  MISSING {m}" for m in missing]
        lines += [f"  SHAPE   {m}" for m in mismatched]
        if unused:
            lines.append("  unused torch keys (candidates for a rename map):")
            lines += [f"    {k} {tuple(sd[k].shape)}" for k in unused[:50]]
        raise KeyError("\n".join(lines))

    params = traverse_util.unflatten_dict(new_flat)
    return params, {"missing": missing, "mismatched": mismatched,
                    "unused": unused}
