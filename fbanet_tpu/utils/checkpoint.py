"""Checkpoint I/O: the reference's best/latest/periodic triad, resumable.

Reference semantics (fba_net/train.py.bak:199-246, fba_net/utils/model_utils.py):
- `model_best` overwritten whenever validation PSNR improves,
- `model_latest` overwritten every epoch,
- `model_epoch_{N}` every `--checkpoint` (default 50) epochs,
- each checkpoint stores epoch + model + optimizer state and resume restores
  the epoch counter and learning-rate schedule position.

Serialization is flax msgpack (`flax.serialization`) — single-file, format-
stable, no torch pickle. A `.json` sidecar carries the scalar metadata so it
is readable without deserializing the tree.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
from flax import serialization


def save_checkpoint(path: str | Path, *, params: Any, opt_state: Any,
                    epoch: int, best_psnr: float = 0.0,
                    extra: dict | None = None) -> None:
    """Write `{path}.msgpack` + `{path}.json`."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    params = jax.device_get(params)
    opt_state = jax.device_get(opt_state)
    blob = serialization.to_bytes({"params": params, "opt_state": opt_state})
    tmp = path.with_suffix(".msgpack.tmp")
    tmp.write_bytes(blob)
    tmp.replace(path.with_suffix(".msgpack"))
    meta = {"epoch": int(epoch), "best_psnr": float(best_psnr)}
    if extra:
        meta.update(extra)
    path.with_suffix(".json").write_text(json.dumps(meta))


def load_checkpoint(path: str | Path, *, params_template: Any,
                    opt_state_template: Any) -> dict:
    """Restore a checkpoint onto templates (shape/dtype donors).

    Returns {'params', 'opt_state', 'epoch', 'best_psnr', ...meta}.
    """
    path = Path(path)
    blob = path.with_suffix(".msgpack").read_bytes()
    restored = serialization.from_bytes(
        {"params": params_template, "opt_state": opt_state_template}, blob)
    meta = json.loads(path.with_suffix(".json").read_text())
    return {**restored, **meta}


def load_params(path: str | Path, params_template: Any) -> Any:
    """Restore only the parameters (for evaluation; the reference's
    `load_checkpoint` equivalent, fba_net/utils/model_utils.py:28-38)."""
    path = Path(path)
    blob = path.with_suffix(".msgpack").read_bytes()
    # tolerate full checkpoints by deserializing into a superset template
    state = serialization.msgpack_restore(blob)
    tree = state.get("params", state)
    return serialization.from_state_dict(params_template, tree)


class CheckpointTriad:
    """best/latest/periodic checkpoint policy with the reference's names."""

    def __init__(self, model_dir: str | Path, period: int = 50) -> None:
        self.model_dir = Path(model_dir)
        self.period = period

    def path(self, name: str) -> Path:
        return self.model_dir / name

    def on_best(self, **kw) -> None:
        save_checkpoint(self.path("model_best"), **kw)

    def on_epoch_end(self, epoch: int, **kw) -> None:
        save_checkpoint(self.path("model_latest"), epoch=epoch, **kw)
        if self.period and epoch % self.period == 0:
            save_checkpoint(self.path(f"model_epoch_{epoch}"), epoch=epoch, **kw)

    def on_step(self, epoch: int, step_in_epoch: int, epoch_loss: float,
                **kw) -> None:
        """Mid-epoch checkpoint: model_latest with the step position (resume
        continues the same epoch at this step — DALI enable_checkpointing
        parity, reference: fba_net/pipeline/real_bsr_iterator.py:34-35)."""
        extra = dict(kw.pop("extra", {}) or {})
        extra.update({"step_in_epoch": int(step_in_epoch),
                      "epoch_loss": float(epoch_loss)})
        save_checkpoint(self.path("model_latest"), epoch=epoch, extra=extra,
                        **kw)

    def latest(self) -> Path | None:
        p = self.path("model_latest")
        return p if p.with_suffix(".msgpack").exists() else None
