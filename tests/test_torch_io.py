"""Torch <-> flax conversion tests.

Two layers of evidence:
1. per-layer *semantic* parity — torch modules and their converted flax
   counterparts produce the same outputs (pins the layout/flip rules to real
   module semantics, not just invertibility),
2. full-model roundtrip — a torch-layout state_dict synthesized from the
   flax tree imports back to a bit-identical forward, and the import is
   strict about missing/renamed parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from flax import linen as nn  # noqa: E402

from fbanet_tpu.config import ModelConfig  # noqa: E402
from fbanet_tpu.models import init_model  # noqa: E402
from fbanet_tpu.utils.torch_io import (  # noqa: E402
    flax_to_torch_state_dict,
    torch_to_flax_params,
)

# ------------------------------------------------------------- semantics ----


def _roundtrip_single(flax_module, torch_module, x_nhwc):
    """Init flax module, export to torch layout, load into the torch module,
    compare outputs."""
    params = flax_module.init(jax.random.key(0), jnp.asarray(x_nhwc))
    sd = flax_to_torch_state_dict(params["params"])
    # single-submodule tree: strip the flax scope prefix for the torch module
    tsd = {k.split(".", 1)[-1] if "." in k else k: torch.tensor(v)
           for k, v in sd.items()}
    torch_module.load_state_dict(tsd)
    y_flax = np.asarray(flax_module.apply(params, jnp.asarray(x_nhwc)))
    with torch.no_grad():
        y_torch = torch_module(torch.tensor(x_nhwc.transpose(0, 3, 1, 2)))
    return y_flax, y_torch.numpy().transpose(0, 2, 3, 1)


def test_conv_layout_semantics():
    x = np.random.default_rng(0).normal(size=(2, 8, 8, 3)).astype(np.float32)
    a, b = _roundtrip_single(nn.Conv(5, (3, 3), padding=1),
                             torch.nn.Conv2d(3, 5, 3, padding=1), x)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_conv_transpose_layout_semantics():
    """The actual Upsample module (ConvTranspose k=2 s=2) vs torch — the
    path-based ConvTranspose detection keys off flax's auto-naming, so test
    through the real module, as the model uses it."""
    from fbanet_tpu.models.layers import Upsample

    x = np.random.default_rng(1).normal(size=(2, 8, 8, 4)).astype(np.float32)
    a, b = _roundtrip_single(Upsample(6),
                             torch.nn.ConvTranspose2d(4, 6, 2, stride=2), x)
    assert a.shape == b.shape == (2, 16, 16, 6)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_dense_layout_semantics():
    x = np.random.default_rng(2).normal(size=(4, 7)).astype(np.float32)
    flax_mod = nn.Dense(9)
    params = flax_mod.init(jax.random.key(0), jnp.asarray(x))
    sd = flax_to_torch_state_dict(params["params"])
    tm = torch.nn.Linear(7, 9)
    tm.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    a = np.asarray(flax_mod.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        b = tm(torch.tensor(x)).numpy()
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_prelu_and_layernorm_semantics():
    from fbanet_tpu.models.layers import PReLU

    x = np.random.default_rng(3).normal(size=(2, 8, 8, 3)).astype(np.float32)
    a, b = _roundtrip_single(PReLU(init_alpha=0.25),
                             torch.nn.PReLU(num_parameters=1, init=0.25), x)
    np.testing.assert_allclose(a, b, atol=1e-6)

    # eps must match for a numeric comparison (flax default 1e-6, torch 1e-5;
    # the model's norms use 1e-5 for checkpoint-import fidelity)
    ln = nn.LayerNorm(epsilon=1e-5)
    params = ln.init(jax.random.key(0), jnp.asarray(x))
    sd = flax_to_torch_state_dict(params["params"])
    tln = torch.nn.LayerNorm(3, eps=1e-5)
    tln.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    a = np.asarray(ln.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        b = tln(torch.tensor(x)).numpy()
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_faf_block_torch_golden():
    """Full FAF block vs a torch reimplementation of the reference semantics
    (fba_net/blocks/federated_affinity_fusion.py), weights transferred by the
    strict name mapping with NO permutation. Pins the feature_fusion conv's
    frame-major in-channel grouping ("f h w nf -> h w (f nf)", :124-127 —
    torch cat(dim=1) order): with the previous c-major einsum reshape this
    test fails, so a published-checkpoint import cannot silently scramble
    that conv's input channels."""
    import torch.nn.functional as tF

    from fbanet_tpu.models.blocks import FAFBlock

    f, c, hw = 3, 8, 16

    class _Res(torch.nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.Conv_0 = torch.nn.Conv2d(ch, ch, 3, padding=1)
            self.Conv_1 = torch.nn.Conv2d(ch, ch, 3, padding=1)

        def forward(self, x):
            return x + self.Conv_1(tF.relu(self.Conv_0(x)))

    class _Down(torch.nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.Conv_0 = torch.nn.Conv2d(cin, cout, 4, stride=2, padding=1)

        def forward(self, x):
            return self.Conv_0(x)

    class _Up(torch.nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.ConvTranspose_0 = torch.nn.ConvTranspose2d(cin, cout, 2,
                                                            stride=2)

        def forward(self, x):
            return self.ConvTranspose_0(x)

    class TorchFAF(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.temporal_attn0 = torch.nn.Conv2d(c, c, 3, padding=1)
            self.temporal_attn1 = torch.nn.Conv2d(c, c, 3, padding=1)
            self.feature_fusion = torch.nn.Conv2d(f * c, c, 1)
            self.feature_fusion_act = torch.nn.PReLU(1, 0.1)
            for i in (0, 1):
                self.add_module(f"res0_{i}", _Res(c))
                self.add_module(f"res1_{i}", _Res(2 * c))
                self.add_module(f"res2_{i}", _Res(4 * c))
                self.add_module(f"res3_{i}", _Res(4 * c))
                self.add_module(f"res4_{i}", _Res(2 * c))
            self.down0 = _Down(c, 2 * c)
            self.down1 = _Down(2 * c, 4 * c)
            self.up0 = _Up(4 * c, 2 * c)
            self.up1 = _Up(4 * c, c)
            self.fusion_tail = torch.nn.Conv2d(2 * c, c, 3, padding=1)

        def forward(self, frames):  # [B, F, C, H, W]
            b, nf, ch, h, w = frames.shape
            emb_ref = self.temporal_attn0(frames[:, 0])
            emb_all = self.temporal_attn1(
                frames.reshape(b * nf, ch, h, w)).reshape(b, nf, ch, h, w)
            affinity = (emb_all - emb_ref[:, None]).sum(dim=2)  # [B,F,H,W]
            gate = torch.sigmoid((affinity[:, 1:] - affinity[:, :1]).abs())
            guided = torch.cat(
                [frames[:, :1], frames[:, 1:] * gate[:, :, None]], dim=1)
            # frame-major channel concat — torch cat(dim=1) order f*C + c
            feat = self.feature_fusion(guided.reshape(b, nf * ch, h, w))
            feat = self.feature_fusion_act(feat)
            f0 = self.res0_1(self.res0_0(feat))
            f1 = self.res1_1(self.res1_0(self.down0(f0)))
            f2 = self.res2_1(self.res2_0(self.down1(f1)))
            f3 = self.res3_1(self.res3_0(torch.cat([self.up0(f2), f1], 1)))
            f4 = self.res4_1(self.res4_0(torch.cat([self.up1(f3), f0], 1)))
            return self.fusion_tail(f4) + feat

    blk = FAFBlock(num_feats=c, num_frames=f)
    x = np.random.default_rng(7).normal(
        size=(2, f, hw, hw, c)).astype(np.float32) * 0.5
    params = blk.init(jax.random.key(0), jnp.asarray(x))
    sd = flax_to_torch_state_dict(params["params"])

    tm = TorchFAF()
    tm.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    y_flax = np.asarray(blk.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        y_torch = tm(torch.tensor(x.transpose(0, 1, 4, 2, 3)))
    np.testing.assert_allclose(
        y_flax, y_torch.numpy().transpose(0, 2, 3, 1), atol=3e-5)


# ------------------------------------------------------------- roundtrip ----

TINY = ModelConfig(num_frames=2, img_size=16, embed_dim=8, window_size=4,
                   heads=(1, 2, 4, 8, 4, 4, 2, 2, 2), dtype="float32",
                   drop_path_rate=0.0, attention_impl="xla")


def test_full_model_roundtrip_bit_identical():
    model, params = init_model(TINY, jax.random.key(0))
    sd = flax_to_torch_state_dict(params["params"])
    # simulate the published checkpoint format: tensors + module. prefix
    sd_torch = {f"module.{k}": torch.tensor(v) for k, v in sd.items()}

    # import onto a differently-initialized template
    _, params2 = init_model(TINY, jax.random.key(42))
    imported, report = torch_to_flax_params(sd_torch, params2["params"])
    assert not report["missing"] and not report["mismatched"]
    assert not report["unused"]

    burst = jax.random.uniform(jax.random.key(1), (1, 2, 16, 16, 3))
    y_ref = np.asarray(model.apply(params, burst, deterministic=True))
    y_imp = np.asarray(model.apply({"params": imported}, burst,
                                   deterministic=True))
    np.testing.assert_array_equal(y_ref, y_imp)  # bit-identical


def test_import_is_strict_about_missing_params():
    _, params = init_model(TINY, jax.random.key(0))
    sd = flax_to_torch_state_dict(params["params"])
    key = sorted(sd)[3]
    del sd[key]
    with pytest.raises(KeyError, match="MISSING"):
        torch_to_flax_params(sd, params["params"])


def test_import_rename_map_bridges_foreign_names():
    _, params = init_model(TINY, jax.random.key(0))
    sd = flax_to_torch_state_dict(params["params"])
    key = sorted(sd)[0]
    foreign = dict(sd)
    foreign["some.legacy.name"] = foreign.pop(key)
    with pytest.raises(KeyError):
        torch_to_flax_params(foreign, params["params"])
    imported, report = torch_to_flax_params(
        foreign, params["params"], rename={"some.legacy.name": key})
    assert not report["missing"]
