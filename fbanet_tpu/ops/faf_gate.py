"""FAF affinity gate — depthwise-conv + lane-reduce form.

The gate stage (reference: fba_net/blocks/federated_affinity_fusion.py:67-108
after the exact cancellation documented in models/blocks.py) is

    s_k   = sum_c (x_k  *3x3* wsum)      per-pixel scalar affinity
    gate  = sigmoid(|s_k - s_0|)         (frame 0 ungated)
    out_k = x_k * gate_k

The channel-summed conv runs DEPTHWISE (kernel [3,3,1,C], clean C-lane
layout) plus an f32 lane reduction — instead of a C_out=1 conv whose output
XLA lays out padded 1->128 lanes (a 128x-inflated store, and the same
pathology in its wgrad).

A fused Pallas strip kernel for this stage was built and measured on v5e
(round 4): 0.50-0.59x this XLA form forward and 0.30-0.47x fwd+bwd at the
published shapes (docs/ROUND4.md has the table). The overlapping +-1-row
halo blocks re-read every strip ~3x per affinity pass where XLA's fused
depthwise form streams it once, and the 9-tap VPU loop pays a lane-shift
relayout per kx tap. Deleted on that measurement; this XLA form is the
production gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def affinity_gate(x: Array, wsum: Array,
                  compute_dtype=jnp.bfloat16) -> Array:
    """Gated burst `x * sigmoid(|s_k - s_0|)` (frame 0 ungated).

    x: [B, F, H, W, C]; wsum: [3, 3, C] (channel-summed embedding kernel).
    """
    b, f, h, w, c = x.shape
    cdtype = jnp.dtype(compute_dtype)
    xd = x.astype(cdtype)
    wdep = wsum[:, :, None, :].astype(cdtype)  # [3, 3, 1, C]
    dn = lax.conv_dimension_numbers((b * f, h, w, c), wdep.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    z = lax.conv_general_dilated(xd.reshape(b * f, h, w, c), wdep, (1, 1),
                                 [(1, 1), (1, 1)], dimension_numbers=dn,
                                 feature_group_count=c)
    # f32 channel reduction: the C_out=1 conv this form replaced accumulated
    # in f32 on the MXU; a bf16 lane-sum would add ~1e-2 drift that the
    # |s_k - s_0| cancellation amplifies.
    s = jnp.sum(z, axis=-1, dtype=jnp.float32).reshape(b, f, h, w)
    delta = jnp.abs(s - s[:, :1])[..., None]
    gate = jax.nn.sigmoid(delta).astype(cdtype)
    fidx = jnp.arange(f).reshape(1, f, 1, 1, 1)
    gate = jnp.where(fidx == 0, jnp.ones((), cdtype), gate)
    return xd * gate
