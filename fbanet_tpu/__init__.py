"""fbanet_tpu — a TPU-native burst image super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of FBANet
("Towards Real-World Burst Image Super-Resolution", ICCV 2023; reference
implementation ConnorBaker/FBANet):

- On-device batched burst registration (ECC / inverse-compositional LK over
  image pyramids) replacing the reference's OpenCV CPU preprocessing
  (reference: fba_net/homography_alignment.py).
- A Pallas/XLA bilinear warp kernel replacing cv2.warpPerspective / DALI NPP
  remap (reference: fba_net/pipeline/real_bsr_iterator.py:121-166).
- The FBANet model (per-frame conv features -> Federated Affinity Fusion ->
  two window-attention hourglass U-Nets -> x4 pixel-shuffle upsampling),
  channels-last, batched, bf16-ready (reference: fba_net/models/fba_net.py).
- The full training recipe that produced the published 31.012 dB checkpoint
  (Charbonnier + 3*GWLoss, AdamW, warmup+cosine, best/latest/periodic
  checkpoints; reference: fba_net/train.py.bak).
- Fixed-resolution and overlap-tile any-resolution evaluation
  (reference: fba_net/test.py, fba_net/test_in_any_resolution.py).
- Data-parallel scaling via jax.sharding over a device mesh.
"""

__version__ = "0.1.0"
