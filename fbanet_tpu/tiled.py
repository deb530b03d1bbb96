"""Overlap-tile any-resolution inference.

Reproduces the reference's `test_in_any_resolution.py` semantics (psize=80,
overlap=40 in LR space; merge at psize*4/overlap*4; reflect padding;
reference: fba_net/test_in_any_resolution.py:55-91 +
fba_net/utils/dataset_utils.py:5-58,140-180) with one key change: the
reference ran tiles *serially* at batch size 1 on one GPU; here all tiles of
an image form one batch through a single jitted forward — and since
psize + 2*overlap == 160 == the training patch size, that forward reuses the
training-shape compilation for every tile of every image (the property called
out in SURVEY.md §3.4). The tile batch can additionally be sharded across a
device mesh (tiles are the spatial unit of data parallelism, SURVEY.md §2.3).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def compute_tile_layout(h: int, w: int, psize: int) -> tuple[int, int, int, int]:
    """Returns (h_pad, w_pad, n_tiles_h, n_tiles_w) for the reflect-padded grid."""
    h_pad = (psize - h % psize) % psize
    w_pad = (psize - w % psize) % psize
    return h_pad, w_pad, (h + h_pad) // psize, (w + w_pad) // psize


def divide_burst(burst: np.ndarray, psize: int, overlap: int) -> np.ndarray:
    """[F, H, W, C] -> [Nt, F, psize+2*overlap, psize+2*overlap, C].

    Reflect-pads to a multiple of `psize` (bottom/right), then pads an
    `overlap` halo on all sides and slices the tile grid row-major —
    the reference's `tensor_divide_burst` (dataset_utils.py:5-58).
    """
    f, h, w, c = burst.shape
    h_pad, w_pad, nh, nw = compute_tile_layout(h, w, psize)
    x = np.pad(burst, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)), mode="reflect")
    x = np.pad(x, ((0, 0), (overlap, overlap), (overlap, overlap), (0, 0)),
               mode="reflect")
    t = psize + 2 * overlap
    tiles = [
        x[:, i * psize:i * psize + t, j * psize:j * psize + t]
        for i in range(nh) for j in range(nw)
    ]
    return np.stack(tiles)


def merge_tiles(tiles: np.ndarray, out_h: int, out_w: int, psize: int,
                overlap: int) -> np.ndarray:
    """[Nt, T, T, C] HR tiles -> [out_h, out_w, C] stitched canvas.

    `psize`/`overlap` are in *output* (HR) space — the reference calls merge
    with psize*4 / overlap*4 (test_in_any_resolution.py:91). Strips the halo,
    lays tile centers row-major, crops the divisibility padding
    (`tensor_merge`, dataset_utils.py:140-180).
    """
    _, t, _, c = tiles.shape
    assert t == psize + 2 * overlap
    h_pad, w_pad, nh, nw = compute_tile_layout(out_h, out_w, psize)
    canvas = np.zeros((out_h + h_pad, out_w + w_pad, c), tiles.dtype)
    for idx in range(tiles.shape[0]):
        i, j = divmod(idx, nw)
        center = tiles[idx, overlap:overlap + psize, overlap:overlap + psize]
        canvas[i * psize:(i + 1) * psize, j * psize:(j + 1) * psize] = center
    return canvas[:out_h, :out_w]


def tiled_forward(
    apply_fn,
    burst: np.ndarray,
    *,
    psize: int = 80,
    overlap: int = 40,
    scale: int = 4,
    tile_batch: int = 0,
    mesh=None,
) -> np.ndarray:
    """Run `apply_fn` ([B,F,t,t,C] -> [B,t*scale,t*scale,C]) over all tiles of
    one burst `[F, H, W, C]` and stitch the x`scale` result.

    `tile_batch` > 0 caps the per-call batch (device memory guard); 0 runs
    all tiles in one batch. Tile counts that don't fill the last batch are
    padded (and the padding discarded) so the jitted shape stays constant.

    With `mesh`, the tile batch is sharded across the device mesh — tiles
    are the spatial unit of data parallelism (SURVEY.md §2.3): every chip
    super-resolves a slice of the same image concurrently. The batch is
    padded to a multiple of the mesh size.
    """
    f, h, w, c = burst.shape
    tiles = divide_burst(burst, psize, overlap)  # [Nt, F, T, T, C]
    nt = tiles.shape[0]
    bsz = tile_batch if tile_batch > 0 else nt

    n_dev = 1
    if mesh is not None:
        from fbanet_tpu.parallel.mesh import batch_sharding

        n_dev = int(np.prod(mesh.devices.shape))
        sharding = batch_sharding(mesh)

    outs = []
    for start in range(0, nt, bsz):
        chunk = tiles[start:start + bsz]
        # pad to the jitted shape (bsz when chunked) rounded up to a multiple
        # of the mesh size so the batch axis shards evenly
        target = bsz if tile_batch > 0 else chunk.shape[0]
        target = -(-target // n_dev) * n_dev
        pad = target - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        arr = jnp.asarray(chunk)
        if mesh is not None:
            arr = jax.device_put(arr, sharding)
        out = np.asarray(apply_fn(arr))
        if pad:
            out = out[:-pad]
        outs.append(out)
    hr_tiles = np.concatenate(outs)  # [Nt, T*scale, T*scale, C]
    return merge_tiles(hr_tiles, h * scale, w * scale, psize * scale,
                       overlap * scale)


def main(argv: list[str] | None = None) -> None:
    """CLI parity with `python test_in_any_resolution.py` (reference:
    fba_net/test_in_any_resolution.py)."""
    from fbanet_tpu.config import add_cli_args, from_cli
    from fbanet_tpu.data.realbsr import RealBSRDataset
    from fbanet_tpu.models import init_model
    from fbanet_tpu.utils.checkpoint import load_params

    parser = add_cli_args(argparse.ArgumentParser(description="tiled inference"))
    parser.add_argument("--psize", type=int, default=80)
    parser.add_argument("--overlap", type=int, default=40)
    parser.add_argument("--result_dir", type=str, default="./results_tiled")
    args = parser.parse_args(argv)
    cfg = from_cli(args)

    tile = args.psize + 2 * args.overlap
    mcfg = cfg.model.replace(img_size=tile)
    model, params = init_model(mcfg, jax.random.key(0))
    weights = cfg.eval.weights or cfg.train.pretrain_weights
    if weights:
        params = load_params(weights, params)

    from fbanet_tpu.train import to_unit_f32

    @jax.jit
    def apply_fn(batch):
        batch = to_unit_f32(batch)
        return jnp.clip(model.apply(params, batch, deterministic=True), 0.0, 1.0)

    online_align = cfg.data.online_align
    if online_align != "none":
        # register the FULL burst to frame 0 before tiling (the reference's
        # online DALI graph registers whole frames before any cropping,
        # fba_net/pipeline/real_bsr_iterator.py:121-166). Per-tile alignment
        # would instead estimate an independent transform per tile and could
        # disagree across tile seams. One jitted call per distinct image
        # shape; tiles then carry already-f32 aligned values (to_unit_f32
        # passes floats through).
        from fbanet_tpu.ops.registration import online_register

        @jax.jit
        def align_full(burst):  # [F, H, W, C] storage or f32
            return online_register(to_unit_f32(burst)[None], online_align)[0]

    from fbanet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()

    ds = RealBSRDataset(cfg.data.dataroot, split="test", layout=cfg.data.layout,
                        burst_size=cfg.data.burst_size, crop_size=0,
                        channels=cfg.data.channels, augment=False,
                        wire_dtype=cfg.data.wire_dtype)
    out_dir = Path(args.result_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    for i in range(len(ds)):
        sample = ds.load(i)
        if online_align != "none":
            sample["LR"] = np.asarray(align_full(jnp.asarray(sample["LR"])))
        sr = tiled_forward(apply_fn, sample["LR"], psize=args.psize,
                           overlap=args.overlap, scale=cfg.data.scale,
                           mesh=mesh)
        if sr.shape[-1] == 4:
            # RAW output: save the packed prediction (npy) plus a display
            # RGB rendered through the reference's post-processing
            # (fba_net/utils/post_processing_vis.py:5-43)
            from fbanet_tpu.utils.raw import postprocess_raw, to_uint8

            np.save(out_dir / f"{sample['burst_name']}.npy", sr)
            arr = to_uint8(postprocess_raw(jnp.asarray(sr), return_rgb=True))
        else:
            arr = np.clip(sr * 255.0 + 0.5, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(out_dir / f"{sample['burst_name']}.png")
        print(f"[{i + 1}/{len(ds)}] {sample['burst_name']} -> {arr.shape}")


if __name__ == "__main__":
    main()
