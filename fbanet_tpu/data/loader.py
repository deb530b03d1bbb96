"""Host-side burst loader: multi-worker decode + double-buffered prefetch.

The TPU-native replacement for the reference's DALI executor + nvJPEG decode
(SURVEY.md §2.4 N5/N6; reference: fba_net/pipeline/real_bsr_iterator.py:26-95).
TPUs have no on-device decode hardware, so throughput comes from parallel
host workers (cv2's PNG decode releases the GIL, so a thread pool gives real
parallelism), batch assembly off the step path, and a bounded prefetch queue
that keeps `prefetch_depth` batches in flight while the device computes —
mirroring DALI's `prefetch_queue_depth=2` async executor.

`device_put` targeting a `NamedSharding` places each batch directly into HBM
sharded across the data-parallel mesh (replacing DALI's GPU staging).
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Iterator
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

from fbanet_tpu.data.realbsr import RealBSRDataset


class BurstLoader:
    """Iterate epochs of batched bursts from a `RealBSRDataset`.

    drop_last mirrors the reference: True for train (DataLoader(drop_last=True),
    fba_net/train.py.bak:129-131; also the DALI shard semantics), False for eval.
    """

    def __init__(
        self,
        dataset: RealBSRDataset,
        *,
        batch_size: int,
        num_workers: int = 8,
        prefetch_depth: int = 2,
        drop_last: bool | None = None,
        sharding: jax.sharding.Sharding | None = None,
        pad_last: bool = False,
        seed: int = 0,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        # NB: keep worker count independent of os.cpu_count() — even on a
        # 1-core host a swept measurement shows more workers win once the
        # allocator is warm (16 workers: 166 bursts/s warm vs 29 with 1;
        # apparent 1-worker advantages in fresh processes were one-time
        # page-fault warmup, not steady state)
        self.num_workers = max(1, num_workers)
        self.prefetch_depth = max(1, prefetch_depth)
        self.drop_last = (dataset.split == "train") if drop_last is None else drop_last
        self.sharding = sharding
        # pad the final partial batch to the full batch size by repeating its
        # last sample, and report the real count as batch["valid"]: keeps the
        # jitted eval shape constant AND the batch axis divisible by the mesh
        # when eval batches are sharded (data-parallel eval; the reference
        # even evaluated under DataParallel, fba_net/test.py:55). Consumers
        # slice per-image results to [:valid]; burst_name stays unpadded.
        self.pad_last = pad_last
        self.seed = seed

    def __len__(self) -> int:
        n = self.dataset.shard_size
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int, start_step: int = 0) -> Iterator[dict]:
        """Yield batches {'LR': [B,F,h,w,3], 'HR': [B,H,W,3], 'burst_name': list}.

        `start_step` skips the first N batches *without decoding them* while
        keeping every sample's absolute epoch position — so a mid-epoch
        resume sees the identical sample sequence and augmentation rng as the
        uninterrupted run (the DALI `enable_checkpointing` capability,
        reference: fba_net/pipeline/real_bsr_iterator.py:34-35).
        """
        indices = self.dataset.epoch_indices(epoch)
        if self.drop_last:
            indices = indices[: (len(indices) // self.batch_size) * self.batch_size]
        if len(indices) == 0:
            return

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch_depth)
        stop = threading.Event()

        def load_one(pos_idx: tuple[int, int]) -> dict:
            pos, idx = pos_idx
            # per-sample rng: deterministic in (seed, epoch, position)
            rng = np.random.default_rng(
                (self.seed, epoch, int(pos)))
            return self.dataset.load(int(idx), rng)

        def producer() -> None:
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for start in range(start_step * self.batch_size,
                                       len(indices), self.batch_size):
                        if stop.is_set():
                            return
                        chunk = [(start + o, i) for o, i in
                                 enumerate(indices[start:start + self.batch_size])]
                        samples = list(pool.map(load_one, chunk))
                        valid = len(samples)
                        if self.pad_last and valid < self.batch_size:
                            samples = samples + [samples[-1]] * (
                                self.batch_size - valid)
                        batch = {
                            "LR": np.stack([s["LR"] for s in samples]),
                            "burst_name": [s["burst_name"]
                                           for s in samples[:valid]],
                        }
                        if self.pad_last:
                            batch["valid"] = valid
                        if "HR" in samples[0]:  # absent for GT-free test data
                            batch["HR"] = np.stack([s["HR"] for s in samples])
                        if self.sharding is not None:
                            # stage into HBM from the producer: the wire
                            # transfer of batch N+1 overlaps the device's
                            # compute on batch N (and the next decode) —
                            # done at yield time it serialized with the
                            # step (measured ~30% of the flagship step,
                            # docs/ROUND4.md §4b)
                            batch = {
                                k: (jax.device_put(v, self.sharding)
                                    if k in ("LR", "HR") else v)
                                for k, v in batch.items()
                            }
                        out_q.put(batch)
            except Exception as exc:  # propagate into the consumer
                out_q.put(exc)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            # drain while joining: the producer may be blocked in a full
            # out_q.put — and with producer-side device staging each queued
            # batch pins HBM, so a leaked thread would pin device memory
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    pass
                thread.join(timeout=0.1)
