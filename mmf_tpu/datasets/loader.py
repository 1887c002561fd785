"""Host-side data loading: the torch-DataLoader replacement.

The reference leans on torch DataLoader worker processes + DistributedSampler
(utils/build.py:264-397). Here: a map-style dataset is sharded per process,
shuffled with an epoch-seeded RNG, batched through BatchCollator into
fixed-shape SampleLists, and prefetched on a background thread so host
preprocessing overlaps device compute (the MpDeviceLoader analog). drop_last
is always on — constant shapes are what keep XLA from recompiling.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import numpy as np

from mmf_tpu.common.sample import SampleList


class EpochSampler:
    """Deterministic per-epoch shuffling + per-process sharding
    (DistributedSampler analog)."""

    def __init__(self, dataset_size: int, shuffle: bool = True, seed: int = 0,
                 num_replicas: int = 1, rank: int = 0):
        self.dataset_size = dataset_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(self.dataset_size)
        else:
            order = np.arange(self.dataset_size)
        # pad to a multiple of num_replicas by wrapping (torch
        # DistributedSampler semantics): every rank yields the SAME
        # number of indices, or multi-host collectives desynchronize
        # when one rank produces an extra batch
        total = self._padded_size()
        if total > order.shape[0]:
            extra = total - order.shape[0]
            order = np.concatenate([order, order[:extra]])
        # shard: rank takes every num_replicas-th element
        return iter(order[self.rank :: self.num_replicas].tolist())

    def _padded_size(self) -> int:
        r = self.num_replicas
        return ((self.dataset_size + r - 1) // r) * r

    def __len__(self) -> int:
        return self._padded_size() // self.num_replicas


class DataLoader:
    """Batched iterator over a map-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Optional[Callable] = None,
        sampler: Optional[EpochSampler] = None,
        shuffle: bool = False,
        drop_last: bool = True,
        pad_last: bool = False,
        num_workers: int = 2,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn or (lambda b: SampleList(b))
        if sampler is None:
            sampler = EpochSampler(len(dataset), shuffle=shuffle, seed=seed)
        self.sampler = sampler
        self.drop_last = drop_last
        # pad the final short batch up to batch_size by cycling its indices
        # (keeps shapes constant for XLA); the true row count rides on the
        # SampleList so eval can trim before metrics
        self.pad_last = pad_last and not drop_last
        self.num_workers = max(0, num_workers)
        self.prefetch = prefetch
        self.current_epoch = 0

    def __len__(self) -> int:
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.current_epoch = epoch
        self.sampler.set_epoch(epoch)

    def _batches_of_indices(self):
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def _load_batch(self, indices):
        n_valid = len(indices)
        if self.pad_last and n_valid < self.batch_size:
            indices = [indices[i % n_valid]
                       for i in range(self.batch_size)]
        samples = [self.dataset[i] for i in indices]
        batch = self.collate_fn(samples)
        if len(indices) != n_valid:
            object.__setattr__(batch, "_true_batch_size", n_valid)
        return batch

    def __iter__(self):
        if self.num_workers == 0 or self.prefetch == 0:
            for indices in self._batches_of_indices():
                yield self._load_batch(indices)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error_holder = []
        # set when the consumer abandons the iterator (GeneratorExit from
        # a `break`, or the multi-loader reigniting an exhausted dataset)
        # so the producer never stays blocked forever on a full queue
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    futures = []
                    for indices in self._batches_of_indices():
                        if stop.is_set():
                            break
                        futures.append(pool.submit(self._load_batch, indices))
                        # bound in-flight futures
                        while len(futures) >= self.prefetch:
                            if not _put(futures.pop(0).result()):
                                break
                    for f in futures:
                        if not _put(f.result()):
                            f.cancel()
            except Exception as e:  # propagate to consumer
                error_holder.append(e)
            finally:
                _put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            stop.set()
            # drain so a blocked producer can reach the stop check
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5)
        if error_holder:
            raise error_holder[0]


def build_dataloader_and_sampler(dataset, training_config, dataset_type="train",
                                 batch_size=None, seed=0):
    """Reference utils/build.py:264-340 analog."""
    from mmf_tpu.common.batch_collator import BatchCollator
    from mmf_tpu.utils.distributed import get_rank, get_world_size

    if batch_size is None:
        from mmf_tpu.utils.general import get_batch_size

        batch_size = get_batch_size()

    shuffle = dataset_type == "train"
    sampler = EpochSampler(
        len(dataset),
        shuffle=shuffle,
        seed=seed,
        num_replicas=get_world_size(),
        rank=get_rank(),
    )
    collate = BatchCollator(
        getattr(dataset, "dataset_name", "unknown"),
        getattr(dataset, "dataset_type", dataset_type),
    )
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        collate_fn=collate,
        sampler=sampler,
        # train: constant-shape steps, tail dropped (epoch reshuffles cover
        # it); eval: pad the tail batch and trim after device_get so every
        # sample is scored exactly once
        drop_last=dataset_type == "train",
        pad_last=dataset_type != "train",
        num_workers=training_config.get("num_workers", 4),
    )
    loader.dataset_name = getattr(dataset, "dataset_name", "unknown")
    loader.dataset_type = dataset_type
    return loader, sampler
