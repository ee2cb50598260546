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


def _batch_worker_main(task_q, result_q, payload):
    """Process-pool worker: builds numpy-leaf batches end to end.

    Workers are device-free by contract (they emit numpy-leaf batches);
    pin jax to the host platform *before any array op* so a stray jnp
    call can never initialize an accelerator client in every worker —
    on a single-tenant TPU that deadlocks the whole pool against the
    trainer process that owns the chip."""
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized (e.g. fork start method)
    ld = TrainLoader(
        payload["dataset"], payload["batch_size"], payload["pad_spec"],
        seed=payload["seed"], sync_scale=payload["sync_scale"],
        scale_range=payload["scale_range"], num_workers=0,
        process_index=payload["process_index"],
        process_count=payload["process_count"],
        mesh_shards=payload["mesh_shards"],
        host_plan_cfg=payload["host_plan_cfg"])
    ld._device = False
    use_shm = payload.get("shm_transport", True)
    while True:
        task = task_q.get()
        if task is None:
            return
        seq = task[0]
        try:
            b = ld._make_batch(*task[1:])
            if use_shm:
                from segdino3d_tpu.data.shm_transport import encode
                b = encode(b)
            result_q.put((seq, b))
        except BaseException as e:
            result_q.put((seq, e))


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
                 host_plan_cfg: Optional[Dict] = None,
                 worker_mode: str = "thread",
                 shm_transport: bool = True):
        """``mesh_shards`` > 1 emits per-device stacked batches
        (``collate.stack_batches``) for shard_map data parallelism;
        ``host_plan_cfg`` (voxel_size, voxel_cap, ...) attaches host-built
        sparse-conv plans to every (sub-)batch.

        ``worker_mode``: "sync" (build batches inline), "thread"
        (pipelined producer threads + per-record thread pool), or
        "process" (spawned worker processes building numpy-leaf batches —
        sidesteps the GIL, which binds this aug pipeline; see
        tests/test_loader.py and STATUS.md measurements).

        ``shm_transport`` (process mode only): ship batches through
        POSIX shared memory instead of pickling them through the result
        queue's pipe — the parent gets zero-copy views (see
        ``data/shm_transport.py``); auto-falls back to queue pickling
        for tiny batches or if shm is unavailable."""
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
        self.worker_mode = worker_mode if num_workers > 0 else "sync"
        self.shm_transport = shm_transport
        self._device = True
        if mesh_shards > 1:
            assert batch_size % mesh_shards == 0, (batch_size, mesh_shards)

    def _index_stream(self) -> Iterator[List[int]]:
        """Epoch-shuffled global index stream, sharded over processes
        (DistributedSampler semantics: same seed -> disjoint shards).

        Leftover indices (shard smaller than, or not divisible by, the
        batch size) carry over into the next epoch — without this, a shard
        shorter than one batch would spin forever yielding nothing."""
        epoch = 0
        n = len(self.dataset)
        carry: List[int] = []
        pos = 0
        while True:
            rng = np.random.RandomState(self.seed + epoch)
            perm = rng.permutation(n)
            carry.extend(int(x)
                         for x in perm[self.process_index::self.process_count])
            while len(carry) >= self.batch_size:
                yield carry[:self.batch_size], epoch, pos
                carry = carry[self.batch_size:]
                pos += self.batch_size
            epoch += 1
            pos = 0

    def _make_batch(self, idxs, epoch, pos):
        # batch-level shared scale, identical across processes for the same
        # (epoch, pos) — the reference's sync-scale generator contract
        scale = None
        if self.sync_scale:
            srng = np.random.RandomState(
                hash((self.seed, epoch, pos)) % (2 ** 31))
            scale = float(srng.uniform(*self.scale_range))

        def load_one(k_idx):
            k, idx = k_idx
            rng = np.random.RandomState(
                hash((self.seed, epoch, pos, k, self.process_index)) % (2 ** 31))
            return self.dataset.get_record(idx, rng, sync_scale=scale)

        if self._record_pool is not None:
            # record loading is dominated by GIL-releasing work (torch
            # tensor IO, numpy ufuncs, scipy elastic interpolation), so a
            # thread pool scales it
            records = list(self._record_pool.map(load_one, enumerate(idxs)))
        else:
            records = [load_one(ki) for ki in enumerate(idxs)]

        def one(recs):
            b = collate(recs, self.pad_spec, device=self._device)
            if self.host_plan_cfg:
                from segdino3d_tpu.data.collate import attach_host_plan
                b = attach_host_plan(b, recs, self.pad_spec,
                                     device=self._device,
                                     **self.host_plan_cfg)
            return b

        if self.mesh_shards <= 1:
            return one(records)
        from segdino3d_tpu.data.collate import stack_batches
        per = len(records) // self.mesh_shards
        return stack_batches([one(records[i * per:(i + 1) * per])
                              for i in range(self.mesh_shards)])

    def _iter_process(self):
        """Spawned worker processes each build complete numpy-leaf batches
        (records + collate + host C++ plan) — full parallelism for the
        GIL-bound augmentation/collate pipeline.  Workers never touch a
        jax backend (``device=False`` batches); arrays upload at dispatch
        in this process.  Batch order is preserved via sequence numbers."""
        import multiprocessing as mp

        from segdino3d_tpu.data.shm_transport import (Graveyard, decode,
                                                      track)

        ctx = mp.get_context("spawn")
        n_proc = self.num_workers
        task_q = ctx.Queue()
        result_q = ctx.Queue()
        payload = dict(
            dataset=self.dataset, batch_size=self.batch_size,
            pad_spec=self.pad_spec, seed=self.seed,
            sync_scale=self.sync_scale, scale_range=self.scale_range,
            process_index=self.process_index,
            process_count=self.process_count,
            mesh_shards=self.mesh_shards,
            host_plan_cfg=self.host_plan_cfg,
            shm_transport=self.shm_transport)
        procs = [ctx.Process(target=_batch_worker_main,
                             args=(task_q, result_q, payload), daemon=True)
                 for _ in range(n_proc)]
        for p in procs:
            p.start()
        stream = enumerate(self._index_stream())
        in_flight = 0
        graveyard = Graveyard()
        pending = {}
        try:
            for _ in range(n_proc + self.prefetch):
                seq, item = next(stream)
                task_q.put((seq, *item))
                in_flight += 1
            want = 0
            while True:
                while want not in pending:
                    seq, b = result_q.get()
                    pending[seq] = track(b)
                    in_flight -= 1
                b = pending.pop(want)
                if isinstance(b, BaseException):
                    raise b
                b, shm = decode(b)
                seq, item = next(stream)
                task_q.put((seq, *item))
                in_flight += 1
                graveyard.sweep()
                yield b
                graveyard.add(shm)
                want += 1
        finally:
            # Graceful stop: sentinels, then drain results WHILE joining —
            # a child exit blocks until its queue feeder flushes, so the
            # parent must keep reading or the join deadlocks.  Reads are
            # safe here because live workers only ever write complete
            # frames.  Only stragglers past the deadline get terminate(),
            # and the queue is never read after a terminate: a kill mid-
            # write leaves a truncated frame that would block the reader.
            import time as _time

            from segdino3d_tpu.data.shm_transport import ShmBatch
            import queue as _queue
            try:
                for _ in procs:
                    task_q.put_nowait(None)
            except Exception:
                pass
            deadline = _time.monotonic() + 15.0
            while (any(p.is_alive() for p in procs)
                   and _time.monotonic() < deadline):
                try:
                    seq, b = result_q.get(timeout=0.1)
                    pending.setdefault(seq, track(b))
                except (_queue.Empty, OSError, EOFError):
                    pass
                for p in procs:
                    if not p.is_alive():
                        p.join(timeout=0)
            terminated = False
            for p in procs:
                if p.is_alive():
                    p.terminate()
                    terminated = True
            if not terminated:
                while True:
                    try:
                        seq, b = result_q.get_nowait()
                        pending.setdefault(seq, track(b))
                    except (_queue.Empty, OSError, EOFError):
                        break
            # unlink undecoded in-flight descriptors (already unregistered
            # from the workers' trackers) so their segments aren't leaked
            import multiprocessing.shared_memory as _msm
            for item in pending.values():
                if isinstance(item, ShmBatch):
                    try:
                        _msm.SharedMemory(name=item.name).unlink()
                    except Exception:
                        pass
            graveyard.drain()

    @property
    def _record_pool(self):
        if self.num_workers <= 1 or self.worker_mode != "thread":
            return None
        pool = getattr(self, "_pool_obj", None)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            self._pool_obj = pool
        return pool

    def __iter__(self):
        if self.worker_mode == "sync" or self.num_workers <= 0:
            for idxs, epoch, pos in self._index_stream():
                yield self._make_batch(idxs, epoch, pos)
            return
        if self.worker_mode == "process":
            yield from self._iter_process()
            return

        # pipelined producers: `prefetch` batch builders run concurrently
        # (each fanning record loads over the shared thread pool); a
        # sequence-numbered reorder dict preserves the deterministic batch
        # order of the single-threaded stream.
        n_prod = max(1, min(self.prefetch, 4))
        q: queue.Queue = queue.Queue(maxsize=self.prefetch + n_prod)
        stop = threading.Event()
        lock = threading.Lock()
        stream = enumerate(self._index_stream())

        def producer():
            while not stop.is_set():
                with lock:
                    seq, item = next(stream)
                try:
                    q.put((seq, self._make_batch(*item)))
                except BaseException as e:   # surface in the consumer
                    q.put((seq, e))
                    return

        threads = [threading.Thread(target=producer, daemon=True)
                   for _ in range(n_prod)]
        for t in threads:
            t.start()
        try:
            pending = {}
            want = 0
            while True:
                while want not in pending:
                    seq, b = q.get()
                    pending[seq] = b
                b = pending.pop(want)
                if isinstance(b, BaseException):
                    raise b
                yield b
                want += 1
        finally:
            stop.set()


class EvalLoader:
    """Sequential batched eval loader; yields (records, SceneBatch).

    The reference evaluates bs=1 single-card (``evaluate_3d.py:35,45``) —
    this lifts that: scenes are grouped ``batch_size`` at a time, padded
    either to a fixed ``pad_spec`` or (with ``bucket_policy``) to the
    smallest bucketed capacities covering the batch, which bounds padding
    waste while keeping the number of compiled shapes small.
    ``host_plan_cfg`` attaches host-built sparse-conv plans (voxel caps
    auto-bucketed when the cfg omits ``voxel_cap``)."""

    def __init__(self, dataset, pad_spec: Optional[PadSpec] = None,
                 limit: Optional[int] = None, batch_size: int = 1,
                 bucket_policy=None, host_plan_cfg: Optional[Dict] = None,
                 mesh_shards: int = 1, prefetch: int = 1,
                 prescan_caps: bool = True,
                 cache_dir: Optional[str] = None,
                 process_index: int = 0, process_count: int = 1):
        """``mesh_shards`` > 1 emits per-device *stacked* batches (leading
        axis = shards) for the mesh-sharded predict
        (``evaluation.evaluate(mesh=...)``); a partial tail batch is padded
        by repeating the last scene — only the real records are returned,
        so the evaluator never sees the fillers.

        ``prefetch`` > 0 builds up to that many batches ahead on a
        background thread, overlapping host record-IO/collate/C++-plan
        work with the consumer's device step (the driver otherwise pays
        the full host build between every predict); 0 restores fully
        synchronous iteration.

        ``process_index``/``process_count``: multi-host (DCN) eval — the
        global batch sequence is sharded round-robin at BATCH granularity
        (process p serves global batches p, p+count, ...), so batch
        composition is identical to a single-process run and the gathered
        results merge to the same metrics
        (``evaluation.evaluate(gather_dir=...)``; the reference instead
        refuses multi-card eval, ``evaluate_3d.py:45``, and its object
        all_gather lives at ``segdino3d/utils/dist_utils.py:83-194``).
        The capacity prescan still covers the FULL set, so every process
        pins identical per-rung plan capacities.

        ``cache_dir``: persistent batch cache (``data/eval_cache.py``) —
        the val set is static and the whole host pipeline (record IO,
        val transform, collate, C++ plan) is deterministic, so the first
        pass persists each finished numpy-leaf batch and every later
        epoch / process start serves mmap views + device transfer only.
        The namespace key covers the dataset fingerprint, pad/bucket
        config and plan config; a mismatch rebuilds.  Cached iterations
        yield slim records (GT annotation arrays + ``n_points``) — what
        ``evaluation.evaluate`` consumes — not full scene records.

        ``prescan_caps``: one cheap count-only pass over the eval set
        before the first batch (cached for the loader's lifetime) pins
        ONE plan-capacity vector (voxel cap, per-level block caps, L0
        layout) per PadSpec rung — the whole val set then compiles to
        #occupied-rungs programs instead of one per distinct per-batch
        auto-bucketing outcome (measured: 48 val-sized scenes collapsed
        from 38 signatures to the rung count).  Active only with a
        ``bucket_policy`` and a ``host_plan_cfg`` that leaves ``voxel_cap``
        unset."""
        assert pad_spec is not None or bucket_policy is not None
        self.dataset = dataset
        self.pad_spec = pad_spec
        self.limit = limit
        self.batch_size = batch_size
        self.bucket_policy = bucket_policy
        self.host_plan_cfg = host_plan_cfg
        self.mesh_shards = mesh_shards
        self.prefetch = prefetch
        self.prescan_caps = prescan_caps
        self.cache_dir = cache_dir
        self.process_index = process_index
        self.process_count = process_count
        self._rung_caps: Optional[Dict] = None
        self._cache_obj = None
        assert 0 <= process_index < process_count
        if mesh_shards > 1:
            assert batch_size % mesh_shards == 0, (batch_size, mesh_shards)

    def __len__(self):
        """Number of LOCAL batches (this process's round-robin shard)."""
        gb = -(-self.num_scenes // self.batch_size)
        return (gb - self.process_index
                + self.process_count - 1) // self.process_count

    @property
    def num_scenes(self):
        n = len(self.dataset)
        return min(n, self.limit) if self.limit else n

    def _prescan(self):
        """Pin one plan-capacity vector per PadSpec rung (see __init__)."""
        if self._rung_caps is not None:
            return self._rung_caps
        cfg = self.host_plan_cfg or {}
        if (not self.prescan_caps or self.bucket_policy is None
                or not cfg or cfg.get("voxel_cap")
                or cfg.get("block_caps")):
            self._rung_caps = {}
            return self._rung_caps
        from segdino3d_tpu.data.collate import _plan_coords
        from segdino3d_tpu.ops.host_plan import (l0_dense_budget_bytes,
                                                 l0_dense_fits,
                                                 overflow_bucket,
                                                 probe_plan_counts,
                                                 stem_compact_enabled,
                                                 stem_slots_default)

        edges = list(cfg.get("block_edges") or [])
        num_levels = cfg.get("num_levels", 5)
        stem_kernel = cfg.get("stem_kernel", 5)
        # probe the compacted stem's overflow only when that stem is
        # actually in play (opt-in; measured slower than the plain
        # 125-gather stem on v5e — see host_plan.build_host_plan)
        probe_stem = (stem_kernel != 3
                      and stem_compact_enabled(cfg.get("stem_compact")))
        stem_d = stem_slots_default(cfg.get("stem_compact_slots"))
        per_rung: Dict = {}
        rng = np.random.RandomState(0)
        n = self.num_scenes
        per = (self.batch_size // self.mesh_shards
               if self.mesh_shards > 1 else self.batch_size)
        for lo in range(0, n, self.batch_size):
            recs = [self.dataset.get_record(i, rng)
                    for i in range(lo, min(lo + self.batch_size, n))]
            if self.mesh_shards > 1 and len(recs) < self.batch_size:
                recs = recs + [recs[-1]] * (self.batch_size - len(recs))
            spec = self.bucket_policy.spec_for(recs)
            for s0 in range(0, len(recs), per):
                sub = recs[s0:s0 + per]
                batch = collate(sub, spec, device=False)
                coords, valid, bidx = _plan_coords(
                    batch, sub, cfg.get("voxel_size", 0.02),
                    cfg.get("exact_min_shift", False))
                voxels, blocks, stem_ov = probe_plan_counts(
                    coords.reshape(-1, 3), bidx, valid.reshape(-1),
                    edges, num_levels,
                    stem_kernel=stem_kernel if probe_stem else 0,
                    stem_slots=stem_d)
                acc = per_rung.setdefault(
                    spec, [np.zeros(num_levels, np.int64),
                           np.zeros(num_levels, np.int64), 0])
                np.maximum(acc[0], voxels, out=acc[0])
                np.maximum(acc[1], blocks, out=acc[1])
                acc[2] = max(acc[2], stem_ov)
        out: Dict = {}
        for spec, (voxels, blocks, stem_ov) in per_rung.items():
            voxel_cap = -(-int(voxels[0]) // 256) * 256
            block_caps = [0 if (i >= len(edges) or not edges[i])
                          else -(-int(b) // 16) * 16
                          for i, b in enumerate(blocks)]
            rung_edges = list(edges) if edges else None
            if (rung_edges and rung_edges[0] and not l0_dense_fits(
                    block_caps[0], rung_edges[0],
                    budget=l0_dense_budget_bytes())):
                # whole rung runs level 0 as gather — decided here so
                # every scene in the rung compiles the same program
                rung_edges[0] = 0
                block_caps[0] = 0
            out[spec] = dict(voxel_cap=voxel_cap, block_caps=block_caps,
                             block_edges=rung_edges,
                             # measured per-level caps: levels 1+ stop
                             # paying ratio padding (collate.attach_host_plan)
                             level_caps=[int(v) for v in voxels])
            if probe_stem:
                out[spec]["stem_ov_cap"] = overflow_bucket(
                    max(4096, int(stem_ov)))
        self._rung_caps = out
        return out

    def _cache(self):
        if self.cache_dir is None:
            return None
        if self._cache_obj is None:
            from segdino3d_tpu.data import eval_cache as ec
            cfg = dict(
                ds=ec.dataset_fingerprint(self.dataset),
                limit=self.limit, batch_size=self.batch_size,
                mesh_shards=self.mesh_shards,
                spec=repr(self.pad_spec), bucket=repr(self.bucket_policy),
                plan=ec.stable_repr(self.host_plan_cfg),
                prescan=self.prescan_caps,
                proc=(self.process_index, self.process_count))
            self._cache_obj = ec.EvalBatchCache(
                self.cache_dir, ec.config_key(**cfg),
                config_note=ec.stable_repr(cfg))
        return self._cache_obj

    def _build_one(self, recs, spec, device: Optional[bool] = None):
        # numpy leaves when sharding: stack_batches restacks host-side and
        # evaluate() device_puts straight to the sharded layout — a jnp
        # round-trip through device 0 would double the transfer
        dev = (self.mesh_shards <= 1) if device is None else device
        batch = collate(recs, spec, device=dev)
        if self.host_plan_cfg:
            from segdino3d_tpu.data.collate import attach_host_plan
            cfg = dict(self.host_plan_cfg)
            cfg.update(self._prescan().get(spec, {}))
            batch = attach_host_plan(batch, recs, spec, device=dev, **cfg)
        return batch

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._iter_sync()
            return
        # bounded background builder: batch i+1 is assembled while the
        # consumer runs the device step on batch i (order preserved — a
        # single producer thread over the sequential stream)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _END = object()

        def _put(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for item in self._iter_sync():
                    if not _put(item):
                        return
                _put(_END)
            except BaseException as e:   # surface in the consumer
                _put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def _iter_sync(self):
        cache = self._cache()
        if cache is None:
            yield from self._iter_build()
        elif cache.complete():
            yield from cache.iter_batches()
        else:
            # first pass: build numpy-leaf batches (cacheable as-is; jit
            # transfers them at dispatch exactly like device leaves) and
            # persist each while yielding it
            yield from cache.write_through(self._iter_build(device=False))

    def _iter_build(self, device: Optional[bool] = None):
        rng = np.random.RandomState(0)
        n = self.num_scenes
        for gi, lo in enumerate(range(0, n, self.batch_size)):
            if gi % self.process_count != self.process_index:
                continue
            recs = [self.dataset.get_record(i, rng)
                    for i in range(lo, min(lo + self.batch_size, n))]
            n_real = len(recs)
            padded = recs
            if self.mesh_shards > 1 and n_real < self.batch_size:
                padded = recs + [recs[-1]] * (self.batch_size - n_real)
            spec = (self.bucket_policy.spec_for(padded)
                    if self.bucket_policy is not None else self.pad_spec)
            if self.mesh_shards <= 1:
                yield recs, self._build_one(recs, spec, device=device)
                continue
            from segdino3d_tpu.data.collate import stack_batches
            per = self.batch_size // self.mesh_shards
            batch = stack_batches(
                [self._build_one(padded[i * per:(i + 1) * per], spec,
                                 device=device)
                 for i in range(self.mesh_shards)])
            yield recs, batch
