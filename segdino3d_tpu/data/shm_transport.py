"""Zero-copy shared-memory transport for loader worker batches.

The process-pool loader (``loader.TrainLoader(worker_mode="process")``)
originally returned batches through a ``multiprocessing.Queue``, which
pickles every array in the worker, streams it through an OS pipe in
small chunks, and unpickles (copies) it again in the parent — three
copies plus syscall overhead per batch, and a real 100+ MB cost per
step at production scene sizes (the 2D feature tensors dominate).

This module replaces that with pickle protocol-5 out-of-band buffers
backed by POSIX shared memory:

* the worker pickles the batch pytree with ``buffer_callback`` so every
  C-contiguous numpy leaf is extracted as a raw buffer instead of being
  serialized in-band, memcpys the buffers into one
  ``multiprocessing.shared_memory`` segment, and sends only a tiny
  descriptor (segment name + in-band pickle + offsets) through the queue;
* the parent attaches the segment and ``pickle.loads(..., buffers=...)``
  reconstructs the arrays as *views into the shared mapping* — no copy
  at all on the consumer side; ``jax.jit`` / ``device_put`` read the
  leaves straight out of shared memory when uploading to the device.

Lifetime protocol (the subtle part):

* the worker ``close()``s its handle right after writing and unregisters
  the segment from its resource tracker — ownership transfers to the
  parent with the descriptor;
* the parent registers the name with *its* resource tracker on attach
  (so an abnormal parent exit still reclaims it) and ``unlink()``s the
  name immediately after decoding — POSIX keeps the memory alive until
  the last mapping closes, so the views stay valid while nothing leaks
  even if the parent later dies without cleanup;
* ``close()`` on the mapping raises ``BufferError`` while array views
  are alive, so the loader parks decoded segments in a small graveyard
  and retries the close each iteration — by then the consumer has moved
  on to the next batch and the mapping releases.

No reference counterpart: torch's DataLoader gets this from
``torch.multiprocessing``'s shared-memory tensor serialization
(``/root/reference`` relies on it implicitly via ``num_workers``); this
is the numpy/JAX-native equivalent.
"""
from __future__ import annotations

import os
import pickle
from multiprocessing import resource_tracker, shared_memory
from typing import Any, List, Optional, Tuple

# below this many payload bytes the segment setup costs more than the
# pipe copy it saves — send tiny batches inline through the queue
# (env override so tests can force the shm path on tiny batches)
MIN_SHM_BYTES = int(os.environ.get("SEGDINO_SHM_MIN_BYTES", 1 << 20))


class _Segment(shared_memory.SharedMemory):
    """Parent-side mapping whose finalizer tolerates live consumer views.

    ``SharedMemory.__del__`` calls ``close()``, which raises
    ``BufferError`` while the consumer still holds array views into the
    mapping — at generator shutdown that surfaces as unraisable-exception
    noise.  The memory itself is reclaimed by the kernel at process exit
    regardless (the name is unlinked right after decode)."""

    def __del__(self):
        try:
            super().__del__()
        except BufferError:
            pass


class ShmBatch:
    """Queue-side descriptor: everything needed to rebuild the batch."""

    __slots__ = ("name", "payload", "offsets")

    def __init__(self, name: str, payload: bytes,
                 offsets: List[Tuple[int, int]]):
        self.name = name
        self.payload = payload
        self.offsets = offsets


def encode(obj: Any, min_bytes: int = MIN_SHM_BYTES):
    """Worker side: return ``obj`` itself (small) or a ``ShmBatch``.

    Falls back to returning ``obj`` unchanged if shared memory is
    unavailable, so the loader degrades to plain queue pickling.
    """
    buffers: List[pickle.PickleBuffer] = []
    payload = pickle.dumps(obj, protocol=5, buffer_callback=buffers.append)
    try:
        # raw() requires C-contiguity; numpy emits PickleBuffers for
        # F-contiguous arrays too, which must fall back to queue pickling
        raws = [b.raw().cast("B") for b in buffers]
    except BufferError:
        return obj
    total = sum(r.nbytes for r in raws)
    if total < min_bytes:
        return obj
    try:
        shm = shared_memory.SharedMemory(create=True, size=total)
    except OSError:
        return obj
    offsets: List[Tuple[int, int]] = []
    pos = 0
    for r in raws:
        n = r.nbytes
        shm.buf[pos:pos + n] = r
        offsets.append((pos, n))
        pos += n
    name = shm.name
    # hand ownership to the parent: without this, the worker's resource
    # tracker would also try to unlink the name at shutdown and warn
    try:
        resource_tracker.unregister(shm._name, "shared_memory")
    except Exception:
        pass
    shm.close()
    return ShmBatch(name, payload, offsets)


def track(item: Any):
    """Register a received descriptor's segment with THIS process's
    resource tracker.  Call at queue-receipt time: between the worker's
    ``unregister`` and here nobody owns the segment, so registering as
    early as possible means even a hard parent kill (SIGTERM skips
    ``finally``) leaves the tracker to unlink it.  ``unlink()`` (in
    ``decode`` / the loader's shutdown sweep) unregisters the same name,
    keeping the tracker balanced."""
    if isinstance(item, ShmBatch):
        name = item.name if item.name.startswith("/") else "/" + item.name
        try:
            resource_tracker.register(name, "shared_memory")
        except Exception:
            pass
    return item


def decode(item: Any):
    """Parent side: return ``(batch, shm_or_None)``.

    When ``item`` is a ``ShmBatch`` the returned batch's array leaves are
    views into the shared mapping; the segment name is already unlinked,
    and the caller must keep the returned ``SharedMemory`` object alive
    until the consumer drops the arrays, then ``close()`` it (see
    ``Graveyard``).  Callers that received ``item`` from a worker queue
    should have passed it through ``track`` first.
    """
    if not isinstance(item, ShmBatch):
        return item, None
    track(item)  # idempotent (tracker cache is a set); pairs with unlink
    shm = _Segment(name=item.name)
    views = [shm.buf[off:off + n] for off, n in item.offsets]
    batch = pickle.loads(item.payload, buffers=views)
    del views
    shm.unlink()  # name gone; memory lives until the mapping closes
    return batch, shm


class Graveyard:
    """Deferred ``close()`` of decoded segments.

    ``close()`` raises ``BufferError`` while the consumer still holds
    array views into the mapping, so retire segments lazily: ``add``
    after yielding a batch, ``sweep`` once per iteration, ``drain`` on
    generator shutdown (best effort — an unclosed mapping is reclaimed
    by the kernel at process exit since the name is already unlinked).
    """

    def __init__(self):
        self._pending: List[shared_memory.SharedMemory] = []

    def add(self, shm: Optional[shared_memory.SharedMemory]):
        if shm is not None:
            self._pending.append(shm)

    def sweep(self):
        kept = []
        for shm in self._pending:
            try:
                shm.close()
            except BufferError:
                kept.append(shm)
        self._pending = kept

    def drain(self):
        self.sweep()
        self._pending.clear()
