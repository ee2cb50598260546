"""Persistent eval batch cache: build the val set's host work once.

Every host stage feeding eval — record IO (.bin/.pth reads), the
augmentation-free val transform, padded collate, and the C++ sparse-conv
plan — is a deterministic function of (scene bytes, loader config).  The
val set is static, so ``EvalLoader`` can build each finished numpy-leaf
batch ONCE, persist it here, and serve every later epoch / process start
with an mmap + device transfer only.  This is what lets the host input
pipeline keep up with a ~70 ms device step regardless of the box's core
count (round-4 measurement: 1.1 s/batch of 100%-deterministic host work
re-run per eval epoch).

Reference counterpart: none — its DataLoader re-runs the whole host
pipeline every eval pass (``/root/reference/utils/dataset_utils.py:233-283``,
``evaluation/evaluate_3d.py:18-37``), affordable against its per-scene CUDA
step but not against a 14 scenes/s chip.

Format: one ``batch_NNNNN.bin`` per loader batch::

    MAGIC(8) | header_len u64 LE | pickle(header) | 64B-aligned raw blobs

``header.skeleton`` is the pickled ``(records_aux, SceneBatch)`` pytree with
every array leaf swapped for an ``_ArrRef`` index into ``header.metas``
(offset, dtype, shape).  Loading unpickles the skeleton and grafts
zero-copy ``np.frombuffer`` views over one shared ``mmap`` back onto it —
no per-leaf file opens, no deserialization of array bytes.  A
``manifest.json`` is written LAST (tmp + rename), so a crashed build is
simply rebuilt; a config/data change rotates the namespace key and never
serves stale batches.
"""
from __future__ import annotations

import hashlib
import json
import mmap
import os
import pickle
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

CACHE_FORMAT_VERSION = 1
_MAGIC = b"SD3DEVC1"
_ALIGN = 64


class _ArrRef:
    """Placeholder for an array leaf inside the pickled skeleton."""

    __slots__ = ("i",)

    def __init__(self, i: int):
        self.i = i

    def __getstate__(self):
        return self.i

    def __setstate__(self, i):
        self.i = i


def _is_array(x) -> bool:
    if isinstance(x, np.ndarray):
        return True
    # jnp arrays (device leaves) — converted on save; loads are numpy
    return type(x).__module__.startswith("jax") and hasattr(x, "__array__")


def _pack_tree(tree) -> Tuple[Any, List[np.ndarray]]:
    import jax

    arrays: List[np.ndarray] = []

    def repl(x):
        if _is_array(x):
            a = np.asarray(x)
            if not a.flags["C_CONTIGUOUS"]:
                # NOT ascontiguousarray: that promotes 0-d to (1,)
                a = np.copy(a, order="C")
            arrays.append(a)
            return _ArrRef(len(arrays) - 1)
        return x

    skeleton = jax.tree_util.tree_map(repl, tree)
    return skeleton, arrays


def _unpack_tree(skeleton, arrays: List[np.ndarray]):
    import jax

    return jax.tree_util.tree_map(
        lambda x: arrays[x.i] if isinstance(x, _ArrRef) else x, skeleton)


def save_bundle(path: str, tree) -> None:
    """Serialize a numpy-leaf pytree; atomic (tmp + rename)."""
    skeleton, arrays = _pack_tree(tree)
    metas = []
    off = 0
    for a in arrays:
        off = -(-off // _ALIGN) * _ALIGN
        metas.append((off, a.dtype.str, a.shape))
        off += a.nbytes
    header = pickle.dumps(dict(version=CACHE_FORMAT_VERSION,
                               skeleton=skeleton, metas=metas),
                          protocol=pickle.HIGHEST_PROTOCOL)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        pos = 0
        for (o, _, _), a in zip(metas, arrays):
            if o > pos:
                f.write(b"\0" * (o - pos))
                pos = o
            if a.nbytes:   # 0-size views can't cast; nothing to write
                f.write(memoryview(a).cast("B"))
            pos += a.nbytes
    os.replace(tmp, path)


def load_bundle(path: str):
    """Deserialize; array leaves are zero-copy mmap views (read-only)."""
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError(f"bad cache magic in {path}")
        hlen = int.from_bytes(f.read(8), "little")
        header = pickle.loads(f.read(hlen))
        if header["version"] != CACHE_FORMAT_VERSION:
            raise ValueError(f"cache version {header['version']} != "
                             f"{CACHE_FORMAT_VERSION} in {path}")
        base = f.tell()
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        if hasattr(mm, "madvise"):
            # bulk readahead instead of per-page sync faults: a cold-cache
            # batch streams at disk bandwidth rather than faulting 4 KiB
            # at a time under the consumer
            mm.madvise(mmap.MADV_WILLNEED)
    arrays = []
    for off, dtype_str, shape in header["metas"]:
        dt = np.dtype(dtype_str)
        n = int(np.prod(shape, dtype=np.int64))
        arr = np.frombuffer(mm, dtype=dt, count=n,
                            offset=base + off).reshape(shape)
        arrays.append(arr)
    return _unpack_tree(header["skeleton"], arrays)


def stable_repr(obj) -> str:
    """Deterministic string form for key hashing (sorted dict keys)."""
    if isinstance(obj, dict):
        return "{" + ",".join(
            f"{k}:{stable_repr(obj[k])}" for k in sorted(obj)) + "}"
    if isinstance(obj, (list, tuple)):
        return "[" + ",".join(stable_repr(x) for x in obj) + "]"
    if isinstance(obj, float):
        return repr(round(obj, 12))
    return repr(obj)


def dataset_fingerprint(ds) -> str:
    """Identity of the underlying data: prefers an explicit
    ``cache_fingerprint()`` (the ScanNet readers stat every scene file);
    falls back to (class, len, scene id list)."""
    fp = getattr(ds, "cache_fingerprint", None)
    if callable(fp):
        return str(fp())
    return stable_repr((type(ds).__name__, len(ds),
                        getattr(ds, "scene_ids", None)))


def config_key(**kwargs) -> str:
    s = stable_repr(dict(kwargs, _v=CACHE_FORMAT_VERSION))
    return hashlib.sha1(s.encode()).hexdigest()[:16]


def record_aux(record: Dict) -> Dict:
    """The slice of an eval record the driver consumes after the batch:
    GT annotation arrays (``collate.eval_annotation``) + the raw point
    count (mask unpacking length in ``evaluation.evaluate``)."""
    aux = dict(n_points=int(record["points"].shape[0]),
               scene_id=record.get("scene_id", ""))
    for k in ("inst_merged", "semantic_masks"):
        if record.get(k) is not None:
            aux[k] = np.asarray(record[k])
    return aux


class EvalBatchCache:
    """One namespace (= one loader config) of cached eval batches."""

    def __init__(self, cache_dir: str, key: str, config_note: str = ""):
        self.dir = os.path.join(cache_dir, key)
        self.key = key
        self.config_note = config_note
        self._manifest: Optional[Dict] = None

    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    def complete(self) -> bool:
        if self._manifest is not None:
            return True
        try:
            with open(self._manifest_path()) as f:
                m = json.load(f)
        except (OSError, ValueError):
            return False
        if m.get("version") != CACHE_FORMAT_VERSION or m.get("key") != self.key:
            return False
        self._manifest = m
        return True

    def _batch_path(self, i: int) -> str:
        return os.path.join(self.dir, f"batch_{i:05d}.bin")

    @staticmethod
    def _readahead(path: str) -> None:
        """Queue async readahead of a whole cache file into the page cache
        (populates the per-file cache, so the later ``load_bundle`` maps
        warm pages even though this mapping is closed immediately)."""
        try:
            with open(path, "rb") as f:
                mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
                if hasattr(mm, "madvise"):
                    mm.madvise(mmap.MADV_WILLNEED)
                mm.close()
        except (OSError, ValueError):
            pass

    def iter_batches(self) -> Iterator[Tuple[List[Dict], Any]]:
        assert self.complete(), "iter_batches on an incomplete cache"
        n = self._manifest["n_batches"]
        for i in range(n):
            if i + 1 < n:
                # overlap the NEXT batch's disk read with the consumer's
                # device step on this one (works even with prefetch=0)
                self._readahead(self._batch_path(i + 1))
            yield load_bundle(self._batch_path(i))

    def write_through(self, built: Iterator[Tuple[List[Dict], Any]]
                      ) -> Iterator[Tuple[List[Dict], Any]]:
        """Persist each built (records, batch) pair while yielding it;
        the manifest lands only after the full pass, so interrupted builds
        rebuild from scratch rather than serving a truncated epoch."""
        os.makedirs(self.dir, exist_ok=True)
        n = 0
        for records, batch in built:
            aux = [record_aux(r) for r in records]
            save_bundle(self._batch_path(n), (aux, batch))
            n += 1
            yield records, batch
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(dict(version=CACHE_FORMAT_VERSION, key=self.key,
                           n_batches=n, config=self.config_note), f)
        os.replace(tmp, self._manifest_path())
        self._manifest = None
