"""Probe XLA TPU row-gather cost vs source-buffer size & index locality.

Informs the stem redesign: is the ~2.7ns/row gather cost (measured on a
23.6MB source) invariant to source size, or HBM-latency bound?
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--rows", type=int, default=92160)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    v = args.rows
    rng = np.random.RandomState(0)

    def timed(name, fn, *inputs):
        f = jax.jit(fn)
        jax.block_until_ready(f(*inputs))
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(*inputs))
            ts.append((time.time() - t0) / args.reps * 1000)
        print(f"{name}: {min(ts):.3f} ms/gather-of-{v}-rows "
              f"({min(ts) * 1e6 / v:.1f} ns/row)", flush=True)

    def gather_loop(src, idx_mat):
        # idx_mat: (n_g, V); sum of n_g gathers, fused adds
        def body(acc, idx):
            take = jnp.take(src, idx, axis=0, mode="fill", fill_value=0)
            return acc + take, None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((v, src.shape[1]), src.dtype), idx_mat)
        return acc

    n_g = 16
    for src_rows, label in [(v, "5.9MB"), (v * 4, "23.6MB"),
                            (v * 16, "94MB"), (v * 64, "378MB"),
                            (v * 125, "738MB")]:
        src = jnp.asarray(
            rng.randn(src_rows, 32).astype(np.float32), jnp.bfloat16)
        idx = jnp.asarray(
            rng.randint(0, src_rows, (n_g, v)).astype(np.int32))

        def rep(src, idx):
            def body(i, a):
                return a + gather_loop(src, idx).sum()
            return jax.lax.fori_loop(0, args.reps, body,
                                     jnp.zeros((), jnp.float32))

        f = jax.jit(rep)
        jax.block_until_ready(f(src, idx))
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(src, idx))
            ts.append((time.time() - t0) / args.reps / n_g * 1000)
        print(f"random idx, src {label}: {min(ts):.3f} ms/gather "
              f"({min(ts) * 1e6 / v:.1f} ns/row)", flush=True)

        # sorted (monotone) indices over the same source
        idx_s = jnp.asarray(np.sort(np.asarray(idx), axis=1))
        jax.block_until_ready(f(src, idx_s))
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(src, idx_s))
            ts.append((time.time() - t0) / args.reps / n_g * 1000)
        print(f"sorted idx, src {label}: {min(ts):.3f} ms/gather "
              f"({min(ts) * 1e6 / v:.1f} ns/row)", flush=True)

    # scatter-add (segment_sum) cost: overflow-pair handling
    for n_pairs in (65536, 262144):
        src = jnp.asarray(rng.randn(v * 4, 32).astype(np.float32),
                          jnp.bfloat16)
        sidx = jnp.asarray(rng.randint(0, v * 4, n_pairs).astype(np.int32))
        didx = jnp.asarray(
            np.sort(rng.randint(0, v, n_pairs)).astype(np.int32))

        def scat(src, sidx, didx):
            def body(i, a):
                rows = jnp.take(src, sidx, axis=0)
                return a + jax.ops.segment_sum(
                    rows, didx, num_segments=v + 1)[:v].sum()
            return jax.lax.fori_loop(0, args.reps, body,
                                     jnp.zeros((), jnp.float32))
        f = jax.jit(scat)
        jax.block_until_ready(f(src, sidx, didx))
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(src, sidx, didx))
            ts.append((time.time() - t0) / args.reps * 1000)
        print(f"gather+segsum {n_pairs} pairs: {min(ts):.3f} ms "
              f"({min(ts) * 1e6 / n_pairs:.1f} ns/pair)", flush=True)


if __name__ == "__main__":
    main()
