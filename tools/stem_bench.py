"""Microbenchmark harness for the k5 gather-GEMM stem (round-4 perf work).

The stem (k=5^3 offsets, 259->32 ch) is the single hottest op of the
inference step (~35 ms of 82 at round-3 close, STATUS.md).  This tool
times isolated stem variants on the real chip with an inner
``lax.fori_loop`` (REPS applications per dispatch) so the dev tunnel's
~2-4 ms per-call overhead amortizes away.

Variants are selected with --variants; each prints ms per application.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_inputs(n_scene_points=120000, voxel_cap=92160, seed=0):
    from segdino3d_tpu.data.synthetic import synthetic_scene
    from segdino3d_tpu.ops.host_plan import build_host_plan

    r = synthetic_scene(seed, n_points=n_scene_points, n_instances=24,
                        n_superpoints=1536, n_classes=180, feat_dim_2d=8)
    c = np.asarray(r["points"][:, :3], np.float32) / 0.02
    c -= np.floor(c.min(0) / 16.0) * 16.0
    bidx = np.zeros(c.shape[0], np.int32)
    valid = np.ones(c.shape[0], bool)
    caps = [voxel_cap, 36864, 13824, 5530, 2304]
    plan = build_host_plan(c, bidx, valid, caps, block_edges=[4, 4, 4, 4, 4],
                           stem_gather=True, stem_compact=False)
    return plan


def sort_plan_l0(plan, coords_by_key=True):
    """Permute level-0 voxel ids into spatial (block-major) order and remap
    the stem table; returns (perm, inv_perm, new_stem_nbr)."""
    hl = plan.levels[0]
    v_cap = hl.vox_slot.shape[0]
    nv = hl.num_voxels
    slot = hl.vox_slot.copy()          # block*64 + local: block-major order
    slot[slot < 0] = np.iinfo(np.int32).max
    order = np.argsort(slot[:nv], kind="stable")   # old ids in new order
    perm = np.concatenate([order, np.arange(nv, v_cap)]).astype(np.int32)
    inv = np.empty(v_cap, np.int32)
    inv[perm] = np.arange(v_cap, dtype=np.int32)
    old_nbr = plan.stem_nbr
    remapped = np.where(old_nbr >= 0, inv[np.clip(old_nbr, 0, v_cap - 1)], -1)
    new_nbr = np.ascontiguousarray(remapped[:, perm]).astype(np.int32)
    return perm, inv, new_nbr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--voxels", type=int, default=92160)
    ap.add_argument("--variants", default="current,sorted,g8,pure_gather,"
                    "pure_matmul,wide_gather")
    args = ap.parse_args()

    os.environ.setdefault("SEGDINO_COMPUTE_DTYPE", "bfloat16")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp

    from segdino3d_tpu.ops import sparse_conv as SC

    plan = build_inputs(voxel_cap=args.voxels)
    v = plan.stem_nbr.shape[1]
    nv = plan.levels[0].num_voxels
    print(f"# V_cap={v} valid={nv} n_off={plan.stem_nbr.shape[0]}",
          flush=True)

    rng = np.random.RandomState(0)
    cin, cout = 259, 32
    feats = jnp.asarray(rng.randn(v, cin).astype(np.float32),
                        dtype=jnp.bfloat16)
    w = jnp.asarray(rng.randn(125, cin, cout).astype(np.float32) * 0.01,
                    dtype=jnp.bfloat16)
    valid = jnp.arange(v) < nv
    nbr = jnp.asarray(plan.stem_nbr)
    _, _, nbr_sorted_np = sort_plan_l0(plan)
    nbr_sorted = jnp.asarray(nbr_sorted_np)

    def timed(name, op, *inputs):
        def loop(feats, *rest):
            def body(i, acc):
                out = op(feats * (1.0 + 1e-6 * i), *rest)
                return acc + out.sum()
            return jax.lax.fori_loop(0, args.reps, body,
                                     jnp.zeros((), jnp.float32))
        fn = jax.jit(loop)
        t0 = time.time()
        jax.block_until_ready(fn(feats, *inputs))
        compile_s = time.time() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            jax.block_until_ready(fn(feats, *inputs))
            times.append((time.time() - t0) / args.reps * 1000)
        print(f"{name}: {min(times):.2f} ms/app (compile {compile_s:.0f}s, "
              f"runs {['%.2f' % t for t in times]})", flush=True)

    sel = set(args.variants.split(","))

    if "current" in sel:
        timed("current(subm_conv)",
              lambda f: SC.subm_conv(f, nbr, w, valid))
    if "sorted" in sel:
        timed("sorted(block-major ids)",
              lambda f: SC.subm_conv(f, nbr_sorted, w, valid))

    def matmul_first(f, nbr_, g):
        n_off = 125
        n_groups = -(-n_off // g)
        pad = n_groups * g - n_off
        w_p = jnp.concatenate([w, jnp.zeros((pad, cin, cout), w.dtype)]) \
            if pad else w
        nbr_p = jnp.concatenate([nbr_, jnp.full((pad, v), -1, jnp.int32)]) \
            if pad else nbr_
        w_grp = w_p.reshape(n_groups, g, cin, cout).transpose(0, 2, 1, 3) \
            .reshape(n_groups, cin, g * cout).astype(f.dtype)
        nbr_grp = nbr_p.reshape(n_groups, g, v)
        out0 = jnp.zeros((v, cout), f.dtype)

        def body(acc, xs):
            w_g, nbr_g = xs
            y = jnp.dot(f, w_g,
                        preferred_element_type=jnp.float32).astype(f.dtype)
            for j in range(g):
                acc = acc + SC._gather_rows(
                    y[:, j * cout:(j + 1) * cout], nbr_g[j])
            return acc, None

        out, _ = jax.lax.scan(body, out0, (w_grp, nbr_grp))
        return jnp.where(valid[:, None], out, 0.0)

    if "g8" in sel:
        timed("g8(Y width 256)", lambda f: matmul_first(f, nbr, 8))
    if "g16" in sel:
        timed("g16(Y width 512)", lambda f: matmul_first(f, nbr, 16))
    if "g8_sorted" in sel:
        timed("g8 sorted", lambda f: matmul_first(f, nbr_sorted, 8))

    def matmul_first_tree(f, nbr_, g):
        # like matmul_first but the g per-step gathers reduce as a
        # balanced tree (one wide fusion) instead of a sequential chain
        n_off = 125
        n_groups = -(-n_off // g)
        pad = n_groups * g - n_off
        w_p = jnp.concatenate([w, jnp.zeros((pad, cin, cout), w.dtype)]) \
            if pad else w
        nbr_p = jnp.concatenate([nbr_, jnp.full((pad, v), -1, jnp.int32)]) \
            if pad else nbr_
        w_grp = w_p.reshape(n_groups, g, cin, cout).transpose(0, 2, 1, 3) \
            .reshape(n_groups, cin, g * cout).astype(f.dtype)
        nbr_grp = nbr_p.reshape(n_groups, g, v)
        out0 = jnp.zeros((v, cout), f.dtype)

        def body(acc, xs):
            w_g, nbr_g = xs
            y = jnp.dot(f, w_g,
                        preferred_element_type=jnp.float32).astype(f.dtype)
            parts = [SC._gather_rows(y[:, j * cout:(j + 1) * cout],
                                     nbr_g[j]) for j in range(g)]
            while len(parts) > 1:
                parts = [parts[i] + parts[i + 1]
                         if i + 1 < len(parts) else parts[i]
                         for i in range(0, len(parts), 2)]
            return acc + parts[0], None

        out, _ = jax.lax.scan(body, out0, (w_grp, nbr_grp))
        return jnp.where(valid[:, None], out, 0.0)

    if "g8tree" in sel:
        timed("g8tree(balanced adds)",
              lambda f: matmul_first_tree(f, nbr, 8))
    if "g16tree" in sel:
        timed("g16tree(balanced adds)",
              lambda f: matmul_first_tree(f, nbr, 16))

    if "pure_matmul" in sel:
        w_g32 = jnp.asarray(
            rng.randn(32, cin, 128).astype(np.float32), jnp.bfloat16)

        def mm_only(f):
            def body(acc, w_g):
                y = jnp.dot(f, w_g,
                            preferred_element_type=jnp.float32)
                return acc + y.sum(axis=1).astype(f.dtype)[:, None], None
            out, _ = jax.lax.scan(
                body, jnp.zeros((v, 1), f.dtype), w_g32)
            return out
        timed("pure_matmul(32x 259->128)", mm_only)

    if "pure_gather" in sel:
        y_fixed = jnp.asarray(rng.randn(v, 128).astype(np.float32),
                              jnp.bfloat16)
        nbr_grp = nbr[:124].reshape(31, 4, v)

        def gather_only(f):
            acc = jnp.zeros((v, cout), f.dtype) + f[:, :1] * 0

            def body(acc, nbr_g):
                for j in range(4):
                    acc = acc + SC._gather_rows(
                        y_fixed[:, j * cout:(j + 1) * cout], nbr_g[j])
                return acc, None
            out, _ = jax.lax.scan(body, acc, nbr_grp)
            return out
        timed("pure_gather(124x w32)", gather_only)
        nbr_grp_s = nbr_sorted[:124].reshape(31, 4, v)

        def gather_only_s(f):
            acc = jnp.zeros((v, cout), f.dtype) + f[:, :1] * 0

            def body(acc, nbr_g):
                for j in range(4):
                    acc = acc + SC._gather_rows(
                        y_fixed[:, j * cout:(j + 1) * cout], nbr_g[j])
                return acc, None
            out, _ = jax.lax.scan(body, acc, nbr_grp_s)
            return out
        timed("pure_gather sorted", gather_only_s)

    if "wide_gather" in sel:
        # gather full 128-wide rows per offset, slice after
        def wide(f, nbr_):
            n_groups = 32
            pad_off = 3
            w_p = jnp.concatenate([w, jnp.zeros((pad_off, cin, cout),
                                                w.dtype)])
            nbr_p = jnp.concatenate([nbr_, jnp.full((pad_off, v), -1,
                                                    jnp.int32)])
            w_grp = w_p.reshape(n_groups, 4, cin, cout) \
                .transpose(0, 2, 1, 3).reshape(n_groups, cin, 128) \
                .astype(f.dtype)
            nbr_grp = nbr_p.reshape(n_groups, 4, v)
            out0 = jnp.zeros((v, cout), f.dtype)

            def body(acc, xs):
                w_g, nbr_g = xs
                y = jnp.dot(f, w_g,
                            preferred_element_type=jnp.float32) \
                    .astype(f.dtype)
                for j in range(4):
                    rows = SC._gather_rows(y, nbr_g[j])
                    acc = acc + rows[:, j * cout:(j + 1) * cout]
                return acc, None
            out, _ = jax.lax.scan(body, out0, (w_grp, nbr_grp))
            return jnp.where(valid[:, None], out, 0.0)
        timed("wide_gather(128-w rows)", lambda f: wide(f, nbr))

    # ---- degree-compacted gather from materialized Y_flat ----
    def build_compact(nbr_np, nv_, D):
        """(D, V) flat idx into Y2 = Y.reshape(V*125, 32); -1 empty.
        Overflow pairs (beyond D per voxel) as COO (src, dst)."""
        n_off, v_ = nbr_np.shape
        idx = np.full((D, v_), -1, np.int64)
        ov_src, ov_dst = [], []
        fill = np.zeros(v_, np.int32)
        for o in range(n_off):
            row = nbr_np[o]
            for i in np.nonzero((row >= 0) & (np.arange(v_) < nv_))[0]:
                flat = row[i] * n_off + o
                if fill[i] < D:
                    idx[fill[i], i] = flat
                    fill[i] += 1
                else:
                    ov_src.append(flat)
                    ov_dst.append(i)
        return idx.astype(np.int32), (np.asarray(ov_src, np.int32),
                                      np.asarray(ov_dst, np.int32))

    def build_compact_fast(nbr_np, nv_, D):
        n_off, v_ = nbr_np.shape
        validm = (nbr_np >= 0) & (np.arange(v_)[None, :] < nv_)
        rank = np.cumsum(validm, axis=0) - 1          # per-column fill order
        flat = nbr_np.astype(np.int64) * n_off + \
            np.arange(n_off, dtype=np.int64)[:, None]
        idx = np.full((D, v_), -1, np.int64)
        sel = validm & (rank < D)
        idx[rank[sel], np.nonzero(sel)[1]] = flat[sel]
        ovm = validm & (rank >= D)
        ov_src = flat[ovm].astype(np.int32)
        ov_dst = np.nonzero(ovm)[1].astype(np.int32)
        return idx.astype(np.int32), (ov_src, ov_dst)

    for D in ([16, 24, 32, 48] if "prod" in sel else []):
        # the production op: native stem_compact tables + stem_compact_conv
        from segdino3d_tpu.data.synthetic import synthetic_scene
        from segdino3d_tpu.ops.host_plan import build_host_plan

        r2 = synthetic_scene(0, n_points=120000, n_instances=24,
                             n_superpoints=1536, n_classes=180,
                             feat_dim_2d=8)
        c2 = np.asarray(r2["points"][:, :3], np.float32) / 0.02
        c2 -= np.floor(c2.min(0) / 16.0) * 16.0
        t0 = time.time()
        planc = build_host_plan(
            c2, np.zeros(c2.shape[0], np.int32),
            np.ones(c2.shape[0], bool),
            [args.voxels, 36864, 13824, 5530, 2304],
            block_edges=[4, 4, 4, 4, 4], stem_gather=True,
            stem_compact=True, stem_compact_slots=D)
        build_s = time.time() - t0
        n_ov = int((planc.stem_ov_src >= 0).sum())
        print(f"# prod D={planc.stem_slots.shape[0]} build={build_s:.2f}s "
              f"overflow={n_ov} p_cap={planc.stem_ov_src.shape[0]}",
              flush=True)
        slots_j = jnp.asarray(planc.stem_slots)
        ovs_j = jnp.asarray(planc.stem_ov_src)
        ovd_j = jnp.asarray(planc.stem_ov_dst)

        def prod(f, slots_j=slots_j, ovs_j=ovs_j, ovd_j=ovd_j):
            return SC.stem_compact_conv(f, w, slots_j, ovs_j, ovd_j, valid)
        timed(f"prod D={D}", prod)
        ref = jax.jit(lambda f: SC.subm_conv(f, nbr, w, valid))(feats)
        got = jax.jit(prod)(feats)
        err = float(jnp.abs(ref.astype(jnp.float32)
                            - got.astype(jnp.float32)).max())
        print(f"# prod D={D} max abs err vs current: {err:.4f}", flush=True)

    for D in ([16, 24, 32, 48] if "compactv2" in sel else []):
        idx_np, (ov_s, ov_d) = build_compact_fast(plan.stem_nbr, nv, D)
        print(f"# compactv2 D={D} overflow={len(ov_s)}", flush=True)
        p_cap = max(1024, -(-len(ov_s) // 4096) * 4096)
        ov_src = np.full(p_cap, -1, np.int32)
        ov_dst = np.full(p_cap, v, np.int32)   # segment dump row
        ov_src[:len(ov_s)] = ov_s
        ov_dst[:len(ov_d)] = ov_d
        idx_j = jnp.asarray(idx_np)
        ov_src_j, ov_dst_j = jnp.asarray(ov_src), jnp.asarray(ov_dst)
        # (259, 125*32) so Y=(V, 125*32) reshapes to (V*125, 32) with
        # flat row j*125+o — contiguous, no transpose for XLA to fuse
        w_flat2 = jnp.asarray(
            np.asarray(w, np.float32).transpose(1, 0, 2).reshape(cin, -1),
            w.dtype)

        def compact_v2(f, idx_j=idx_j):
            y = jnp.dot(f, w_flat2,
                        preferred_element_type=jnp.float32).astype(f.dtype)
            y2 = y.reshape(v * 125, cout)

            def body(a, idx_row):
                return a + SC._gather_rows(y2, idx_row), None
            acc, _ = jax.lax.scan(body, jnp.zeros((v, cout), f.dtype),
                                  idx_j)
            rows = SC._gather_rows(y2, ov_src_j)
            acc = acc + jax.ops.segment_sum(
                rows, ov_dst_j, num_segments=v + 1)[:v]
            return jnp.where(valid[:, None], acc, 0.0)

        timed(f"compactv2 D={D}", compact_v2)
        ref = jax.jit(lambda f: SC.subm_conv(f, nbr, w, valid))(feats)
        got = jax.jit(compact_v2)(feats)
        err = float(jnp.abs(ref.astype(jnp.float32)
                            - got.astype(jnp.float32)).max())
        rel = float(jnp.abs(ref.astype(jnp.float32)).max())
        print(f"# compactv2 D={D} max abs err vs current: {err:.4f} "
              f"(ref max {rel:.1f})", flush=True)

    for D in (32, 48):
        if f"compact{D}" not in sel and "compact" not in sel:
            continue
        t0 = time.time()
        idx_np, (ov_s, ov_d) = build_compact_fast(plan.stem_nbr, nv, D)
        print(f"# compact D={D} build {time.time()-t0:.1f}s "
              f"overflow={len(ov_s)}", flush=True)
        p_cap = max(1024, -(-len(ov_s) // 4096) * 4096)
        ov_src = np.full(p_cap, 0, np.int32)
        ov_dst = np.full(p_cap, v, np.int32)   # segment dump row
        ov_src[:len(ov_s)] = ov_s
        ov_dst[:len(ov_d)] = ov_d
        idx_j = jnp.asarray(idx_np)
        ov_src_j, ov_dst_j = jnp.asarray(ov_src), jnp.asarray(ov_dst)
        w_flat = w.reshape(125 * cin, cout)  # not used; keep grouped

        def compact_conv(f, idx_j=idx_j, D=D):
            # Y_flat: (V, 125*32) grouped matmul, laid out so that
            # row j, offset o lives at flat row j*125+o of (V*125, 32)
            n_groups = 32
            pad_off = 3
            w_p = jnp.concatenate([w, jnp.zeros((pad_off, cin, cout),
                                                w.dtype)])
            w_grp = w_p.reshape(n_groups, 4, cin, cout) \
                .transpose(0, 2, 1, 3).reshape(n_groups, cin, 4 * cout) \
                .astype(f.dtype)

            def mk(_, w_g):
                return None, jnp.dot(f, w_g,
                                     preferred_element_type=jnp.float32) \
                    .astype(f.dtype)
            _, ys = jax.lax.scan(mk, None, w_grp)   # (32, V, 128)
            # reshape to (V*125(+3 pad), 32): ys[g][j, 4o'+..] —
            # target row j*128/32? build (V,128,32)->(V,125,32)
            y_flat = ys.reshape(n_groups, v, 4, cout) \
                .transpose(1, 0, 2, 3).reshape(v * 128, cout)
            # flat idx uses stride 125; rebuild with stride 128
            acc = jnp.zeros((v, cout), f.dtype)

            def body(a, idx_row):
                j = idx_row // 125
                o = idx_row % 125
                r = jnp.where(idx_row < 0, -1, j * 128 + o)
                return a + SC._gather_rows(y_flat, r), None
            acc, _ = jax.lax.scan(body, acc, idx_j)
            # overflow
            j = ov_src_j // 125
            o = ov_src_j % 125
            rows = SC._gather_rows(y_flat, j * 128 + o)
            acc = acc + jax.ops.segment_sum(rows, ov_dst_j,
                                            num_segments=v + 1)[:v]
            return jnp.where(valid[:, None], acc, 0.0)

        timed(f"compact D={D}", compact_conv)
        # parity vs current
        ref = jax.jit(lambda f: SC.subm_conv(f, nbr, w, valid))(feats)
        got = jax.jit(compact_conv)(feats)
        err = float(jnp.abs(ref.astype(jnp.float32)
                            - got.astype(jnp.float32)).max())
        print(f"# compact D={D} max abs err vs current: {err:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
