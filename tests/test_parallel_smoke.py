"""Fast multi-device smoke tests: shard_map data parallelism on the
decoder + criterion (no sparse U-Net, so CPU compile stays quick)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from segdino3d_tpu.parallel.train_step import shard_map


def test_eight_virtual_devices_available():
    assert len(jax.devices()) >= 8


def test_shardmap_psum_grads():
    """Per-device loss grads pmean-reduce like DDP."""
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    w = jnp.ones((4, 4))
    x = jnp.arange(8 * 3 * 4, dtype=jnp.float32).reshape(8, 3, 4) / 100

    def local(w, x):
        def loss(w):
            return jnp.sum((x[0] @ w) ** 2)
        g = jax.grad(loss)(w)
        return jax.lax.pmean(g, "data")

    f = jax.jit(shard_map(local, mesh, in_specs=(P(), P("data")),
                          out_specs=P()))
    g = f(w, x)

    def global_loss(w):
        return jnp.mean(
            jnp.stack([jnp.sum((x[i] @ w) ** 2) for i in range(8)]))
    g_ref = jax.grad(global_loss)(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5)


def test_decoder_shards_over_batch():
    from segdino3d_tpu.models.decoder.query_decoder import ScanNetQueryDecoder

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    B, S, Q, K, D = 4, 16, 12, 5, 32
    dec = ScanNetQueryDecoder(
        num_layers=1, num_instance_classes=5, num_semantic_classes=6,
        in_channels=8, d_model=D, num_heads=4, hidden_dim=32)
    rng = np.random.RandomState(0)
    args = dict(
        sp_feats=jnp.asarray(rng.randn(B, S, 8).astype(np.float32)),
        sp_valid=jnp.ones((B, S), bool),
        sp_pos=jnp.asarray(rng.rand(B, S, 3).astype(np.float32)),
        sp_pos_wo_elastic=jnp.asarray(rng.rand(B, S, 3).astype(np.float32)),
        queries_feat=jnp.asarray(rng.randn(B, Q, 8).astype(np.float32)),
        query_valid=jnp.ones((B, Q), bool),
        queries_pos=jnp.asarray(rng.rand(B, Q, 3).astype(np.float32)),
        dinox_queries=jnp.asarray(rng.randn(B, K, D).astype(np.float32)),
        dinox_query_pos=jnp.asarray(rng.rand(B, K, 3).astype(np.float32)),
        dinox_valid=jnp.ones((B, K), bool),
        scene_range=jnp.tile(jnp.asarray([[[0.0] * 3, [1.0] * 3]]), (B, 1, 1)),
    )
    variables = dec.init(jax.random.PRNGKey(0), **args)

    def local(variables, *flat_args):
        kw = dict(zip(args.keys(), flat_args))
        out = dec.apply(variables, **kw)
        return out["cls_preds"], out["masks"]

    f = jax.jit(shard_map(
        local, mesh,
        in_specs=(P(),) + tuple(P("data") for _ in args),
        out_specs=(P("data"), P("data"))))
    cls_sharded, masks_sharded = f(variables, *args.values())
    out_ref = dec.apply(variables, **args)
    np.testing.assert_allclose(np.asarray(cls_sharded),
                               np.asarray(out_ref["cls_preds"]),
                               rtol=2e-4, atol=2e-5)


def test_ema_update():
    """EMA shadow update (reference ema_utils.py:34-38); the shadow lives
    replicated in HBM and updates inside the jitted step."""
    from segdino3d_tpu.train.ema import ema_update

    ema = {"a": jax.numpy.ones((16, 4)), "b": jax.numpy.ones((3,))}
    upd = ema_update(ema, {"a": jax.numpy.zeros((16, 4)),
                           "b": jax.numpy.zeros((3,))}, 0.5)
    np.testing.assert_allclose(np.asarray(upd["a"]), 0.5)
