"""AOT serving export: the StableHLO artifact reloads without model code
and reproduces the jitted inference step bit-for-bit (same platform)."""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_export_roundtrip_matches_direct(tmp_path):
    import jax

    from tools.export_serving import export_artifact, load_artifact

    out = str(tmp_path / "artifact")
    exp, var_leaves, batch_leaves, meta = export_artifact(
        out, platform="cpu", n_points=2048, s_cap=64, batch_size=1,
        n_scene_points=1500, tiny=True)

    assert os.path.exists(os.path.join(out, "model.shlo"))
    assert meta["n_batch_leaves"] == len(batch_leaves)

    call, meta2 = load_artifact(out)
    got = call(batch_leaves)

    # direct execution of the same exported function object
    want = exp.call(var_leaves, batch_leaves)
    for k in ("scores", "labels", "valid", "masks_packed"):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)

    # outputs are sane: a valid bit-packed mask tensor and finite scores
    v = np.asarray(got["valid"])
    assert v.dtype == bool and v.shape[0] == 1
    assert np.isfinite(np.asarray(got["scores"])).all()
    with open(os.path.join(out, "meta.json")) as f:
        assert json.load(f)["platform"] == "cpu"


def test_artifact_runs_in_fresh_process(tmp_path):
    """The serving loader must not need the model code path at all —
    run it in a subprocess that imports only jax + numpy + the loader."""
    import subprocess

    from tools.export_serving import export_artifact

    out = str(tmp_path / "artifact")
    _, _, batch_leaves, _ = export_artifact(
        out, platform="cpu", n_points=2048, s_cap=64, batch_size=1,
        n_scene_points=1500, tiny=True)
    np.savez(str(tmp_path / "batch.npz"),
             **{f"leaf_{i}": np.asarray(x)
                for i, x in enumerate(batch_leaves)})

    code = f"""
import numpy as np, jax, sys
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from tools.export_serving import load_artifact
call, meta = load_artifact({out!r})
z = np.load({str(tmp_path / 'batch.npz')!r})
batch = [z[f"leaf_{{i}}"] for i in range(len(z.files))]
outs = call(batch)
assert np.isfinite(np.asarray(outs["scores"])).all()
print("SERVED", int(np.asarray(outs["valid"]).sum()))
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SERVED" in r.stdout
