"""Torch7 ascii serialization round-trip + reference-checkpoint interop
(format: torch7 File.lua / THDiskFile ascii; object tree:
main.lua:566-600 save_net)."""

import os
import tempfile

import numpy as np

from mccnn_tpu.data.t7 import (T7Object, Tensor, dump_t7_ascii,
                               load_t7_ascii)
from mccnn_tpu.models.import_t7 import params_from_t7, params_to_t7


def _roundtrip(obj):
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.t7")
        dump_t7_ascii(obj, p)
        return load_t7_ascii(p)


def test_primitives_roundtrip():
    obj = {1: 3.5, 2: "a string with spaces", 3: True, 4: None,
           5: {"nested": {1: 1.0, 2: 2.0}}, "k": -1e-7}
    got = _roundtrip(obj)
    assert got[1] == 3.5
    assert got[2] == "a string with spaces"
    assert got[3] is True
    assert got[4] is None
    assert got[5]["nested"] == {1: 1.0, 2: 2.0}
    assert got["k"] == -1e-7


def test_shared_table_reference():
    shared = {"v": 7.0}
    got = _roundtrip({1: shared, 2: shared})
    assert got[1] is got[2]  # re-reference resolves to the same object
    assert got[1]["v"] == 7.0


def test_tensor_roundtrip_dtypes():
    rng = np.random.RandomState(0)
    for cls, dtype in (("torch.FloatTensor", np.float32),
                       ("torch.CudaTensor", np.float32),
                       ("torch.DoubleTensor", np.float64)):
        a = rng.randn(3, 4, 2).astype(dtype)
        got = _roundtrip(Tensor(a, cls))
        assert got.dtype == dtype
        np.testing.assert_array_equal(got, a)


def test_classed_object_roundtrip():
    m = T7Object("cudnn.SpatialConvolution",
                 {"weight": Tensor(np.ones((2, 1, 3, 3), np.float32)),
                  "nInputPlane": 1.0})
    got = _roundtrip(m)
    assert got.torch_typename == "cudnn.SpatialConvolution"
    assert got["nInputPlane"] == 1.0
    np.testing.assert_array_equal(got["weight"], np.ones((2, 1, 3, 3)))


def test_noncontiguous_tensor_read():
    """Strided tensors (storage offset + column strides) materialize
    correctly — reference checkpoints contain storage-view tensors
    (weight tying, main.lua:697-725)."""
    base = np.arange(24, dtype=np.float32)
    # hand-build: a 2x3 view with offset 2 (1-based 3), strides (6, 2)
    raw = []
    raw.append("4\n1\n")  # TYPE_TORCH, index 1
    raw.append("3\nV 1\n")
    raw.append("17\ntorch.FloatTensor\n")
    raw.append("2\n2 3\n6 2\n3\n")  # ndim, size, stride, offset(1-based)
    raw.append("4\n2\n")  # storage object, index 2
    raw.append("3\nV 1\n18\ntorch.FloatStorage\n")
    raw.append("24\n" + " ".join(str(float(v)) for v in base) + "\n")
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.t7")
        with open(p, "wb") as f:
            f.write("".join(raw).encode())
        got = load_t7_ascii(p)
    want = np.lib.stride_tricks.as_strided(base[2:], (2, 3), (24, 8))
    np.testing.assert_array_equal(got, want)


def test_fast_checkpoint_roundtrip():
    import jax

    from mccnn_tpu.models import towers

    params = towers.init_fast(jax.random.PRNGKey(0), l1=3, fm=8, ks=3,
                              n_input_plane=1)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "net.t7")
        params_to_t7(jax.tree.map(np.asarray, params), p, arch="fast",
                     opt={"arch": "fast", "l1": 3.0})
        got, opt = params_from_t7(p)
        root = load_t7_ascii(p)
    assert opt["arch"] == "fast"
    assert len(got["tower"]) == 3 and not got["head"]
    for a, b in zip(got["tower"], params["tower"]):
        np.testing.assert_allclose(a["w"], np.asarray(b["w"]), rtol=0)
        np.testing.assert_allclose(a["b"], np.asarray(b["b"]), rtol=0)

    # the module tree is the reference's: convs with ReLU between,
    # Normalize2, StereoJoin last (main.lua:738-746)
    mods = root[1]["modules"]
    names = [mods[k].torch_typename for k in sorted(mods)]
    assert names == ["cudnn.SpatialConvolution", "cudnn.ReLU",
                     "cudnn.SpatialConvolution", "cudnn.ReLU",
                     "cudnn.SpatialConvolution", "nn.Normalize2",
                     "nn.StereoJoin"]


def test_slow_checkpoint_roundtrip_and_forward():
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.models import towers

    params = towers.init_slow(jax.random.PRNGKey(1), l1=2, fm=6, ks=3,
                              l2=2, nh2=10, n_input_plane=1)
    np_params = jax.tree.map(np.asarray, params)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "net.t7")
        params_to_t7(np_params, p, arch="slow")
        got, _ = params_from_t7(p)
    assert len(got["tower"]) == 2 and len(got["head"]) == 3

    # imported params must forward identically
    x = np.random.RandomState(2).randn(1, 9, 9, 1).astype(np.float32)
    a = towers.apply_tower(params, jnp.asarray(x), arch="slow")
    b = towers.apply_tower(got, jnp.asarray(x), arch="slow")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    d2 = np.random.RandomState(3).randn(5, 12).astype(np.float32)
    ha = towers.apply_head(params, jnp.asarray(d2))
    hb = towers.apply_head(got, jnp.asarray(d2))
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), atol=1e-6)
