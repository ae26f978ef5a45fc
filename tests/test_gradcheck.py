"""Finite-difference gradient checks — the reference's Test.lua pattern
(testJacobian/testCriterion with eps=1e-3, Test.lua:3-69) applied to
the differentiable pieces: L2 normalization, the hinge and BCE
criterions, and the full fast-arch patch loss end-to-end through
jax.grad (the framework's analytic backward).

Scalar functions are jitted once so the 2-point stencil loop costs one
device dispatch per probe rather than one per op."""

import jax
import jax.numpy as jnp
import numpy as np

from mccnn_tpu.models import towers
from mccnn_tpu.train import losses

EPS = 1e-3


def numeric_grad(f_jit, x, eps=EPS):
    """Central differences of a jitted scalar function."""
    x = np.asarray(x, np.float32)
    g = np.zeros(x.shape, np.float64)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        g[i] = (float(f_jit(xp)) - float(f_jit(xm))) / (2 * eps)
        it.iternext()
    return g


def check(f, x, rtol=1e-2, atol=1e-3):
    f_jit = jax.jit(f)
    got = np.asarray(jax.jit(jax.grad(f))(jnp.asarray(x, jnp.float32)))
    want = numeric_grad(f_jit, x)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


def test_l2_normalize_grad():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 4)
    check(lambda x: jnp.sum(jnp.sin(towers.l2_normalize(x))), x)


def test_hinge_grad():
    rng = np.random.RandomState(1)
    s = rng.randn(16) * 0.5
    for pow_ in (1, 2):
        check(lambda s: losses.hinge(s, margin=0.2, pow=pow_), s)


def test_bce_grad():
    rng = np.random.RandomState(2)
    p = rng.uniform(0.05, 0.95, 8)
    t = jnp.asarray((rng.rand(8) > 0.5).astype(np.float32))
    check(lambda p: losses.bce(p, t), p)


def test_fast_loss_param_grads():
    """End-to-end testNetworkParameters analog (Test.lua:71-96): the
    analytic gradient of the fast-arch patch loss wrt the first conv
    kernel matches finite differences."""
    from mccnn_tpu.train.trainer import loss_fn

    key = jax.random.PRNGKey(0)
    params = towers.init_fast(key, l1=2, fm=4, ks=3, n_input_plane=1)
    rng = np.random.RandomState(3)
    patches = jnp.asarray(rng.randn(8, 5, 5).astype(np.float32))
    labels = jnp.asarray(np.tile([0.0, 1.0], 2).astype(np.float32))

    def loss_from_w(w):
        p = jax.tree.map(lambda x: x, params)
        p["tower"][0]["w"] = w
        return loss_fn(p, patches, labels, arch="fast", m=0.2, pow=1,
                       dtype=jnp.float32)

    check(loss_from_w, np.asarray(params["tower"][0]["w"]),
          rtol=5e-2, atol=2e-3)


def test_slow_loss_param_grads():
    """Same check through the slow arch: BCE -> sigmoid -> FC head ->
    conv tower (the head had no gradient coverage before — VERDICT r01
    #7; Test.lua:71-96 pattern)."""
    from mccnn_tpu.train.trainer import loss_fn

    key = jax.random.PRNGKey(4)
    params = towers.init_slow(key, l1=2, fm=4, ks=3, l2=2, nh2=6,
                              n_input_plane=1)
    rng = np.random.RandomState(5)
    patches = jnp.asarray(rng.randn(8, 5, 5).astype(np.float32))
    labels = jnp.asarray(np.tile([0.0, 1.0], 2).astype(np.float32))

    def loss_from(leaf_path):
        def f(x):
            p = jax.tree.map(lambda v: v, params)
            part, idx, name = leaf_path
            p[part][idx][name] = x
            return loss_fn(p, patches, labels, arch="slow", m=0.2, pow=1,
                           dtype=jnp.float32)
        return f

    # first head matrix (the 2fm concat boundary), last head bias, and
    # the first conv kernel (gradient must flow through the whole head)
    for path in (("head", 0, "w"), ("head", -1, "b"), ("tower", 0, "w")):
        part, idx, name = path
        check(loss_from(path), np.asarray(params[part][idx][name]),
              rtol=5e-2, atol=2e-3)
