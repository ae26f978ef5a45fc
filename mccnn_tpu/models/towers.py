"""The matching networks.

Reference architectures (main.lua:660-749):

- **fast** (main.lua:726-748): l1 conv(ks×ks, fm) layers with ReLU
  between (none after the last), then per-pixel L2 normalization and a
  dot-product join. Patch window ws = (ks-1)*l1 + 1.
- **slow** (main.lua:663-695): l1 conv layers with ReLU after each,
  then the two siamese descriptors are concatenated and fed to l2
  Linear(nh2)+ReLU layers, Linear(nh2->1), Sigmoid. At test time the
  FC head runs as 1×1 convolutions over full-resolution feature maps
  (SpatialConvolution1_fw.lua).

TPU-native design: a single parameter pytree drives both the
patch-mode (VALID padding — training) and image-mode (SAME padding —
inference) applies, so there is no weight-tying surgery
(main.lua:697-725); the FC head is a plain dense pytree applied over
whatever leading dims the caller gives it (patches or whole images) —
on TPU both are one big MXU matmul.

Weight init matches Torch defaults: uniform(±1/sqrt(fan_in)) for both
conv (fan_in = kW*kH*nIn) and linear (fan_in = nIn) weights and biases.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = Any  # {"tower": [{"w","b"}...], "head": [{"w","b"}...]}


def _conv_init(key, ks, c_in, c_out):
    k1, k2 = jax.random.split(key)
    stdv = 1.0 / jnp.sqrt(ks * ks * c_in)
    w = jax.random.uniform(k1, (ks, ks, c_in, c_out), jnp.float32, -stdv, stdv)
    b = jax.random.uniform(k2, (c_out,), jnp.float32, -stdv, stdv)
    return {"w": w, "b": b}


def _dense_init(key, n_in, n_out):
    k1, k2 = jax.random.split(key)
    stdv = 1.0 / jnp.sqrt(n_in)
    w = jax.random.uniform(k1, (n_in, n_out), jnp.float32, -stdv, stdv)
    b = jax.random.uniform(k2, (n_out,), jnp.float32, -stdv, stdv)
    return {"w": w, "b": b}


def init_fast(key, *, l1: int, fm: int, ks: int, n_input_plane: int = 1) -> Params:
    keys = jax.random.split(key, l1)
    tower = [_conv_init(keys[i], ks, n_input_plane if i == 0 else fm, fm)
             for i in range(l1)]
    return {"tower": tower, "head": []}


def init_slow(key, *, l1: int, fm: int, ks: int, l2: int, nh2: int,
              n_input_plane: int = 1) -> Params:
    keys = jax.random.split(key, l1 + l2 + 1)
    tower = [_conv_init(keys[i], ks, n_input_plane if i == 0 else fm, fm)
             for i in range(l1)]
    head = [_dense_init(keys[l1 + i], 2 * fm if i == 0 else nh2, nh2)
            for i in range(l2)]
    head.append(_dense_init(keys[l1 + l2], nh2, 1))
    return {"tower": tower, "head": head}


def apply_tower(params: Params, x: jnp.ndarray, *, arch: str,
                padding: str = "VALID", dtype=jnp.float32) -> jnp.ndarray:
    """Conv tower over NHWC input.

    arch='fast': ReLU between convs but not after the last, then
    per-pixel L2 normalization (main.lua:726-735).
    arch='slow': ReLU after every conv, no normalization
    (main.lua:663-668).
    padding: VALID = patch mode (training), SAME = image mode (the
    reference sets padW=padH=1 on the test net, main.lua:680-683 /
    738-746).
    """
    layers = params["tower"]
    h = x.astype(dtype)
    for i, layer in enumerate(layers):
        h = jax.lax.conv_general_dilated(
            h, layer["w"].astype(dtype), (1, 1), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        h = (h + layer["b"]).astype(dtype)
        if arch == "slow" or i < len(layers) - 1:
            h = jnp.maximum(h, 0)
    if arch == "fast":
        h = l2_normalize(h)
    return h.astype(jnp.float32)


def l2_normalize(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-pixel feature normalization: x / sqrt(sum_c x^2 + eps)
    (adcensus.cu:1284-1308; note eps is added to the squared norm)."""
    norm = jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps
    return x / jnp.sqrt(norm)


def apply_head(params: Params, x: jnp.ndarray, *, dtype=jnp.float32) -> jnp.ndarray:
    """Slow-arch FC head over concatenated descriptors.

    x: (..., 2*fm) -> (...,) match score in (0, 1); the output is a
    *dissimilarity* — positives are trained toward 0 (main.lua:848-849).
    ReLU after all but the last layer, sigmoid on the output
    (main.lua:670-675).
    """
    h = x.astype(dtype)
    head = params["head"]
    for layer in head[:-1]:
        h = jnp.dot(h, layer["w"].astype(dtype),
                    preferred_element_type=jnp.float32) + layer["b"]
        h = jnp.maximum(h, 0).astype(dtype)
    last = head[-1]
    h = jnp.dot(h, last["w"].astype(dtype),
                preferred_element_type=jnp.float32) + last["b"]
    return jax.nn.sigmoid(h.astype(jnp.float32))[..., 0]


def fast_describe(params, images, dtype=jnp.float32):
    """Image-mode descriptors for the fast net: (N, H, W, 1) ->
    L2-normalized (N, H, W, fm) at full resolution (SAME padding)."""
    return apply_tower(params, images, arch="fast", padding="SAME", dtype=dtype)


def slow_describe(params, images, dtype=jnp.float32):
    """Image-mode descriptors for the slow net (no normalization)."""
    return apply_tower(params, images, arch="slow", padding="SAME", dtype=dtype)


def print_net(cfg) -> None:
    """Topology printer: one line per layer of the training net, the
    shape the reference prints at net construction (print_net,
    main.lua:542-564, called at main.lua:751; transcript README:194-212
    — module names here are the honest JAX ones, the structure and
    shape annotations match line for line)."""
    n_in = cfg.n_input_plane
    lines = []
    if cfg.arch == "slow":
        for i in range(cfg.l1):
            lines.append(f"conv(in={n_in if i == 0 else cfg.fm}, "
                         f"out={cfg.fm}, k={cfg.ks})")
            lines.append("relu")
        lines.append(f"reshape({cfg.bs}x{2 * cfg.fm})")
        for i in range(cfg.l2):
            lines.append(f"linear({2 * cfg.fm if i == 0 else cfg.nh2} "
                         f"-> {cfg.nh2})")
            lines.append("relu")
        lines.append(f"linear({cfg.nh2} -> 1)")
        lines.append("sigmoid")
    elif cfg.arch == "fast":
        # ReLU between convs but not after the last (main.lua:726-735)
        for i in range(cfg.l1):
            lines.append(f"conv(in={n_in if i == 0 else cfg.fm}, "
                         f"out={cfg.fm}, k={cfg.ks})")
            if i < cfg.l1 - 1:
                lines.append("relu")
        lines.append("l2_normalize")
        lines.append("stereo_join1")
    print("\n".join(lines))
