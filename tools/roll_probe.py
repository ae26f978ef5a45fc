#!/usr/bin/env python
"""Probe: does a DYNAMIC pltpu.roll at width 384/512/640 lanes return
correct values on this chip? (PERF.md limit #2 says >256 miscompiles;
the shipped hnat sweep uses 384 successfully — bisect the real bound.)"""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(width, St=64):
    def kernel(x_ref, s_ref, o_ref):
        amt = s_ref[0]
        o_ref[:] = pltpu.roll(x_ref[:], width - amt, axis=1)

    x = np.arange(St * width, dtype=np.float32).reshape(St, width)
    ok = True
    for amt in (0, 1, 37, 127, width // 2, width - 1):
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((St, width), jnp.float32),
        )(x, jnp.asarray([amt], jnp.int32))
        want = np.roll(x, -amt, axis=1)
        good = np.array_equal(np.asarray(out), want)
        ok &= good
        if not good:
            print(f"  width={width} amt={amt}: WRONG")
    print(f"width {width}: {'OK' if ok else 'MISCOMPILES'}")


for w in (256, 384, 512, 640):
    probe(w)
