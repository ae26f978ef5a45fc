"""Golden full-pipeline regression on the bundled KITTI pair.

Locks the CURRENT output of the complete stereo method (census and
fast arches, CPU, scan SGM) on /root/reference/samples/input so
numerics can never drift silently (VERDICT r01 "accuracy-parity
harness"). The fast arch uses the deterministic PRNGKey(seed)
initialization; when reference-trained weights become importable
(models/import_t7.py) the same harness locks those outputs too.

Regenerate after an INTENDED numeric change:
    MCCNN_TEST_CPU=1 python tests/test_golden.py --regen
"""

import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
SAMPLE_DIR = "/root/reference/samples/input"
DISP_MAX = 36


def _compute(arch: str) -> np.ndarray:
    import jax

    from mccnn_tpu.cli import init_params
    from mccnn_tpu.config import make_config
    from mccnn_tpu.ops import sgm as sgm_mod
    from mccnn_tpu.pipeline import stereo_predict
    from mccnn_tpu.utils.images import load_gray, standardize

    # 2x-downsampled real pair: real image statistics (ray walks and
    # penalty selection behave naturally) at CPU-friendly cost
    x0 = standardize(load_gray(os.path.join(SAMPLE_DIR, "kittiL.png")))[::2, ::2]
    x1 = standardize(load_gray(os.path.join(SAMPLE_DIR, "kittiR.png")))[::2, ::2]
    cfg = make_config("kitti", arch, a="test_te")
    params = init_params(cfg)

    prev = sgm_mod._PALLAS_MODE
    sgm_mod._PALLAS_MODE = "0"  # deterministic scan formulation
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            disp = stereo_predict(cfg, params, x0, x1, DISP_MAX)
            return np.asarray(disp)
    finally:
        sgm_mod._PALLAS_MODE = prev


@pytest.mark.skipif(not os.path.isdir(SAMPLE_DIR),
                    reason="bundled sample pair not present")
@pytest.mark.parametrize("arch", ["census", "fast"])
def test_full_pipeline_matches_golden(arch):
    fname = os.path.join(GOLDEN_DIR, f"{arch}_half.npz")
    assert os.path.exists(fname), \
        f"golden missing — run: python tests/test_golden.py --regen"
    want = np.load(fname)["disp"]
    got = _compute(arch)
    assert got.shape == want.shape
    assert not np.isnan(got).any()
    # float-op reordering across XLA versions can flip WTA near-ties;
    # budget those, but lock everything else tightly
    diff = np.abs(got - want)
    frac = float((diff > 0.05).mean())
    assert frac < 0.003, f"{frac:.5f} of pixels drifted (max {diff.max():.3f})"


def _regen():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for arch in ("census", "fast"):
        disp = _compute(arch)
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"{arch}_half.npz"),
                            disp=disp)
        print(arch, disp.shape, float(disp.min()), float(disp.max()))


if __name__ == "__main__":
    if "--regen" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        _regen()
    else:
        print(__doc__)
