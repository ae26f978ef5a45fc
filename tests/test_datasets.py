"""Dataset-assembly contracts (main.lua:394-491), esp. the -at 1
KITTI 2012+2015 merge (main.lua:403-426).

Scaled-down check of the reference formulae: with real data the merge
yields 589 images for kitti primary (194 + 200 + 195), 594 for
kitti2015 (194 + 200 + 200), dispnoc over the 394 GT images, and
tr = tr_12 ++ (tr_15 + 194).
"""

import os
import tempfile

import numpy as np
import pytest

from mccnn_tpu.config import make_config
from mccnn_tpu.data.datasets import load_kitti, make_synthetic_kitti


@pytest.fixture(scope="module")
def two_sets():
    with tempfile.TemporaryDirectory() as d:
        make_synthetic_kitti(os.path.join(d, "data.kitti"), n_images=4,
                             height=32, width=64, disp_max=8, seed=1,
                             n_test_images=2)
        make_synthetic_kitti(os.path.join(d, "data.kitti2015"), n_images=5,
                             height=32, width=64, disp_max=8, seed=2,
                             n_test_images=3)
        yield d


def _raw(data_dir, name):
    from mccnn_tpu.data.bin_io import fromfile
    return {k: np.asarray(fromfile(os.path.join(data_dir, name, f"{k}.bin")))
            for k in ("x0", "x1", "dispnoc", "metadata", "tr", "te",
                      "nnz_tr", "nnz_te")}


@pytest.mark.parametrize("primary", ["kitti", "kitti2015"])
def test_at_merge_matches_reference(two_sets, primary):
    d12 = _raw(two_sets, "data.kitti")
    d15 = _raw(two_sets, "data.kitti2015")
    n12, n15 = 4, 5  # GT image counts
    ds = load_kitti(make_config(primary, "fast", at=1, data_dir=two_sets))

    # image rows: [2012 GT | 2015 GT | primary test slab]
    prim = d12 if primary == "kitti" else d15
    n_prim = n12 if primary == "kitti" else n15
    n_test = prim["x0"].shape[0] - n_prim
    assert ds.X0.shape[0] == n12 + n15 + n_test
    np.testing.assert_array_equal(ds.X0[:n12], d12["x0"][:n12])
    np.testing.assert_array_equal(ds.X0[n12:n12 + n15], d15["x0"][:n15])
    np.testing.assert_array_equal(ds.X0[n12 + n15:], prim["x0"][n_prim:])
    np.testing.assert_array_equal(ds.metadata[n12 + n15:],
                                  prim["metadata"][n_prim:])

    # dispnoc covers both sets' GT images, nothing else
    assert ds.dispnoc.shape[0] == n12 + n15
    np.testing.assert_array_equal(ds.dispnoc[n12:], d15["dispnoc"])

    # tr = tr_12 ++ (tr_15 + n12); te from the primary only
    np.testing.assert_array_equal(
        ds.tr, np.concatenate([d12["tr"], d15["tr"] + n12]))
    expect_te = d12["te"] if primary == "kitti" else d15["te"] + n12
    np.testing.assert_array_equal(ds.te, expect_te)

    # nnz: concatenated per split, 2015 img ids offset by n12; the
    # other set's test rows are NOT folded into training
    assert len(ds.nnz_tr) == len(d12["nnz_tr"]) + len(d15["nnz_tr"])
    assert len(ds.nnz_te) == len(d12["nnz_te"]) + len(d15["nnz_te"])
    np.testing.assert_array_equal(
        ds.nnz_tr[len(d12["nnz_tr"]):, 0], d15["nnz_tr"][:, 0] + n12)
    np.testing.assert_array_equal(
        ds.nnz_te[len(d12["nnz_te"]):, 0], d15["nnz_te"][:, 0] + n12)

    # merged nnz ids must point at rows whose GT matches: spot-check a
    # 2015 row against the merged dispnoc
    img, y, x, disp = ds.nnz_tr[len(d12["nnz_tr"])]
    assert ds.dispnoc[int(img) - 1, 0, int(y), int(x)] == disp


def test_no_at_loads_primary_only(two_sets):
    ds = load_kitti(make_config("kitti", "fast", data_dir=two_sets))
    d12 = _raw(two_sets, "data.kitti")
    assert ds.X0.shape[0] == d12["x0"].shape[0]
    np.testing.assert_array_equal(ds.te, d12["te"])
