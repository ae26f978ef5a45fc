import numpy as np


def assert_close(a, b, tol=2e-5):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    nan_a, nan_b = np.isnan(a), np.isnan(b)
    assert (nan_a == nan_b).all(), (
        f"NaN pattern mismatch: {nan_a.sum()} vs {nan_b.sum()}")
    d = np.abs(a[~nan_a] - b[~nan_b])
    assert d.size == 0 or d.max() < tol, f"max diff {d.max()}"
