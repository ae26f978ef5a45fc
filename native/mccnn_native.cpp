// Native data-path runtime for the TPU stereo framework.
//
// The reference implements its data path in native code (C++/CUDA:
// dataset extraction adcensus.cu:1846-1998, warp-based augmentation
// cv.cpp). Here the TPU-side compute is JAX/XLA; this module provides
// the *host* hot loops that feed the chips:
//
//   gather_windows:  multithreaded extraction of fixed-size patch
//                    windows around ground-truth points from the
//                    (N, H, W) dataset tensor (zero-filled outside the
//                    frame) — the per-step host cost of training.
//   warp_patches:    bicubic (Catmull-Rom a=-0.75) affine patch
//                    sampling with 0-fill outliers — a host fallback
//                    mirroring cv.cpp:19-45 / main.lua:603-619 when no
//                    accelerator is attached.
//
// Built as a plain CPython extension (no pybind11): see Makefile.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct Buf {
    Py_buffer view{};
    bool ok = false;
    ~Buf() { if (ok) PyBuffer_Release(&view); }
    bool get(PyObject *obj, const char *name, const char *fmt, int ndim_min) {
        if (PyObject_GetBuffer(obj, &view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) != 0)
            return false;
        ok = true;
        if (view.ndim < ndim_min) {
            PyErr_Format(PyExc_ValueError, "%s: expected >=%d dims, got %d",
                         name, ndim_min, view.ndim);
            return false;
        }
        if (fmt && view.format && std::strcmp(view.format, fmt) != 0) {
            PyErr_Format(PyExc_ValueError, "%s: expected format %s, got %s",
                         name, fmt, view.format);
            return false;
        }
        return true;
    }
};

void parallel_for(Py_ssize_t n, const std::function<void(Py_ssize_t, Py_ssize_t)> &fn) {
    unsigned n_threads = std::min<unsigned>(std::thread::hardware_concurrency(),
                                            (unsigned)std::max<Py_ssize_t>(n, 1));
    if (n_threads <= 1 || n < 64) {
        fn(0, n);
        return;
    }
    std::vector<std::thread> threads;
    Py_ssize_t chunk = (n + n_threads - 1) / n_threads;
    for (unsigned t = 0; t < n_threads; t++) {
        Py_ssize_t lo = t * chunk, hi = std::min<Py_ssize_t>(n, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back(fn, lo, hi);
    }
    for (auto &th : threads) th.join();
}

// gather_windows(X, img, oy, ox, out) with X (N, H, W) float32,
// img/oy/ox (n,) int64, out (n, WIN, WIN) float32 (pre-allocated).
PyObject *gather_windows(PyObject *, PyObject *args) {
    PyObject *x_o, *img_o, *oy_o, *ox_o, *out_o;
    if (!PyArg_ParseTuple(args, "OOOOO", &x_o, &img_o, &oy_o, &ox_o, &out_o))
        return nullptr;
    Buf x, img, oy, ox, out;
    if (!x.get(x_o, "X", "f", 3) || !img.get(img_o, "img", "l", 1) ||
        !oy.get(oy_o, "oy", "l", 1) || !ox.get(ox_o, "ox", "l", 1))
        return nullptr;
    if (PyObject_GetBuffer(out_o, &out.view,
                           PyBUF_C_CONTIGUOUS | PyBUF_FORMAT | PyBUF_WRITABLE) != 0)
        return nullptr;
    out.ok = true;

    const float *X = (const float *)x.view.buf;
    const int64_t *img_p = (const int64_t *)img.view.buf;
    const int64_t *oy_p = (const int64_t *)oy.view.buf;
    const int64_t *ox_p = (const int64_t *)ox.view.buf;
    float *out_p = (float *)out.view.buf;

    Py_ssize_t n = img.view.shape[0];
    Py_ssize_t H = x.view.shape[x.view.ndim - 2];
    Py_ssize_t W = x.view.shape[x.view.ndim - 1];
    Py_ssize_t win = out.view.shape[out.view.ndim - 1];

    Py_BEGIN_ALLOW_THREADS
    parallel_for(n, [&](Py_ssize_t lo, Py_ssize_t hi) {
        for (Py_ssize_t i = lo; i < hi; i++) {
            const float *src = X + (Py_ssize_t)img_p[i] * H * W;
            float *dst = out_p + i * win * win;
            for (Py_ssize_t r = 0; r < win; r++) {
                int64_t y = oy_p[i] + r;
                float *drow = dst + r * win;
                if (y < 0 || y >= H) {
                    std::memset(drow, 0, win * sizeof(float));
                    continue;
                }
                const float *srow = src + y * W;
                int64_t x0 = ox_p[i];
                int64_t lo_x = std::max<int64_t>(0, -x0);
                int64_t hi_x = std::min<int64_t>(win, W - x0);
                if (lo_x > 0) std::memset(drow, 0, lo_x * sizeof(float));
                if (hi_x < win && hi_x > lo_x)
                    std::memset(drow + hi_x, 0, (win - hi_x) * sizeof(float));
                if (hi_x > lo_x)
                    std::memcpy(drow + lo_x, srow + x0 + lo_x,
                                (hi_x - lo_x) * sizeof(float));
            }
        }
    });
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

inline float cubic_w(float t) {
    // Keys cubic convolution, a = -0.75 (OpenCV INTER_CUBIC)
    const float a = -0.75f;
    float x = std::fabs(t);
    if (x <= 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
    if (x < 2.0f) return ((a * x - 5.0f * a) * x + 8.0f * a) * x - 4.0f * a;
    return 0.0f;
}

// warp_patches(windows, minv, brightness, contrast, out, ws):
// windows (B, WIN, WIN) f32, minv (B, 6) f32 dst->src affines,
// out (B, ws, ws) f32.
PyObject *warp_patches(PyObject *, PyObject *args) {
    PyObject *w_o, *m_o, *b_o, *c_o, *out_o;
    if (!PyArg_ParseTuple(args, "OOOOO", &w_o, &m_o, &b_o, &c_o, &out_o))
        return nullptr;
    Buf w, m, b, c, out;
    if (!w.get(w_o, "windows", "f", 3) || !m.get(m_o, "minv", "f", 2) ||
        !b.get(b_o, "brightness", "f", 1) || !c.get(c_o, "contrast", "f", 1))
        return nullptr;
    if (PyObject_GetBuffer(out_o, &out.view,
                           PyBUF_C_CONTIGUOUS | PyBUF_FORMAT | PyBUF_WRITABLE) != 0)
        return nullptr;
    out.ok = true;

    const float *W_p = (const float *)w.view.buf;
    const float *M_p = (const float *)m.view.buf;
    const float *B_p = (const float *)b.view.buf;
    const float *C_p = (const float *)c.view.buf;
    float *out_p = (float *)out.view.buf;
    Py_ssize_t n = w.view.shape[0];
    Py_ssize_t WH = w.view.shape[1], WW = w.view.shape[2];
    Py_ssize_t ws = out.view.shape[out.view.ndim - 1];

    Py_BEGIN_ALLOW_THREADS
    parallel_for(n, [&](Py_ssize_t lo, Py_ssize_t hi) {
        for (Py_ssize_t i = lo; i < hi; i++) {
            const float *win = W_p + i * WH * WW;
            const float *mm = M_p + i * 6;
            float *dst = out_p + i * ws * ws;
            for (Py_ssize_t y = 0; y < ws; y++) {
                for (Py_ssize_t x = 0; x < ws; x++) {
                    float sx = mm[0] * x + mm[1] * y + mm[2];
                    float sy = mm[3] * x + mm[4] * y + mm[5];
                    int64_t x0 = (int64_t)std::floor(sx);
                    int64_t y0 = (int64_t)std::floor(sy);
                    float acc = 0.0f;
                    for (int dy = -1; dy <= 2; dy++) {
                        int64_t yy = y0 + dy;
                        if (yy < 0 || yy >= WH) continue;
                        float wy = cubic_w(sy - (float)yy);
                        for (int dx = -1; dx <= 2; dx++) {
                            int64_t xx = x0 + dx;
                            if (xx < 0 || xx >= WW) continue;
                            acc += win[yy * WW + xx] * wy * cubic_w(sx - (float)xx);
                        }
                    }
                    dst[y * ws + x] = acc * C_p[i] + B_p[i];
                }
            }
        }
    });
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"gather_windows", gather_windows, METH_VARARGS,
     "gather_windows(X, img, oy, ox, out): extract zero-padded windows"},
    {"warp_patches", warp_patches, METH_VARARGS,
     "warp_patches(windows, minv, brightness, contrast, out): bicubic warp"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "mccnn_native",
    "Native host data-path kernels", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_mccnn_native(void) { return PyModule_Create(&module); }
