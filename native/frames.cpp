// Native GUI-frame decoding for sealdnerf_tpu.
//
// The renderers ship frames over the axon tunnel in a packed wire format
// (train/fast.py _build_renderer: BT.601 Y at full res + 2x2-subsampled
// Cb/Cr [+ f16 depth at half res]). Decoding that with numpy in fetch
// worker threads holds the GIL long enough to starve the tunnel client's
// event loop -- measured 63 -> 900 ms/frame collapses in the 8-worker
// FPS loop (profiling notes, round 3). This decoder does the same math
// in C with Py_BEGIN_ALLOW_THREADS around the loop (~2 ms per 800x800
// frame, zero GIL hold during the work).
//
//   _sealdnerf_frames.yuv420_to_rgb(raw u8[.], rh, rw, with_depth)
//     -> (rgb f32 [rh, rw, 3], depth f32 [rh, rw] | None)
//
// Matches FastTrainer._unpack_frame_yuv420 (the numpy reference kept for
// parity tests): chroma/depth upsampled nearest, rgb clipped to [0, 1].

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdint>

static inline float clip01(float v) {
    return v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
}

// IEEE binary16 -> binary32 (handles normals, subnormals, inf/nan)
static inline float half_to_float(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1Fu;
    uint32_t man = h & 0x3FFu;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal: normalize
            int shift = 0;
            while (!(man & 0x400u)) { man <<= 1; ++shift; }
            man &= 0x3FFu;
            bits = sign | ((uint32_t)(127 - 14 - shift) << 23) | (man << 13);
        }
    } else if (exp == 0x1Fu) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float out;
    memcpy(&out, &bits, 4);
    return out;
}

static PyObject* yuv420_to_rgb(PyObject*, PyObject* args) {
    PyObject* raw_obj;
    int rh, rw, with_depth;
    if (!PyArg_ParseTuple(args, "Oiii", &raw_obj, &rh, &rw, &with_depth))
        return nullptr;
    PyArrayObject* raw = (PyArrayObject*)PyArray_FROM_OTF(
        raw_obj, NPY_UINT8, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
    if (!raw) return nullptr;
    if (rh % 2 || rw % 2) {
        Py_DECREF(raw);
        PyErr_SetString(PyExc_ValueError, "rh/rw must be even");
        return nullptr;
    }
    const npy_intp n = (npy_intp)rh * rw;
    const npy_intp q = (npy_intp)(rh / 2) * (rw / 2);
    const npy_intp need = n + 2 * q + (with_depth ? 2 * q : 0);
    if (PyArray_SIZE(raw) < need) {
        Py_DECREF(raw);
        PyErr_Format(PyExc_ValueError, "raw too small: %ld < %ld",
                     (long)PyArray_SIZE(raw), (long)need);
        return nullptr;
    }

    npy_intp dims3[3] = {rh, rw, 3};
    npy_intp dims2[2] = {rh, rw};
    PyArrayObject* rgb =
        (PyArrayObject*)PyArray_SimpleNew(3, dims3, NPY_FLOAT32);
    PyArrayObject* dep = with_depth
        ? (PyArrayObject*)PyArray_SimpleNew(2, dims2, NPY_FLOAT32)
        : nullptr;
    if (!rgb || (with_depth && !dep)) {
        Py_XDECREF(rgb); Py_XDECREF(dep); Py_DECREF(raw);
        return nullptr;
    }

    const uint8_t* p = (const uint8_t*)PyArray_DATA(raw);
    float* o = (float*)PyArray_DATA(rgb);
    float* d = dep ? (float*)PyArray_DATA(dep) : nullptr;

    Py_BEGIN_ALLOW_THREADS
    const uint8_t* Y = p;
    const uint8_t* CB = p + n;
    const uint8_t* CR = p + n + q;
    const int w2 = rw / 2;
    const float s = 1.0f / 255.0f;
    for (int i = 0; i < rh; ++i) {
        const uint8_t* yr = Y + (npy_intp)i * rw;
        const uint8_t* cbr = CB + (npy_intp)(i / 2) * w2;
        const uint8_t* crr = CR + (npy_intp)(i / 2) * w2;
        float* orow = o + (npy_intp)i * rw * 3;
        for (int j = 0; j < rw; ++j) {
            const float y = yr[j] * s;
            const float cb = cbr[j >> 1] * s - 0.5f;
            const float cr = crr[j >> 1] * s - 0.5f;
            orow[3 * j + 0] = clip01(y + 1.402f * cr);
            orow[3 * j + 1] = clip01(y - 0.344136f * cb - 0.714136f * cr);
            orow[3 * j + 2] = clip01(y + 1.772f * cb);
        }
    }
    if (d) {
        const uint8_t* D = p + n + 2 * q;
        for (int i = 0; i < rh; ++i) {
            const uint8_t* drow = D + (npy_intp)(i / 2) * w2 * 2;
            float* od = d + (npy_intp)i * rw;
            for (int j = 0; j < rw; ++j) {
                uint16_t hbits;
                memcpy(&hbits, drow + 2 * (j >> 1), 2);
                od[j] = half_to_float(hbits);
            }
        }
    }
    Py_END_ALLOW_THREADS

    Py_DECREF(raw);
    PyObject* dep_out = dep ? (PyObject*)dep : Py_None;
    if (!dep) Py_INCREF(Py_None);
    PyObject* result = Py_BuildValue("(NN)", (PyObject*)rgb, dep_out);
    return result;
}

static PyMethodDef Methods[] = {
    {"yuv420_to_rgb", yuv420_to_rgb, METH_VARARGS,
     "Decode the packed GUI wire frame: (raw u8, rh, rw, with_depth) -> "
     "(rgb f32 [rh,rw,3], depth f32 [rh,rw] | None). Releases the GIL."},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_sealdnerf_frames",
    "Native GUI frame decoding", -1, Methods,
};

PyMODINIT_FUNC PyInit__sealdnerf_frames(void) {
    import_array();
    return PyModule_Create(&moduledef);
}
