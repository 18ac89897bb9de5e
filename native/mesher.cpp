// Native mesh extraction for sealdnerf_tpu.
//
// Replaces the reference's mcubes dependency (nerf/utils.py:173-203
// extract_geometry -> mcubes.marching_cubes) with an in-tree C++ extension.
// Algorithm: marching tetrahedra (each cube split into 6 tets around the
// 0-6 diagonal). Compared to classic marching cubes this needs no 256-entry
// case tables (so it is verifiable by reading), produces a watertight
// triangulation of the same iso-surface, at ~2x triangle count -- fine for
// the mesh-export capability.
//
// Also provides a BVH-accelerated signed-distance query (replacing the
// reference's pysdf dependency, sdf/provider.py:51): median-split AABB BVH
// over triangles, nearest-distance traversal, sign via +x ray-crossing
// parity. OpenMP-free (plain threads avoided): queries release the GIL and
// run single-threaded per call; callers batch.
//
// Exposed via the CPython C API (pybind11 is not available in this image):
//   _sealdnerf_native.marching_tetrahedra(field, threshold)
//     field: float32 C-contiguous [X, Y, Z]
//     returns (verts [N,3] float32 in grid coords, tris [M,3] int32)
//   _sealdnerf_native.SignedDistance(verts [V,3] f32, faces [F,3] i32)
//     .query(points [P,3] f32) -> sdf [P] f32  (positive inside, like pysdf)

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct MeshAccum {
  std::vector<float> verts;              // xyz triples
  std::vector<int32_t> tris;             // index triples
  std::unordered_map<uint64_t, int32_t> edge_cache;
};

// Unique id per grid vertex.
static inline uint64_t vid(int64_t x, int64_t y, int64_t z, int64_t Y,
                           int64_t Z) {
  return (uint64_t)((x * Y + y) * Z + z);
}

// Interpolated vertex on the edge between grid vertices a and b.
static int32_t edge_vertex(MeshAccum& m, uint64_t ia, uint64_t ib,
                           const float* pa, const float* pb, float va,
                           float vb, float thresh) {
  uint64_t key_lo = ia < ib ? ia : ib;
  uint64_t key_hi = ia < ib ? ib : ia;
  // ids fit in 40 bits for grids up to 1024^3; combine via 64-bit mix.
  uint64_t key = key_lo * 0x9E3779B97F4A7C15ull ^ key_hi;
  auto it = m.edge_cache.find(key);
  if (it != m.edge_cache.end()) return it->second;
  float denom = vb - va;
  float t = denom != 0.0f ? (thresh - va) / denom : 0.5f;
  if (t < 0.0f) t = 0.0f;
  if (t > 1.0f) t = 1.0f;
  int32_t idx = (int32_t)(m.verts.size() / 3);
  for (int k = 0; k < 3; ++k)
    m.verts.push_back(pa[k] + t * (pb[k] - pa[k]));
  m.edge_cache.emplace(key, idx);
  return idx;
}

struct Corner {
  uint64_t id;
  float pos[3];
  float val;
};

static void do_tet(MeshAccum& m, const Corner& a, const Corner& b,
                   const Corner& c, const Corner& d, float thresh) {
  int code = (a.val > thresh ? 1 : 0) | (b.val > thresh ? 2 : 0) |
             (c.val > thresh ? 4 : 0) | (d.val > thresh ? 8 : 0);
  if (code == 0 || code == 15) return;

  auto ev = [&](const Corner& p, const Corner& q) {
    return edge_vertex(m, p.id, q.id, p.pos, q.pos, p.val, q.val, thresh);
  };
  auto tri = [&](int32_t i, int32_t j, int32_t k) {
    m.tris.push_back(i);
    m.tris.push_back(j);
    m.tris.push_back(k);
  };

  switch (code) {
    // one corner inside -> one triangle on its three edges
    case 1:  tri(ev(a, b), ev(a, c), ev(a, d)); break;
    case 2:  tri(ev(b, a), ev(b, d), ev(b, c)); break;
    case 4:  tri(ev(c, a), ev(c, b), ev(c, d)); break;
    case 8:  tri(ev(d, a), ev(d, c), ev(d, b)); break;
    // one corner outside -> mirrored triangle
    case 14: tri(ev(a, b), ev(a, d), ev(a, c)); break;
    case 13: tri(ev(b, a), ev(b, c), ev(b, d)); break;
    case 11: tri(ev(c, a), ev(c, d), ev(c, b)); break;
    case 7:  tri(ev(d, a), ev(d, b), ev(d, c)); break;
    // two in / two out -> quad (two triangles)
    case 3: {  // a, b inside
      int32_t e0 = ev(a, c), e1 = ev(a, d), e2 = ev(b, d), e3 = ev(b, c);
      tri(e0, e1, e2); tri(e0, e2, e3); break;
    }
    case 12: {
      int32_t e0 = ev(a, c), e1 = ev(a, d), e2 = ev(b, d), e3 = ev(b, c);
      tri(e0, e2, e1); tri(e0, e3, e2); break;
    }
    case 5: {  // a, c inside
      int32_t e0 = ev(a, b), e1 = ev(a, d), e2 = ev(c, d), e3 = ev(c, b);
      tri(e0, e2, e1); tri(e0, e3, e2); break;
    }
    case 10: {
      int32_t e0 = ev(a, b), e1 = ev(a, d), e2 = ev(c, d), e3 = ev(c, b);
      tri(e0, e1, e2); tri(e0, e2, e3); break;
    }
    case 6: {  // b, c inside
      int32_t e0 = ev(b, a), e1 = ev(b, d), e2 = ev(c, d), e3 = ev(c, a);
      tri(e0, e1, e2); tri(e0, e2, e3); break;
    }
    case 9: {
      int32_t e0 = ev(b, a), e1 = ev(b, d), e2 = ev(c, d), e3 = ev(c, a);
      tri(e0, e2, e1); tri(e0, e3, e2); break;
    }
  }
}

PyObject* marching_tetrahedra(PyObject*, PyObject* args) {
  PyArrayObject* field_obj = nullptr;
  double thresh_d = 0.0;
  if (!PyArg_ParseTuple(args, "O!d", &PyArray_Type, &field_obj, &thresh_d))
    return nullptr;
  if (PyArray_NDIM(field_obj) != 3 ||
      PyArray_TYPE(field_obj) != NPY_FLOAT32 ||
      !PyArray_IS_C_CONTIGUOUS(field_obj)) {
    PyErr_SetString(PyExc_ValueError,
                    "field must be a C-contiguous float32 [X, Y, Z] array");
    return nullptr;
  }
  const float thresh = (float)thresh_d;
  const npy_intp* dims = PyArray_DIMS(field_obj);
  const int64_t X = dims[0], Y = dims[1], Z = dims[2];
  const float* f = (const float*)PyArray_DATA(field_obj);

  MeshAccum m;
  m.verts.reserve(1 << 16);
  m.tris.reserve(1 << 16);

  // cube corner offsets (v0..v7), diagonal v0-v6
  static const int off[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                                {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
  static const int tets[6][4] = {{0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
                                 {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};

  Py_BEGIN_ALLOW_THREADS
  Corner corners[8];
  for (int64_t x = 0; x + 1 < X; ++x) {
    for (int64_t y = 0; y + 1 < Y; ++y) {
      const float* row = f + (x * Y + y) * Z;
      for (int64_t z = 0; z + 1 < Z; ++z) {
        // skip cubes entirely on one side (fast path)
        const float v000 = row[z], v001 = row[z + 1];
        const float v010 = row[Z + z], v011 = row[Z + z + 1];
        const float* row1 = row + Y * Z;
        const float v100 = row1[z], v101 = row1[z + 1];
        const float v110 = row1[Z + z], v111 = row1[Z + z + 1];
        const bool any_in = v000 > thresh || v001 > thresh || v010 > thresh ||
                            v011 > thresh || v100 > thresh || v101 > thresh ||
                            v110 > thresh || v111 > thresh;
        const bool all_in = v000 > thresh && v001 > thresh && v010 > thresh &&
                            v011 > thresh && v100 > thresh && v101 > thresh &&
                            v110 > thresh && v111 > thresh;
        if (!any_in || all_in) continue;
        for (int ci = 0; ci < 8; ++ci) {
          const int64_t cx = x + off[ci][0], cy = y + off[ci][1],
                        cz = z + off[ci][2];
          corners[ci].id = vid(cx, cy, cz, Y, Z);
          corners[ci].pos[0] = (float)cx;
          corners[ci].pos[1] = (float)cy;
          corners[ci].pos[2] = (float)cz;
          corners[ci].val = f[(cx * Y + cy) * Z + cz];
        }
        for (int t = 0; t < 6; ++t)
          do_tet(m, corners[tets[t][0]], corners[tets[t][1]],
                 corners[tets[t][2]], corners[tets[t][3]], thresh);
      }
    }
  }
  Py_END_ALLOW_THREADS

  npy_intp vdims[2] = {(npy_intp)(m.verts.size() / 3), 3};
  npy_intp tdims[2] = {(npy_intp)(m.tris.size() / 3), 3};
  PyObject* varr = PyArray_SimpleNew(2, vdims, NPY_FLOAT32);
  PyObject* tarr = PyArray_SimpleNew(2, tdims, NPY_INT32);
  if (!varr || !tarr) return nullptr;
  memcpy(PyArray_DATA((PyArrayObject*)varr), m.verts.data(),
         m.verts.size() * sizeof(float));
  memcpy(PyArray_DATA((PyArrayObject*)tarr), m.tris.data(),
         m.tris.size() * sizeof(int32_t));
  return Py_BuildValue("(NN)", varr, tarr);
}

// ------------------------------------------------------------------ BVH SDF

struct BvhNode {
  float bmin[3], bmax[3];
  int32_t left = -1, right = -1;   // children, or
  int32_t start = 0, count = 0;    // leaf triangle range
};

struct SdfData {
  std::vector<float> tris;      // [F, 9]
  std::vector<int32_t> order;   // triangle permutation
  std::vector<BvhNode> nodes;
};

static inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// squared distance point-triangle (Ericson, Real-Time Collision Detection)
static float point_tri_d2(const float* p, const float* t) {
  float ab[3], ac[3], ap[3];
  for (int i = 0; i < 3; ++i) {
    ab[i] = t[3 + i] - t[i];
    ac[i] = t[6 + i] - t[i];
    ap[i] = p[i] - t[i];
  }
  auto dot = [](const float* a, const float* b) {
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
  };
  float d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0 && d2 <= 0) return dot(ap, ap);
  float bp[3] = {p[0] - t[3], p[1] - t[4], p[2] - t[5]};
  float d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0 && d4 <= d3) return dot(bp, bp);
  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    float v = d1 / (d1 - d3);
    float q[3] = {ap[0] - v * ab[0], ap[1] - v * ab[1], ap[2] - v * ab[2]};
    return dot(q, q);
  }
  float cp[3] = {p[0] - t[6], p[1] - t[7], p[2] - t[8]};
  float d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0 && d5 <= d6) return dot(cp, cp);
  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    float w = d2 / (d2 - d6);
    float q[3] = {ap[0] - w * ac[0], ap[1] - w * ac[1], ap[2] - w * ac[2]};
    return dot(q, q);
  }
  float va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    float q[3] = {bp[0] - w * (t[6] - t[3]), bp[1] - w * (t[7] - t[4]),
                  bp[2] - w * (t[8] - t[5])};
    return dot(q, q);
  }
  float denom = 1.0f / (va + vb + vc);
  float v = vb * denom, w = vc * denom;
  float q[3] = {ap[0] - v * ab[0] - w * ac[0], ap[1] - v * ab[1] - w * ac[1],
                ap[2] - v * ab[2] - w * ac[2]};
  return dot(q, q);
}

// +x ray / triangle crossing test (Moller-Trumbore specialized to d=(1,0,0))
static bool ray_px_hits(const float* p, const float* t) {
  const float e1[3] = {t[3] - t[0], t[4] - t[1], t[5] - t[2]};
  const float e2[3] = {t[6] - t[0], t[7] - t[1], t[8] - t[2]};
  // h = d x e2 = (0, -e2z, e2y)
  const float a = e1[1] * (-e2[2]) + e1[2] * e2[1];
  if (a > -1e-9f && a < 1e-9f) return false;
  const float f = 1.0f / a;
  const float s[3] = {p[0] - t[0], p[1] - t[1], p[2] - t[2]};
  const float u = f * (s[1] * (-e2[2]) + s[2] * e2[1]);
  if (u < 0 || u > 1) return false;
  // q = s x e1
  const float q[3] = {s[1] * e1[2] - s[2] * e1[1],
                      s[2] * e1[0] - s[0] * e1[2],
                      s[0] * e1[1] - s[1] * e1[0]};
  const float v = f * q[0];  // d . q with d = +x
  if (v < 0 || u + v > 1) return false;
  const float tt = f * (e2[0] * q[0] + e2[1] * q[1] + e2[2] * q[2]);
  return tt > 1e-9f;
}

static int build_bvh(SdfData& d, std::vector<int32_t>& idx, int start,
                     int count, std::vector<float>& cents) {
  BvhNode node;
  for (int k = 0; k < 3; ++k) {
    node.bmin[k] = 1e30f;
    node.bmax[k] = -1e30f;
  }
  for (int i = start; i < start + count; ++i) {
    const float* t = &d.tris[(size_t)idx[i] * 9];
    for (int c = 0; c < 3; ++c)
      for (int k = 0; k < 3; ++k) {
        node.bmin[k] = std::min(node.bmin[k], t[3 * c + k]);
        node.bmax[k] = std::max(node.bmax[k], t[3 * c + k]);
      }
  }
  int id = (int)d.nodes.size();
  d.nodes.push_back(node);
  if (count <= 4) {
    d.nodes[id].start = start;
    d.nodes[id].count = count;
    return id;
  }
  int axis = 0;
  float ext = node.bmax[0] - node.bmin[0];
  for (int k = 1; k < 3; ++k)
    if (node.bmax[k] - node.bmin[k] > ext) {
      ext = node.bmax[k] - node.bmin[k];
      axis = k;
    }
  int mid = start + count / 2;
  std::nth_element(idx.begin() + start, idx.begin() + mid,
                   idx.begin() + start + count,
                   [&](int32_t a, int32_t b) {
                     return cents[(size_t)a * 3 + axis] <
                            cents[(size_t)b * 3 + axis];
                   });
  int l = build_bvh(d, idx, start, count / 2, cents);
  int r = build_bvh(d, idx, mid, count - count / 2, cents);
  d.nodes[id].left = l;
  d.nodes[id].right = r;
  d.nodes[id].count = 0;
  return id;
}

static inline float box_d2(const float* p, const BvhNode& n) {
  float s = 0;
  for (int k = 0; k < 3; ++k) {
    float v = clampf(p[k], n.bmin[k], n.bmax[k]) - p[k];
    s += v * v;
  }
  return s;
}

static void nearest_d2(const SdfData& d, const std::vector<int32_t>& idx,
                       const float* p, int node, float& best) {
  const BvhNode& n = d.nodes[node];
  if (box_d2(p, n) >= best) return;
  if (n.left < 0) {
    for (int i = n.start; i < n.start + n.count; ++i)
      best = std::min(best, point_tri_d2(p, &d.tris[(size_t)idx[i] * 9]));
    return;
  }
  float dl = box_d2(p, d.nodes[n.left]);
  float dr = box_d2(p, d.nodes[n.right]);
  if (dl < dr) {
    nearest_d2(d, idx, p, n.left, best);
    nearest_d2(d, idx, p, n.right, best);
  } else {
    nearest_d2(d, idx, p, n.right, best);
    nearest_d2(d, idx, p, n.left, best);
  }
}

static int count_px_crossings(const SdfData& d,
                              const std::vector<int32_t>& idx, const float* p,
                              int node) {
  const BvhNode& n = d.nodes[node];
  // the +x ray from p intersects the box iff p is within the yz slab and
  // box xmax is ahead of p
  if (p[1] < n.bmin[1] || p[1] > n.bmax[1] || p[2] < n.bmin[2] ||
      p[2] > n.bmax[2] || p[0] > n.bmax[0])
    return 0;
  if (n.left < 0) {
    int c = 0;
    for (int i = n.start; i < n.start + n.count; ++i)
      c += ray_px_hits(p, &d.tris[(size_t)idx[i] * 9]) ? 1 : 0;
    return c;
  }
  return count_px_crossings(d, idx, p, n.left) +
         count_px_crossings(d, idx, p, n.right);
}

typedef struct {
  PyObject_HEAD
  SdfData* data;
  std::vector<int32_t>* idx;
} SignedDistanceObject;

static int SignedDistance_init(SignedDistanceObject* self, PyObject* args,
                               PyObject*) {
  PyArrayObject *verts_obj, *faces_obj;
  if (!PyArg_ParseTuple(args, "O!O!", &PyArray_Type, &verts_obj,
                        &PyArray_Type, &faces_obj))
    return -1;
  if (PyArray_TYPE(verts_obj) != NPY_FLOAT32 ||
      PyArray_TYPE(faces_obj) != NPY_INT32 ||
      !PyArray_IS_C_CONTIGUOUS(verts_obj) ||
      !PyArray_IS_C_CONTIGUOUS(faces_obj)) {
    PyErr_SetString(PyExc_ValueError,
                    "verts must be f32 [V,3] C-contig, faces i32 [F,3]");
    return -1;
  }
  const float* v = (const float*)PyArray_DATA(verts_obj);
  const int32_t* f = (const int32_t*)PyArray_DATA(faces_obj);
  const int64_t nf = PyArray_DIMS(faces_obj)[0];
  self->data = new SdfData();
  self->idx = new std::vector<int32_t>(nf);
  self->data->tris.resize((size_t)nf * 9);
  std::vector<float> cents((size_t)nf * 3);
  for (int64_t i = 0; i < nf; ++i) {
    for (int c = 0; c < 3; ++c)
      for (int k = 0; k < 3; ++k)
        self->data->tris[(size_t)i * 9 + 3 * c + k] =
            v[(size_t)f[i * 3 + c] * 3 + k];
    for (int k = 0; k < 3; ++k)
      cents[(size_t)i * 3 + k] =
          (self->data->tris[(size_t)i * 9 + k] +
           self->data->tris[(size_t)i * 9 + 3 + k] +
           self->data->tris[(size_t)i * 9 + 6 + k]) / 3.0f;
    (*self->idx)[i] = (int32_t)i;
  }
  build_bvh(*self->data, *self->idx, 0, (int)nf, cents);
  return 0;
}

static void SignedDistance_dealloc(SignedDistanceObject* self) {
  delete self->data;
  delete self->idx;
  Py_TYPE(self)->tp_free((PyObject*)self);
}

static PyObject* SignedDistance_query(SignedDistanceObject* self,
                                      PyObject* args) {
  PyArrayObject* pts_obj;
  if (!PyArg_ParseTuple(args, "O!", &PyArray_Type, &pts_obj)) return nullptr;
  if (PyArray_TYPE(pts_obj) != NPY_FLOAT32 ||
      !PyArray_IS_C_CONTIGUOUS(pts_obj) || PyArray_NDIM(pts_obj) != 2) {
    PyErr_SetString(PyExc_ValueError, "points must be f32 [P,3] C-contig");
    return nullptr;
  }
  const int64_t n = PyArray_DIMS(pts_obj)[0];
  const float* p = (const float*)PyArray_DATA(pts_obj);
  npy_intp dims[1] = {n};
  PyObject* out_obj = PyArray_SimpleNew(1, dims, NPY_FLOAT32);
  float* out = (float*)PyArray_DATA((PyArrayObject*)out_obj);
  Py_BEGIN_ALLOW_THREADS
  for (int64_t i = 0; i < n; ++i) {
    float best = 1e30f;
    nearest_d2(*self->data, *self->idx, p + i * 3, 0, best);
    int crossings = count_px_crossings(*self->data, *self->idx, p + i * 3, 0);
    float dist = std::sqrt(best);
    out[i] = (crossings % 2 == 1) ? dist : -dist;  // positive inside (pysdf)
  }
  Py_END_ALLOW_THREADS
  return out_obj;
}

static PyMethodDef SignedDistance_methods[] = {
    {"query", (PyCFunction)SignedDistance_query, METH_VARARGS,
     "query(points_f32 [P,3]) -> sdf [P] (positive inside)"},
    {nullptr, nullptr, 0, nullptr}};

static PyTypeObject SignedDistanceType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

PyMethodDef methods[] = {
    {"marching_tetrahedra", marching_tetrahedra, METH_VARARGS,
     "marching_tetrahedra(field_f32_xyz, threshold) -> (verts, tris)"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_sealdnerf_native", nullptr,
                         -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__sealdnerf_native(void) {
  import_array();
  PyObject* m = PyModule_Create(&moduledef);
  if (!m) return nullptr;
  SignedDistanceType.tp_name = "_sealdnerf_native.SignedDistance";
  SignedDistanceType.tp_basicsize = sizeof(SignedDistanceObject);
  SignedDistanceType.tp_flags = Py_TPFLAGS_DEFAULT;
  SignedDistanceType.tp_doc = "BVH signed-distance query (positive inside)";
  SignedDistanceType.tp_new = PyType_GenericNew;
  SignedDistanceType.tp_init = (initproc)SignedDistance_init;
  SignedDistanceType.tp_dealloc = (destructor)SignedDistance_dealloc;
  SignedDistanceType.tp_methods = SignedDistance_methods;
  if (PyType_Ready(&SignedDistanceType) < 0) return nullptr;
  Py_INCREF(&SignedDistanceType);
  PyModule_AddObject(m, "SignedDistance", (PyObject*)&SignedDistanceType);
  return m;
}
