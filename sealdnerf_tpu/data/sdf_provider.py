"""SDF dataset: sample training points from a mesh.

Parity with reference sdf/provider.py:28-88: load a mesh, normalize to
[-1, 1], sample 7/8 surface points (half perturbed by N(0, 0.01)) and 1/8
uniform points; GT sdf for the non-exact half via a signed-distance query.

The reference's trimesh/pysdf dependencies are absent; meshes load from PLY
or OBJ with in-tree readers and the signed distance uses
editing/geometry.points_mesh_distance + points_in_mesh (exact, O(P*F) --
batched on device, fine for typical meshes; the sign convention matches
pysdf: positive inside, so GT sdf = -signed query like sdf/provider.py:74).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..editing.geometry import points_in_mesh, points_mesh_distance
from ..utils.meshing import load_ply


def load_mesh(path):
    """Load (verts, faces) from .ply (binary, in-tree) or .obj (ascii)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        return load_ply(path)
    if ext == ".obj":
        verts, faces = [], []
        with open(path) as f:
            for line in f:
                if line.startswith("v "):
                    verts.append([float(v) for v in line.split()[1:4]])
                elif line.startswith("f "):
                    idx = [int(t.split("/")[0]) - 1 for t in line.split()[1:4]]
                    faces.append(idx)
        return (np.asarray(verts, dtype=np.float32),
                np.asarray(faces, dtype=np.int32))
    raise ValueError(f"unsupported mesh format: {ext}")


def _tri_areas(verts, faces):
    a, b, c = (verts[faces[:, i]] for i in range(3))
    return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)


class SDFDataset:
    def __init__(self, path, size=100, num_samples=2 ** 18, clip_sdf=None,
                 seed=0):
        verts, faces = load_mesh(path)
        # normalize to [-1, 1] (sdf/provider.py:36-43)
        vmin, vmax = verts.min(0), verts.max(0)
        center = (vmin + vmax) / 2
        scale = 2.0 / np.sqrt(np.sum((vmax - vmin) ** 2)) * 0.95
        self.verts = ((verts - center) * scale).astype(np.float32)
        self.faces = faces
        self.tris = jnp.asarray(self.verts[self.faces])  # [F, 3, 3]
        self.areas = _tri_areas(self.verts, self.faces)
        self.area_p = self.areas / self.areas.sum()
        self.num_samples = num_samples
        assert num_samples % 8 == 0
        self.clip_sdf = clip_sdf
        self.size = size
        self.rng = np.random.default_rng(seed)
        # GT signed-distance queries use the native BVH (pysdf equivalent).
        # The exact O(P*F) jnp fallback exists for tiny meshes / tests, runs
        # on the host CPU backend (the axon TPU compiler's fusion pass SIGILLs
        # on the point-triangle distance graph -- compiler bug, traced to
        # xla::jellyfish::TpuPriorityFusionQueue).
        self._native_sdf = None
        try:
            from ..utils.native import load_native
            self._native_sdf = load_native().SignedDistance(
                np.ascontiguousarray(self.verts, dtype=np.float32),
                np.ascontiguousarray(self.faces, dtype=np.int32))
        except Exception as e:
            print(f"[WARN] native SDF unavailable ({e}); jnp fallback")
            cpu = jax.devices("cpu")[0]
            self._sdf_query_jnp = jax.jit(self._sdf_query_impl, device=cpu)

    def _sdf_query(self, pts):
        if self._native_sdf is not None:
            return self._native_sdf.query(
                np.ascontiguousarray(pts, dtype=np.float32))
        return self._sdf_query_jnp(jnp.asarray(pts))

    def _sdf_query_impl(self, pts):
        d = points_mesh_distance(pts, self.tris)
        inside = points_in_mesh(pts, self.tris)
        return jnp.where(inside, d, -d)  # pysdf: positive inside

    def sample_surface(self, n):
        fi = self.rng.choice(len(self.faces), n, p=self.area_p)
        u = self.rng.random((n, 1))
        v = self.rng.random((n, 1))
        flip = (u + v) > 1
        u = np.where(flip, 1 - u, u)
        v = np.where(flip, 1 - v, v)
        a, b, c = (self.verts[self.faces[fi, i]] for i in range(3))
        return a + u * (b - a) + v * (c - a)

    def __len__(self):
        return self.size

    def sample_batch(self):
        """-> dict(points [N, 3], sdfs [N, 1]) matching sdf/provider.py:63-88."""
        n = self.num_samples
        surf = self.sample_surface(n * 7 // 8).astype(np.float32)
        surf[n // 2:] += 0.01 * self.rng.standard_normal(
            (surf[n // 2:].shape[0], 3))
        uniform = (self.rng.random((n // 8, 3)) * 2 - 1).astype(np.float32)
        points = np.concatenate([surf, uniform], axis=0).astype(np.float32)
        sdfs = np.zeros((n, 1), dtype=np.float32)
        # exact-surface half has sdf 0; query the rest in chunks sized so the
        # O(P*F) distance intermediates stay bounded (~64M pairs per chunk)
        q = points[n // 2:]
        out = []
        chunk = max(256, min(65536, (1 << 26) // max(len(self.faces), 1)))
        pad = (-len(q)) % chunk
        qp = np.concatenate([q, np.zeros((pad, 3), np.float32)])
        for i in range(0, len(qp), chunk):
            out.append(np.asarray(self._sdf_query(jnp.asarray(qp[i:i + chunk]))))
        sdfs[n // 2:, 0] = -np.concatenate(out)[:len(q)]
        if self.clip_sdf is not None:
            sdfs = sdfs.clip(-self.clip_sdf, self.clip_sdf)
        return {"points": points, "sdfs": sdfs}

    def __getitem__(self, _):
        return self.sample_batch()
