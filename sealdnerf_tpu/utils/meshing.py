"""Mesh extraction: density field -> triangle mesh -> PLY.

Parity with reference nerf/utils.py:173-203 (extract_fields / extract_geometry
via mcubes) and the trimesh PLY export at :630; both dependencies are absent
from this image, so extraction uses the in-tree native C++ marching-tetrahedra
extension and PLY writing is a ~20-line binary writer.
"""

import struct

import numpy as np


def extract_fields(bound_min, bound_max, resolution, query_func, chunk=64):
    """Sweep the density field over a [resolution]^3 grid in chunks."""
    xs = np.linspace(bound_min[0], bound_max[0], resolution, dtype=np.float32)
    ys = np.linspace(bound_min[1], bound_max[1], resolution, dtype=np.float32)
    zs = np.linspace(bound_min[2], bound_max[2], resolution, dtype=np.float32)
    field = np.zeros((resolution,) * 3, dtype=np.float32)
    for xi in range(0, resolution, chunk):
        for yi in range(0, resolution, chunk):
            for zi in range(0, resolution, chunk):
                gx = xs[xi:xi + chunk]
                gy = ys[yi:yi + chunk]
                gz = zs[zi:zi + chunk]
                xx, yy, zz = np.meshgrid(gx, gy, gz, indexing="ij")
                pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=-1)
                val = np.asarray(query_func(pts)).reshape(xx.shape)
                field[xi:xi + len(gx), yi:yi + len(gy), zi:zi + len(gz)] = val
    return field


def extract_geometry(bound_min, bound_max, resolution, threshold, query_func):
    """Returns (verts [N,3] float32 world coords, tris [M,3] int32)."""
    from .native import load_native
    field = extract_fields(bound_min, bound_max, resolution, query_func)
    native = load_native()
    verts, tris = native.marching_tetrahedra(
        np.ascontiguousarray(field, dtype=np.float32), float(threshold))
    # grid coords -> world coords
    scale = (np.asarray(bound_max) - np.asarray(bound_min)) / (resolution - 1)
    verts = verts * scale[None].astype(np.float32) + \
        np.asarray(bound_min, dtype=np.float32)[None]
    return verts, tris


def save_ply(path, verts, tris):
    """Binary little-endian PLY writer."""
    verts = np.asarray(verts, dtype=np.float32)
    tris = np.asarray(tris, dtype=np.int32)
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(verts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(tris)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        f.write(verts.astype("<f4").tobytes())
        face = np.empty((len(tris), 13), dtype=np.uint8)
        face[:, 0] = 3
        face[:, 1:] = tris.astype("<i4").view(np.uint8).reshape(len(tris), 12)
        f.write(face.tobytes())


def load_ply(path):
    """Minimal binary PLY reader (for tests / seal mapper geometry)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode().strip()
            header.append(line)
            if line == "end_header":
                break
        nv = int([l for l in header if l.startswith("element vertex")][0]
                 .split()[-1])
        nf = int([l for l in header if l.startswith("element face")][0]
                 .split()[-1])
        verts = np.frombuffer(f.read(nv * 12), dtype="<f4").reshape(nv, 3)
        raw = np.frombuffer(f.read(nf * 13), dtype=np.uint8).reshape(nf, 13)
        tris = raw[:, 1:].copy().view("<i4").reshape(nf, 3)
    return verts.copy(), tris
