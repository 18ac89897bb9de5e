"""Host-side (numpy) geometry used to build seal mappers at edit-config time,
plus traced (jnp) point/mesh predicates used inside the render step.

Replaces the reference's trimesh / pytorch3d / skspatial / open3d dependency
stack (SealNeRF/seal_utils.py:602-744), none of which exist in this image:
- oriented_bounding_box: PCA OBB (approximates trimesh's minimum-volume OBB;
  identical for the axis-aligned and near-axis-aligned edit regions the tools
  produce).
- plane_best_fit: least-squares plane (skspatial.objects.Plane.best_fit).
- box/sphere/extruded-surface meshes: trimesh.creation equivalents.
- moller_trumbore / points_in_mesh: the batched ray-triangle test the
  reference already implemented manually (seal_utils.py:638-693) -- naturally
  TPU-shaped (one einsum per (ray, face) pair).
- points_mesh_distance: point-to-triangle distance (pytorch3d
  _C.point_face_dist), vectorized closed form.
"""

import numpy as np
import jax.numpy as jnp

_BOX_FACES = np.array([
    [0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
    [0, 4, 5], [0, 5, 1], [1, 5, 6], [1, 6, 2],
    [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0],
], dtype=np.int32)


def box_mesh(verts8):
    """8 corner verts (ordered: bottom loop then top loop) -> (verts, faces)."""
    return np.asarray(verts8, dtype=np.float32), _BOX_FACES.copy()


def aabb_mesh(bmin, bmax):
    bmin, bmax = np.asarray(bmin), np.asarray(bmax)
    corners = np.array([
        [bmin[0], bmin[1], bmin[2]], [bmax[0], bmin[1], bmin[2]],
        [bmax[0], bmax[1], bmin[2]], [bmin[0], bmax[1], bmin[2]],
        [bmin[0], bmin[1], bmax[2]], [bmax[0], bmin[1], bmax[2]],
        [bmax[0], bmax[1], bmax[2]], [bmin[0], bmax[1], bmax[2]],
    ], dtype=np.float32)
    return box_mesh(corners)


def oriented_bounding_box(points):
    """PCA oriented bounding box.

    Returns (verts [8,3], faces [12,3], rotation [3,3], center [3],
    extents [3]). rotation maps local -> world.
    """
    pts = np.asarray(points, dtype=np.float64)
    center0 = pts.mean(0)
    cov = np.cov((pts - center0).T) if len(pts) > 1 else np.eye(3)
    _, vecs = np.linalg.eigh(cov + 1e-12 * np.eye(3))
    rot = vecs  # columns are axes
    local = (pts - center0) @ rot
    lmin, lmax = local.min(0), local.max(0)
    extents = lmax - lmin
    lcenter = (lmin + lmax) / 2
    center = center0 + rot @ lcenter
    half = extents / 2
    signs = np.array([
        [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
        [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
    ], dtype=np.float64)
    verts = center + (signs * half) @ rot.T
    return (verts.astype(np.float32), _BOX_FACES.copy(),
            rot.astype(np.float32), center.astype(np.float32),
            extents.astype(np.float32))


def plane_best_fit(points):
    """Least-squares plane. Returns (point [3], normal [3] unit)."""
    pts = np.asarray(points, dtype=np.float64)
    c = pts.mean(0)
    _, _, vh = np.linalg.svd(pts - c, full_matrices=False)
    n = vh[-1]
    return c.astype(np.float32), (n / np.linalg.norm(n)).astype(np.float32)


def uv_sphere_points(radius: float, n_theta: int = 12, n_phi: int = 24):
    th = np.linspace(0, np.pi, n_theta)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    pts = radius * np.stack([
        np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp), np.cos(tt)
    ], axis=-1).reshape(-1, 3)
    return pts.astype(np.float32)


def extruded_surface_mesh(points, normal, growth=(-0.3, 2.0)):
    """Brush 'curve' mesh: Delaunay-triangulate the painted points in their
    best-fit plane and extrude along `normal` by growth[0]..growth[1] times
    ||normal|| (replaces seal_utils.py get_trimesh_fit's KNN + open3d
    pipeline with scipy Delaunay -- same surface, simpler construction)."""
    from scipy.spatial import Delaunay
    pts = np.asarray(points, dtype=np.float64)
    n = np.asarray(normal, dtype=np.float64)
    n_unit = n / (np.linalg.norm(n) + 1e-12)
    # plane coordinates
    a = np.array([1.0, 0, 0]) if abs(n_unit[0]) < 0.9 else np.array([0, 1.0, 0])
    u = np.cross(n_unit, a); u /= np.linalg.norm(u)
    v = np.cross(n_unit, u)
    uv = np.stack([pts @ u, pts @ v], axis=-1)
    tri = Delaunay(uv)
    faces2d = tri.simplices  # [F, 3]
    nv = len(pts)
    bottom = pts + growth[0] * n
    top = pts + growth[1] * n
    verts = np.concatenate([bottom, top], axis=0)
    faces = [faces2d, faces2d[:, ::-1] + nv]
    # side walls from the convex hull edges
    hull = tri.convex_hull  # [E, 2]
    for e0, e1 in hull:
        faces.append(np.array([[e0, e1, e1 + nv], [e0, e1 + nv, e0 + nv]]))
    faces = np.concatenate([np.asarray(f).reshape(-1, 3) for f in faces])
    return verts.astype(np.float32), faces.astype(np.int32)


def mesh_triangles(verts, faces):
    """-> [F, 3, 3] float32 triangle array (the traced-side representation)."""
    return np.asarray(verts, dtype=np.float32)[np.asarray(faces)]


# --------------------------------------------------------------------- traced

# magic direction from trimesh.Trimesh.contains_points (seal_utils.py:681-683)
DEFAULT_TEST_DIR = jnp.array([[0.4395064455, 0.617598629942, 0.652231566745]])


def moller_trumbore(ray_o, ray_d, tris, eps: float = 1e-8):
    """Batched any-hit ray-triangle test (seal_utils.py:638-672).

    ray_o, ray_d: [N, 3]; tris: [F, 3, 3]. Returns bool [N].
    """
    e1 = tris[:, 1] - tris[:, 0]  # [F, 3]
    e2 = tris[:, 2] - tris[:, 0]
    n = jnp.cross(e1, e2)  # [F, 3]
    invdet = 1.0 / -(jnp.einsum("md,nd->mn", ray_d, n) + eps)  # [N, F]
    a0 = ray_o[:, None] - tris[None, :, 0]  # [N, F, 3]
    da0 = jnp.cross(a0, ray_d[:, None])  # [N, F, 3]
    u = jnp.einsum("mnd,nd->mn", da0, e2) * invdet
    v = -jnp.einsum("mnd,nd->mn", da0, e1) * invdet
    t = jnp.einsum("mnd,nd->mn", a0, n) * invdet
    hit = (t >= 0.0) & (u >= 0.0) & (v >= 0.0) & ((u + v) <= 1.0)
    return jnp.any(hit, axis=1)


def points_in_mesh(points, tris, test_dir=None):
    """Bidirectional any-hit test (seal_utils.py:675-693). points [P,3]."""
    d = DEFAULT_TEST_DIR if test_dir is None else test_dir
    d = jnp.broadcast_to(jnp.asarray(d).reshape(1, 3), points.shape)
    fwd = moller_trumbore(points, d, tris)
    bwd = moller_trumbore(points, -d, tris)
    return fwd & bwd


def project_points(plane_norm, plane_point, target_points):
    """Project points onto the plane (seal_utils.py:736-744)."""
    plane_norm = jnp.asarray(plane_norm).reshape(3)
    v = target_points - jnp.asarray(plane_point).reshape(3)
    proj = (v @ plane_norm)[..., None] / (plane_norm @ plane_norm) * plane_norm
    return target_points - proj


def points_mesh_distance(points, tris):
    """Min distance from each point to the triangle set (pytorch3d
    point_face_dist equivalent, closed-form point-triangle distance)."""
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]  # [F, 3]
    p = points[:, None, :]  # [P, 1, 3]
    ab = b - a
    ac = c - a
    ap = p - a[None]
    d1 = jnp.einsum("pfd,fd->pf", ap, ab)
    d2 = jnp.einsum("pfd,fd->pf", ap, ac)
    bp = p - b[None]
    d3 = jnp.einsum("pfd,fd->pf", bp, ab)
    d4 = jnp.einsum("pfd,fd->pf", bp, ac)
    cp = p - c[None]
    d5 = jnp.einsum("pfd,fd->pf", cp, ab)
    d6 = jnp.einsum("pfd,fd->pf", cp, ac)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = va + vb + vc
    v = vb / jnp.where(denom == 0, 1.0, denom)
    w = vc / jnp.where(denom == 0, 1.0, denom)
    # interior closest point
    closest = a[None] + v[..., None] * ab[None] + w[..., None] * ac[None]

    # edge/vertex regions
    t_ab = jnp.clip(d1 / jnp.where(d1 - d3 == 0, 1.0, d1 - d3), 0, 1)
    t_ac = jnp.clip(d2 / jnp.where(d2 - d6 == 0, 1.0, d2 - d6), 0, 1)
    d43 = d4 - d3
    denom_bc = d43 + (d5 - d6)
    t_bc = jnp.clip(d43 / jnp.where(denom_bc == 0, 1.0, denom_bc), 0, 1)

    cand = [
        a[None] + t_ab[..., None] * ab[None],
        a[None] + t_ac[..., None] * ac[None],
        b[None] + t_bc[..., None] * (c - b)[None],
        closest,
    ]
    # pick closest valid candidate per (point, face)
    inside = (v >= 0) & (w >= 0) & (v + w <= 1)
    dists = []
    for i, cd in enumerate(cand):
        d = jnp.sum((p - cd) ** 2, axis=-1)
        if i == 3:
            d = jnp.where(inside, d, jnp.inf)
        dists.append(d)
    dmin = jnp.min(jnp.stack(dists), axis=0)  # [P, F]
    return jnp.sqrt(jnp.min(dmin, axis=1))


def mesh_surface_points_mask(tris, points, offset: float = 1e-4):
    """Points within `offset` of the mesh surface: any of 6 axis jitters
    escapes the mesh (seal_utils.py:720-733)."""
    offs = jnp.array([
        [0, 0, offset], [0, 0, -offset], [0, offset, 0],
        [0, -offset, 0], [offset, 0, 0], [-offset, 0, 0],
    ])
    escaped = jnp.zeros(points.shape[0], dtype=jnp.int32)
    for i in range(6):
        escaped = escaped + (~points_in_mesh(points + offs[i], tris)).astype(
            jnp.int32)
    return escaped > 0
