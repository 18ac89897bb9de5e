"""Seal mappers: the edit semantics.

Parity with reference SealNeRF/seal_utils.py:18-592. A mapper is built on the
host (numpy geometry) from a json5 `seal.json` config and then exposes three
traced-compatible pure functions used inside the jitted render step:

- map_mask(points) -> bool [N]        (AABB prefilter + point-in-mesh test,
                                       seal_utils.py:132-153)
- map_to_origin(points, dirs) -> (points', dirs', mask)
                                      (warp edited-region queries back to the
                                       original scene)
- map_color(points, dirs, colors) -> colors'
                                      (HSV/RGB recolor + projected texture,
                                       seal_utils.py:48-81)

All boolean indexing of the reference becomes jnp.where on the full batch --
the natural TPU form (and what lets these run inside the fused render step at
zero extra dispatch cost).

Mapper types (factory key `type` in the json5 config, seal_utils.py:581-592):
- bbox  (:156-286): transform/scale the content of an oriented bbox.
- brush (:289-461): raise/lower a painted surface along its best-fit plane
  normal with distance-attenuated pressure (linear / dry modes; the
  reference's ease-in/ease-out raise NotImplementedError there too).
- anchor (:464-578): cone-shaped pull of a surface region toward a dragged
  anchor point.
"""

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from . import color_utils
from .geometry import (
    oriented_bounding_box, plane_best_fit, uv_sphere_points,
    extruded_surface_mesh, mesh_triangles, aabb_mesh,
    points_in_mesh, project_points, mesh_surface_points_mask,
    DEFAULT_TEST_DIR,
)


def _load_json5(path):
    import json5
    with open(path) as f:
        return json5.load(f)


class SealMapper:
    """Base: holds map_data (jnp arrays) + triangle set; subclasses implement
    map_to_origin."""

    def __init__(self, seal_config: dict):
        self.config = seal_config
        self.map_data = {}
        self.map_triangles: Optional[jnp.ndarray] = None  # [F, 3, 3]
        self.map_test_dir = None

    # -------------------------------------------------------------- traced fns
    def map_mask(self, points):
        """AABB prefilter + in-mesh test (seal_utils.py:132-153)."""
        bounds = self.map_data["map_bound"]  # [B, 2, 3]
        if bounds.ndim == 2:
            bounds = bounds[None]
        in_box = jnp.zeros(points.shape[0], dtype=bool)
        for i in range(bounds.shape[0]):
            m = jnp.all((points > bounds[i, 0]) & (points < bounds[i, 1]),
                        axis=1)
            in_box = in_box | m
        in_mesh = points_in_mesh(points, self.map_triangles,
                                 self.map_test_dir)
        return in_box & in_mesh

    def map_to_origin(self, points, dirs=None):
        raise NotImplementedError()

    def map_color(self, points, dirs, colors):
        if "hsv" in self.map_data:
            colors = color_utils.modify_hsv(colors, self.map_data["hsv"])
        if "rgb" in self.map_data:
            colors = color_utils.modify_rgb(
                colors, self.map_data["rgb"],
                float(self.map_data.get("rgb_light_offset", 0.0)))
        if "image" in self.map_data:
            # project points onto the texture plane and sample the image
            # (seal_utils.py:57-81).
            image = self.map_data["image"]          # [H, W, 3]
            mask_img = self.map_data["image_mask"]  # [H, W]
            hh, ww = image.shape[:2]
            v_o = self.map_data["v_image_o"]
            v_w = self.map_data["v_image_w"]
            v_h = self.map_data["v_image_h"]
            proj = project_points(self.map_data["v_image_norm"], v_o, points)
            v_op = proj - v_o
            v_ow = v_w - v_o
            v_oh = v_h - v_o
            iw = jnp.clip(jnp.floor(
                v_op @ v_ow / (v_ow @ v_ow) * ww), 0, ww - 1).astype(jnp.int32)
            ih = jnp.clip(jnp.floor(
                v_op @ v_oh / (v_oh @ v_oh) * hh), 0, hh - 1).astype(jnp.int32)
            m = mask_img[ih, iw][:, None]
            modified = color_utils.modify_rgb(
                colors, image[ih, iw],
                float(self.map_data.get("rgb_light_offset", 0.0)))
            colors = m * modified + (1 - m) * colors
        return colors

    # ------------------------------------------------------------- host helpers
    def _store_color_config(self, seal_config):
        if "hsv" in seal_config:
            self.map_data["hsv"] = jnp.asarray(seal_config["hsv"],
                                               dtype=jnp.float32)
        if "rgb" in seal_config:
            self.map_data["rgb"] = jnp.asarray(seal_config["rgb"],
                                               dtype=jnp.float32)
            self.map_data["rgb_light_offset"] = float(
                seal_config.get("rgbLightOffset", 0.0))
        if "imageConfig" in seal_config:
            import cv2
            ic = seal_config["imageConfig"]
            self.map_data["rgb_light_offset"] = float(
                seal_config.get("rgbLightOffset", 0.0))
            raw = cv2.imread(ic["path"], cv2.IMREAD_UNCHANGED)
            if raw.shape[2] == 4:
                alpha = raw[:, :, 3] / 255.0
                img = cv2.cvtColor(raw, cv2.COLOR_BGRA2RGB)
            else:
                alpha = np.ones(raw.shape[:2])
                img = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
            v_o, v_w, v_h = (np.asarray(ic[k], dtype=np.float32)
                             for k in ("o", "w", "h"))
            _, norm = plane_best_fit(np.stack([v_o, v_w, v_h]))
            self.map_data["image"] = jnp.asarray(
                img.astype(np.float32) / 255.0)
            self.map_data["image_mask"] = jnp.asarray(
                alpha.astype(np.float32))
            self.map_data["v_image_norm"] = jnp.asarray(norm)
            self.map_data["v_image_o"] = jnp.asarray(v_o)
            self.map_data["v_image_w"] = jnp.asarray(v_w)
            self.map_data["v_image_h"] = jnp.asarray(v_h)


class SealBBoxMapper(SealMapper):
    """Transform/scale the content of an OBB (seal_utils.py:156-286).

    config: {type: bbox, raw: [N,3], transform: [4,4], scale: [3],
             boundType: from|to|both, mapSource?: [3], hsv?/rgb?}
    """

    def __init__(self, config_path: str, seal_config: dict):
        super().__init__(seal_config)
        transform = np.asarray(seal_config["transform"], dtype=np.float64)
        scale = np.asarray(seal_config["scale"], dtype=np.float64)

        fverts, ffaces, _, fcenter, _ = oriented_bounding_box(
            np.asarray(seal_config["raw"]))
        # to_mesh = scale around center then apply transform
        tverts = (fverts - fcenter) * scale + fcenter
        tverts = (np.hstack([tverts, np.ones((8, 1))]) @ transform.T)[:, :3]
        tcenter = tverts.mean(0)

        self.from_verts, self.from_faces = fverts, ffaces
        self.to_verts, self.to_faces = tverts.astype(np.float32), ffaces
        if config_path:
            _export_obj(os.path.join(config_path, "from.obj"), fverts, ffaces)
            _export_obj(os.path.join(config_path, "to.obj"), tverts, ffaces)

        bound_type = seal_config.get("boundType", "to")
        both_bounds = np.stack([
            np.stack([fverts.min(0), fverts.max(0)]),
            np.stack([tverts.min(0), tverts.max(0)]),
        ])
        if bound_type == "to":
            bounds = both_bounds[1:2]
            tris = mesh_triangles(self.to_verts, ffaces)
        elif bound_type == "from":
            bounds = both_bounds[0:1]
            tris = mesh_triangles(fverts, ffaces)
        else:  # both
            bounds = both_bounds
            tris = np.concatenate([mesh_triangles(fverts, ffaces),
                                   mesh_triangles(self.to_verts, ffaces)])
        self.map_triangles = jnp.asarray(tris)

        self.map_data = {
            "force_fill_bound": jnp.asarray(both_bounds),
            "map_bound": jnp.asarray(bounds),
            "pose_center": jnp.asarray((fcenter + tcenter) / 2,
                                       dtype=jnp.float32),
            "pose_radius": float(np.linalg.norm(fcenter - tcenter) * 10),
            "transform": jnp.asarray(np.linalg.inv(transform),
                                     dtype=jnp.float32),
            "rotation": jnp.asarray(np.linalg.inv(transform[:3, :3]),
                                    dtype=jnp.float32),
            "scale": jnp.asarray(1.0 / scale, dtype=jnp.float32),
            "center": jnp.asarray(fcenter, dtype=jnp.float32),
        }
        if seal_config.get("mapSource"):
            self.map_data["empty_bound"] = jnp.asarray(both_bounds[0])
            self.map_data["map_source"] = jnp.asarray(
                seal_config["mapSource"], dtype=jnp.float32)
        self._store_color_config(seal_config)

    def map_to_origin(self, points, dirs=None):
        mask = self.map_mask(points)
        md = self.map_data
        homog = jnp.concatenate(
            [points, jnp.ones_like(points[:, :1])], axis=1)
        tp = (homog @ md["transform"].T)[:, :3]
        origin_pts = (tp - md["center"]) * md["scale"] + md["center"]
        out_pts = jnp.where(mask[:, None], origin_pts, points)
        if "map_source" in md:
            src_mask = jnp.all((points > md["empty_bound"][0]) &
                               (points < md["empty_bound"][1]), axis=1)
            out_pts = jnp.where((src_mask & ~mask)[:, None],
                                md["map_source"][None], out_pts)
        out_dirs = dirs
        if dirs is not None:
            rot_dirs = dirs @ md["rotation"].T
            out_dirs = jnp.where(mask[:, None], rot_dirs, dirs)
        return out_pts, out_dirs, mask


class SealBrushMapper(SealMapper):
    """Surface raise/lower brush (seal_utils.py:289-461).

    config: {type: brush, raw: [N,3] or [B][N,3], normal?: [3],
             brushType: line|curve, brushDepth, brushPressure,
             attenuationDistance, attenuationMode: linear|dry,
             simplifyVoxel?, hsv?/rgb?/imageConfig?}
    """

    def __init__(self, config_path: str, seal_config: dict):
        super().__init__(seal_config)
        points = seal_config["raw"]
        if np.asarray(points[0]).ndim == 1:
            points = [points]
        brush_type = seal_config["brushType"]
        if isinstance(brush_type, str):
            brush_type = [brush_type] * len(points)

        all_tris, all_bounds, border_pts = [], [], []
        normal_expand = None
        plane_point = None
        for i, raw in enumerate(points):
            pts = np.asarray(raw, dtype=np.float64)
            pp, normal = plane_best_fit(pts)
            if "normal" in seal_config and \
                    normal @ np.asarray(seal_config["normal"]) < 0:
                normal = -normal
            normal_expand = normal * float(seal_config["brushPressure"])
            plane_point = pp
            proj = np.asarray(project_points(
                jnp.asarray(normal), jnp.asarray(pp), jnp.asarray(pts)))
            depth = float(seal_config["brushDepth"])
            if brush_type[i] == "line":
                cloud = np.vstack([pts + 2 * normal_expand,
                                   pts - depth * normal_expand])
                verts, faces, _, _, _ = oriented_bounding_box(cloud)
            else:
                verts, faces = extruded_surface_mesh(
                    proj, normal_expand, growth=(-depth, 2.0))
            tris = mesh_triangles(verts, faces)
            all_tris.append(tris)
            all_bounds.append(np.stack([verts.min(0), verts.max(0)]))
            bmask = np.asarray(mesh_surface_points_mask(
                jnp.asarray(tris), jnp.asarray(proj, dtype=jnp.float32)))
            border_pts.append(proj[bmask])

        self.map_triangles = jnp.asarray(np.concatenate(all_tris))
        self.map_test_dir = jnp.asarray(normal_expand[None],
                                        dtype=jnp.float32)
        border = (np.concatenate(border_pts)
                  if any(len(b) for b in border_pts)
                  else np.asarray(points[0]))
        self.map_data = {
            "force_fill_bound": jnp.asarray(np.stack(all_bounds),
                                            dtype=jnp.float32),
            "map_bound": jnp.asarray(np.stack(all_bounds),
                                     dtype=jnp.float32),
            "normal_expand": jnp.asarray(normal_expand, dtype=jnp.float32),
            "center": jnp.asarray(plane_point, dtype=jnp.float32),
            "border_points": jnp.asarray(border, dtype=jnp.float32),
            "attenuation_distance": float(seal_config["attenuationDistance"]),
            "attenuation_mode": seal_config["attenuationMode"],
        }
        self._store_color_config(seal_config)

    def map_to_origin(self, points, dirs=None):
        mask = self.map_mask(points)
        md = self.map_data
        mode = md["attenuation_mode"]
        if mode == "dry":
            return points, dirs, mask
        if mode not in ("linear",):
            raise NotImplementedError(f"attenuation mode {mode}")
        proj = project_points(md["normal_expand"], md["center"], points)
        border_d = jnp.min(jnp.linalg.norm(
            proj[:, None, :] - md["border_points"][None], axis=-1), axis=1)
        mapped = points - md["normal_expand"]
        att = md["attenuation_distance"]
        comp_scale = jnp.clip((att - border_d) / att, 0.0, None)
        mapped = mapped + jnp.where(
            (border_d < att)[:, None],
            comp_scale[:, None] * md["normal_expand"][None], 0.0)
        out = jnp.where(mask[:, None], mapped, points)
        return out, dirs, mask


class SealAnchorMapper(SealMapper):
    """Cone-shaped pull toward an anchor (seal_utils.py:464-578).

    config: {type: anchor, raw: [N,3], translation: [3], radius, scale: [3]}
    """

    def __init__(self, config_path: str, seal_config: dict):
        super().__init__(seal_config)
        v_translation = np.asarray(seal_config["translation"],
                                   dtype=np.float64)
        len_translation = np.linalg.norm(v_translation)
        v_anchor = np.mean(np.asarray(seal_config["raw"], dtype=np.float64),
                           axis=0)
        radius = float(seal_config["radius"])
        pp, normal = plane_best_fit(seal_config["raw"])

        v_ta = v_anchor + v_translation
        # project the translated anchor back onto the plane
        v_pta = np.asarray(project_points(
            jnp.asarray(normal), jnp.asarray(pp),
            jnp.asarray(v_ta[None], dtype=jnp.float32)))[0]
        v_offset = v_pta - v_anchor
        v_h = v_pta - v_ta
        len_h = np.linalg.norm(v_h)

        sphere = uv_sphere_points(radius * 1.1) + v_anchor
        cloud = np.vstack([sphere, v_anchor + 1.1 * v_translation,
                           sphere - 0.1 * v_translation])
        verts, faces = aabb_mesh(cloud.min(0), cloud.max(0))
        self.to_verts, self.to_faces = verts, faces
        if config_path:
            _export_obj(os.path.join(config_path, "to.obj"), verts, faces)
        self.map_triangles = jnp.asarray(mesh_triangles(verts, faces))

        bounds = np.stack([verts.min(0), verts.max(0)])
        self.map_data = {
            "force_fill_bound": jnp.asarray(bounds),
            "map_bound": jnp.asarray(bounds),
            "pose_center": jnp.asarray(verts.mean(0)),
            "pose_radius": float(len_translation * 10),
            "v_anchor": jnp.asarray(v_anchor, dtype=jnp.float32),
            "v_offset": jnp.asarray(v_offset, dtype=jnp.float32),
            "v_h": jnp.asarray(v_h, dtype=jnp.float32),
            "len_h": float(len_h),
            "radius": radius,
            "scale": jnp.asarray(seal_config["scale"], dtype=jnp.float32),
            "map_source": True,  # disables local-point filtering in pretraining
        }
        self._store_color_config(seal_config)

    def map_to_origin(self, points, dirs=None):
        md = self.map_data
        proj = project_points(md["v_h"], md["v_anchor"], points)
        v_p2p = proj - points
        plane_dist = jnp.linalg.norm(v_p2p, axis=1)
        offset_scale = plane_dist[:, None] / md["len_h"]
        scaled_offset = offset_scale * md["v_offset"]
        pop = proj - scaled_offset
        pop_anchor_dist = jnp.linalg.norm(pop - md["v_anchor"], axis=1)

        in_cone = (pop_anchor_dist <= md["radius"]) & (
            plane_dist / jnp.maximum(md["radius"] - pop_anchor_dist, 1e-8)
            < md["len_h"] / md["radius"] * 1.1)
        valid_side = (v_p2p @ md["v_h"]) > 0
        mask = in_cone & valid_side

        v_map = -((md["len_h"] - plane_dist) / 10.0)[:, None] * \
            md["v_h"][None] / md["len_h"]
        mapped = pop - v_map
        mapped = (mapped - md["v_anchor"]) * md["scale"] + md["v_anchor"]
        out = jnp.where(mask[:, None], mapped, points)
        return out, dirs, mask


def get_seal_mapper(config_path: str, config_dict: Optional[dict] = None,
                    config_file: str = "seal.json") -> SealMapper:
    """Factory (seal_utils.py:581-592)."""
    if config_dict is None:
        config_dict = _load_json5(os.path.join(config_path, config_file))
    kind = config_dict["type"]
    if kind == "bbox":
        return SealBBoxMapper(config_path, config_dict)
    if kind == "brush":
        return SealBrushMapper(config_path, config_dict)
    if kind == "anchor":
        return SealAnchorMapper(config_path, config_dict)
    raise NotImplementedError(f"unknown seal mapper type {kind}")


def _export_obj(path, verts, faces):
    try:
        with open(path, "w") as f:
            for v in np.asarray(verts):
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for t in np.asarray(faces):
                f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")
    except OSError:
        pass
