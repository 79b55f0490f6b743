"""Host-side mesh visualization renderer.

Replaces the reference's pyrender/OSMesa overlay renderer
(reference: utils/renderer.py:11-106).  Rendering is strictly off the hot
path (SURVEY.md §2.4: "keep host-side, viz only"), so we use pyrender when
importable and otherwise fall back to a dependency-free painter's-algorithm
CPU rasterizer good enough for overlay/debug images.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:  # pragma: no cover - environment dependent
    import pyrender
    import trimesh

    _HAS_PYRENDER = True
except Exception:  # pragma: no cover
    _HAS_PYRENDER = False


def _project(vertices: np.ndarray, cam_t: np.ndarray, focal: float, res: int) -> np.ndarray:
    p = vertices + cam_t[None]
    uv = p[:, :2] / p[:, 2:3] * focal + res / 2.0
    return np.concatenate([uv, p[:, 2:3]], axis=1)


def _cpu_rasterize(vertices, faces, cam_t, focal, res, base_img=None, color=(0.8, 0.3, 0.3)):
    """Painter's-algorithm triangle fill: adequate for overlays."""
    img = (base_img.copy() if base_img is not None else np.zeros((res, res, 3), np.float32))
    pts = _project(vertices, cam_t, focal, res)
    tri = pts[faces]  # [F, 3, 3]
    order = np.argsort(-tri[:, :, 2].mean(axis=1))  # far to near
    for f in order:
        t = tri[f]
        x0, y0 = np.floor(t[:, 0].min()), np.floor(t[:, 1].min())
        x1, y1 = np.ceil(t[:, 0].max()), np.ceil(t[:, 1].max())
        x0, y0 = int(max(x0, 0)), int(max(y0, 0))
        x1, y1 = int(min(x1, res - 1)), int(min(y1, res - 1))
        if x1 < x0 or y1 < y0:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
        # Barycentric inside test.
        d = ((t[1, 1] - t[2, 1]) * (t[0, 0] - t[2, 0]) + (t[2, 0] - t[1, 0]) * (t[0, 1] - t[2, 1]))
        if abs(d) < 1e-9:
            continue
        a = ((t[1, 1] - t[2, 1]) * (xs - t[2, 0]) + (t[2, 0] - t[1, 0]) * (ys - t[2, 1])) / d
        b = ((t[2, 1] - t[0, 1]) * (xs - t[2, 0]) + (t[0, 0] - t[2, 0]) * (ys - t[2, 1])) / d
        c = 1 - a - b
        inside = (a >= 0) & (b >= 0) & (c >= 0)
        shade = 0.5 + 0.5 * min(1.0, 1.0 / max(t[:, 2].mean(), 1e-6) * 3)
        for ch in range(3):
            patch = img[ys[inside], xs[inside], ch]
            img[ys[inside], xs[inside], ch] = 0.3 * patch + 0.7 * color[ch] * shade
    return np.clip(img, 0, 1)


class Renderer:
    """Overlay SMPL meshes on input images (utils/renderer.py parity API)."""

    def __init__(self, focal_length: float = 5000.0, img_res: int = 224, faces=None):
        self.focal_length = focal_length
        self.img_res = img_res
        self.faces = np.asarray(faces) if faces is not None else None

    def __call__(self, vertices: np.ndarray, camera_translation: np.ndarray,
                 image: Optional[np.ndarray] = None) -> np.ndarray:
        vertices = np.asarray(vertices)
        cam_t = np.asarray(camera_translation).copy()
        if _HAS_PYRENDER:
            return self._pyrender(vertices, cam_t, image)
        return _cpu_rasterize(
            vertices, self.faces, cam_t, self.focal_length, self.img_res, image
        )

    def _pyrender(self, vertices, cam_t, image):  # pragma: no cover
        material = pyrender.MetallicRoughnessMaterial(
            metallicFactor=0.2, alphaMode="OPAQUE", baseColorFactor=(0.8, 0.3, 0.3, 1.0)
        )
        cam_t[0] *= -1.0
        mesh = trimesh.Trimesh(vertices, self.faces)
        rot = trimesh.transformations.rotation_matrix(np.radians(180), [1, 0, 0])
        mesh.apply_transform(rot)
        mesh = pyrender.Mesh.from_trimesh(mesh, material=material)
        scene = pyrender.Scene(ambient_light=(0.5, 0.5, 0.5))
        scene.add(mesh, "mesh")
        camera_pose = np.eye(4)
        camera_pose[:3, 3] = cam_t
        camera = pyrender.IntrinsicsCamera(
            fx=self.focal_length, fy=self.focal_length,
            cx=self.img_res / 2.0, cy=self.img_res / 2.0,
        )
        scene.add(camera, pose=camera_pose)
        light = pyrender.DirectionalLight(color=[1, 1, 1], intensity=1)
        scene.add(light, pose=np.eye(4))
        r = pyrender.OffscreenRenderer(
            viewport_width=self.img_res, viewport_height=self.img_res, point_size=1.0
        )
        color, depth = r.render(scene, flags=pyrender.RenderFlags.RGBA)
        color = color.astype(np.float32) / 255.0
        valid = depth > 0
        out = image.copy() if image is not None else np.zeros_like(color[:, :, :3])
        out[valid] = color[valid][:, :3]
        return out

    def visualize_tb(self, vertices, camera_translation, images, extra=None):
        """Tensorboard grid (utils/renderer.py:24-45): overlay per sample,
        returns [N, H, W, 3] stacked."""
        outs = []
        for i in range(min(len(vertices), 4)):
            outs.append(self(np.asarray(vertices[i]), np.asarray(camera_translation[i]),
                             np.asarray(images[i]) if images is not None else None))
        return np.stack(outs)
