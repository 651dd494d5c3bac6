"""NeRF-synthetic (Blender) dataset loading: the transforms.json format.

The second standard capture format after COLMAP (utils/colmap.py): a JSON
file with a shared ``camera_angle_x`` and per-frame ``file_path`` +
``transform_matrix`` (camera-to-world, OpenGL convention: +X right, +Y up,
-Z forward). This loader converts to this framework's world-to-camera
convention (+X right, +Y down, +Z forward — gsplat's, see camera.look_at)
and composites the RGBA renders onto a constant background, exactly as
standard 3DGS trainers do for the synthetic benchmark scenes.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

# OpenGL camera-to-world -> our world-to-camera: flip Y and Z of the camera
# frame (diag(1, -1, -1)), then invert the rigid transform.
_FLIP_YZ = np.diag([1.0, -1.0, -1.0]).astype(np.float32)


@dataclass
class BlenderScene:
    """A parsed transforms.json split, ready for training."""

    names: list[str]  # frame file paths (resolved)
    R: np.ndarray  # (V, 3, 3) world-to-camera rotations
    T: np.ndarray  # (V, 3) world-to-camera translations
    images: np.ndarray | None  # (V, H, W, 3) float32 in [0, 1], or None
    H: int
    W: int
    fx: float
    fy: float

    def camera_for(self, i: int):
        from ..camera import Camera

        return Camera.create(
            R=self.R[i], T=self.T[i], H=self.H, W=self.W,
            fx=self.fx, fy=self.fy, cx=self.W / 2.0, cy=self.H / 2.0,
        )


def _c2w_to_wc(c2w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """OpenGL camera-to-world 4x4 -> our (R, T) world-to-camera."""
    Rc2w = np.asarray(c2w[:3, :3], np.float32) @ _FLIP_YZ
    t = np.asarray(c2w[:3, 3], np.float32)
    R = Rc2w.T  # world-to-camera rotation
    T = -R @ t
    return R, T


def load_blender_scene(
    path: str,
    split: str = "train",
    background=(1.0, 1.0, 1.0),
    downscale: int = 1,
    load_images: bool = True,
) -> BlenderScene:
    """Load a NeRF-synthetic scene split.

    ``path``: the scene directory (containing transforms_{split}.json) or a
    transforms .json file directly. RGBA frames are composited onto
    ``background`` (the NeRF-synthetic convention is white).
    """
    if os.path.isdir(path):
        json_path = os.path.join(path, f"transforms_{split}.json")
        if not os.path.exists(json_path):
            json_path = os.path.join(path, "transforms.json")
        root = path
    else:
        json_path = path
        root = os.path.dirname(path)
    with open(json_path) as f:
        meta = json.load(f)

    names, Rs, Ts, imgs = [], [], [], []
    H = W = None
    for frame in meta["frames"]:
        fp = frame["file_path"]
        full = os.path.join(root, fp)
        if not os.path.splitext(full)[1]:
            full += ".png"
        R, T = _c2w_to_wc(np.asarray(frame["transform_matrix"], np.float32))
        if load_images:
            if not os.path.exists(full):
                continue
            from PIL import Image

            im = Image.open(full)
            if downscale > 1:
                im = im.resize(
                    (im.width // downscale, im.height // downscale),
                    Image.LANCZOS,
                )
            arr = np.asarray(im.convert("RGBA"), np.float32) / 255.0
            a = arr[..., 3:4]
            rgb = arr[..., :3] * a + np.asarray(background, np.float32) * (
                1.0 - a
            )
            imgs.append(rgb.astype(np.float32))
            H, W = rgb.shape[:2]
        names.append(full)
        Rs.append(R)
        Ts.append(T)

    if H is None:
        # No images loaded/found: fall back to declared or default size.
        W = int(meta.get("w", 800)) // downscale
        H = int(meta.get("h", 800)) // downscale

    if "fl_x" in meta:
        fx = float(meta["fl_x"]) / downscale
        fy = float(meta.get("fl_y", meta["fl_x"])) / downscale
    else:
        cam_angle = float(meta["camera_angle_x"])
        fx = fy = 0.5 * W / np.tan(0.5 * cam_angle)

    return BlenderScene(
        names=names,
        R=np.stack(Rs) if Rs else np.zeros((0, 3, 3), np.float32),
        T=np.stack(Ts) if Ts else np.zeros((0, 3), np.float32),
        images=(np.stack(imgs).astype(np.float32)
                if load_images and imgs else None),
        H=int(H), W=int(W), fx=float(fx), fy=float(fy),
    )
