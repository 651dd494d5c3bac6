"""`.splat` scene IO — the web-viewer ecosystem format.

The binary format popularized by the antimatter15 WebGL viewer and spoken by
most in-browser 3DGS renderers: 32 bytes per gaussian,

    position  3 x f32   (world xyz)
    scale     3 x f32   (LINEAR scales, not log)
    color     4 x u8    (RGB in [0,255] from the SH DC term, A = opacity)
    rotation  4 x u8    (quat wxyz quantized q*128+128)

sorted by descending "importance" (volume x opacity) so progressive loaders
draw the biggest contributors first. Lossy by design (u8 color/rotation);
PLY (utils/ply.py) remains the lossless interchange format. The reference
has no scene IO of any kind (SURVEY.md section 5, checkpoint row).
"""

from __future__ import annotations

import numpy as np

# SH DC -> linear color constant (Y_00 = 1/(2 sqrt(pi))).
_SH_C0 = 0.28209479177387814


def save_gaussian_splat(path: str, params: dict) -> None:
    """Write the raw (trainable) parameter dict as a .splat file."""
    means = np.asarray(params["means3d"], np.float32)
    scales = np.exp(np.asarray(params["scales"], np.float32))
    quats = np.asarray(params["quats"], np.float32)
    quats = quats / np.maximum(
        np.linalg.norm(quats, axis=-1, keepdims=True), 1e-12
    )
    opac = 1.0 / (1.0 + np.exp(-np.asarray(params["opacities_raw"],
                                           np.float32)))
    feats = np.asarray(params["features"], np.float32)
    if feats.ndim == 3:  # SH coefficients: DC term only
        rgb = feats[:, 0, :] * _SH_C0 + 0.5
    else:  # plain RGB
        rgb = feats

    order = np.argsort(
        -(scales.prod(axis=-1) * opac)
    )  # importance: volume x opacity, descending
    n = means.shape[0]
    rec = np.zeros(
        n,
        dtype=[("pos", "<f4", 3), ("scale", "<f4", 3), ("color", "u1", 4),
               ("rot", "u1", 4)],
    )
    rec["pos"] = means[order]
    rec["scale"] = scales[order]
    rec["color"][:, :3] = np.clip(rgb[order] * 255.0, 0, 255).astype(np.uint8)
    rec["color"][:, 3] = np.clip(opac[order] * 255.0, 0, 255).astype(np.uint8)
    rec["rot"] = np.clip(quats[order] * 128.0 + 128.0, 0, 255).astype(
        np.uint8
    )
    with open(path, "wb") as f:
        f.write(rec.tobytes())


def load_gaussian_splat(path: str) -> dict:
    """Read a .splat file into the raw (trainable) parameter dict.

    Color is returned as plain (N, 3) RGB features (the format stores no
    higher SH bands); opacity is inverted back through the logit.
    """
    blob = np.fromfile(path, dtype=np.uint8)
    if blob.size % 32 != 0:
        raise ValueError(f"{path}: size {blob.size} is not a multiple of 32")
    rec = blob.view(
        [("pos", "<f4", 3), ("scale", "<f4", 3), ("color", "u1", 4),
         ("rot", "u1", 4)]
    )
    opac = np.clip(rec["color"][:, 3].astype(np.float32) / 255.0,
                   1e-4, 1.0 - 1e-4)
    quats = (rec["rot"].astype(np.float32) - 128.0) / 128.0
    quats /= np.maximum(np.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    return dict(
        means3d=rec["pos"].astype(np.float32),
        scales=np.log(np.maximum(rec["scale"].astype(np.float32), 1e-12)),
        quats=quats,
        opacities_raw=np.log(opac / (1.0 - opac)),
        features=rec["color"][:, :3].astype(np.float32) / 255.0,
    )
