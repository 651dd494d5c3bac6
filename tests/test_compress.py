"""Compressed-scene format round-trip tests (utils/compress.py).

The gsplat-ecosystem compression capability (gsplat.compression) the
reference never reaches — validated by parameter-level error bounds and a
render-level PSNR bound against the uncompressed scene.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mojosplat_tpu import Camera, RenderConfig, render_gaussians
from mojosplat_tpu import train as mtrain
from mojosplat_tpu.utils.compress import (
    compress_scene,
    load_compressed_scene,
    morton_order,
)


def make_raw(n=400, sh_degree=None, seed=0):
    raw = mtrain.init_gaussians(
        jax.random.PRNGKey(seed), n, sh_degree=sh_degree
    )
    return {k: np.array(v, np.float32) for k, v in raw.items()}


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def render_params(raw, sh_degree=None):
    p = mtrain.activate({k: jnp.asarray(v) for k, v in raw.items()})
    cam = Camera.create(
        R=jnp.eye(3), T=jnp.zeros(3), H=64, W=64,
        fx=60.0, fy=60.0, cx=32.0, cy=32.0,
    )
    return np.asarray(
        render_gaussians(
            p["means3d"], p["scales"], p["quats"], p["opacities"],
            p["features"], cam, sh_degree=sh_degree,
            config=RenderConfig(),
        )
    )


def test_roundtrip_rgb_param_bounds(tmp_path):
    raw = make_raw(n=400)
    path = str(tmp_path / "scene.npz")
    stats = compress_scene(path, raw)
    back = load_compressed_scene(path)

    assert stats["n"] == 400 and stats["ratio"] > 2.0
    for k in ("means3d", "scales", "quats", "opacities_raw", "features"):
        assert back[k].dtype == np.float32

    # The writer Morton-permutes; compare through the same permutation.
    order = morton_order(raw["means3d"])
    extent = raw["means3d"].max(0) - raw["means3d"].min(0)
    # 16-bit means: error <= extent / 2^16 per axis.
    np.testing.assert_allclose(
        back["means3d"], raw["means3d"][order],
        atol=float(extent.max()) / 65535 + 1e-6,
    )
    # 8-bit scales.
    span = raw["scales"].max(0) - raw["scales"].min(0)
    np.testing.assert_allclose(
        back["scales"], raw["scales"][order],
        atol=float(span.max()) / 255 + 1e-6,
    )
    # Quats: unit and rotation-equivalent (sign canonicalized).
    norms = np.linalg.norm(back["quats"], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    src = raw["quats"][order]
    src = src / np.linalg.norm(src, axis=-1, keepdims=True)
    dots = np.abs(np.sum(src * back["quats"], axis=-1))
    assert dots.min() > 0.999

    # Opacities agree in sigmoid space within 8-bit step.
    sig = lambda x: 1.0 / (1.0 + np.exp(-x))
    np.testing.assert_allclose(
        sig(back["opacities_raw"]), sig(raw["opacities_raw"][order]),
        atol=1.5 / 255,
    )


def test_roundtrip_render_psnr(tmp_path):
    raw = make_raw(n=400, seed=3)
    img_orig = render_params(raw)
    path = str(tmp_path / "scene.npz")
    compress_scene(path, raw)
    back = load_compressed_scene(path)
    img_back = render_params(back)
    assert psnr(img_orig, img_back) > 35.0


def test_roundtrip_sh_codebook_and_quant(tmp_path):
    raw = make_raw(n=300, sh_degree=2, seed=1)
    # Give the rest bands real content (init zeroes them).
    rng = np.random.default_rng(0)
    raw["features"][:, 1:, :] = rng.normal(
        0, 0.05, raw["features"][:, 1:, :].shape
    ).astype(np.float32)
    img_orig = render_params(raw, sh_degree=2)

    for kw in (dict(sh_codebook_size=256, kmeans_iters=4),
               dict(sh_codebook_size=None)):
        path = str(tmp_path / "scene_sh.npz")
        stats = compress_scene(path, raw, **kw)
        assert stats["sh_k"] == raw["features"].shape[1]
        back = load_compressed_scene(path)
        assert back["features"].shape == raw["features"].shape
        img_back = render_params(back, sh_degree=2)
        assert psnr(img_orig, img_back) > 30.0


def test_compression_beats_raw_size(tmp_path):
    raw = make_raw(n=2000, sh_degree=3, seed=2)
    rng = np.random.default_rng(1)
    raw["features"][:, 1:, :] = rng.normal(
        0, 0.03, raw["features"][:, 1:, :].shape
    ).astype(np.float32)
    path = str(tmp_path / "big.npz")
    # Codebook sized for the test's tiny N (at production scale the fixed
    # codebook cost amortizes away: 4096 x 45 fp16 = 369 KB vs ~19 B/gauss).
    stats = compress_scene(path, raw, sh_codebook_size=256, kmeans_iters=3)
    # float32 PLY-equivalent payload vs compressed file. (~19 B/gaussian +
    # fixed codebook; at this toy N the observed ratio is ~8x, >14x at
    # production N where the codebook amortizes.)
    assert stats["ratio"] > 7.0, stats


def test_roundtrip_surfel_scales(tmp_path):
    # 2DGS scenes carry (N, 2) scales; the codec is shape-agnostic.
    rng = np.random.default_rng(5)
    raw = dict(
        means3d=rng.normal(0, 1, (200, 3)).astype(np.float32),
        scales=rng.normal(-1.8, 0.3, (200, 2)).astype(np.float32),
        quats=rng.normal(0, 1, (200, 4)).astype(np.float32),
        opacities_raw=rng.normal(1.0, 0.5, 200).astype(np.float32),
        features=rng.uniform(0, 1, (200, 3)).astype(np.float32),
    )
    path = str(tmp_path / "surfels.npz")
    compress_scene(path, raw)
    back = load_compressed_scene(path)
    assert back["scales"].shape == (200, 2)
    assert back["features"].shape == (200, 3)
    order = morton_order(raw["means3d"])
    span = raw["scales"].max(0) - raw["scales"].min(0)
    np.testing.assert_allclose(
        back["scales"], raw["scales"][order], atol=float(span.max()) / 255
        + 1e-6,
    )
