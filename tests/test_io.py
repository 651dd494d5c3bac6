"""IO tests: native C extension vs pure-Python fallbacks, PLY round-trip,
PNG validity. Runs with or without a C toolchain (fallback paths are always
exercised)."""

import io

import jax
import numpy as np
import pytest

from mojosplat_tpu import train as mtrain
from mojosplat_tpu.native import get_native
from mojosplat_tpu.utils.image import save_png
from mojosplat_tpu.utils.ply import (
    _read_ply_python,
    load_gaussian_ply,
    save_gaussian_ply,
)


@pytest.fixture(scope="module")
def scene():
    raw = mtrain.init_gaussians(jax.random.PRNGKey(7), 50, sh_degree=2)
    return {k: np.asarray(v) for k, v in raw.items()}


def test_ply_roundtrip(scene, tmp_path):
    path = str(tmp_path / "scene.ply")
    save_gaussian_ply(path, scene)
    back = load_gaussian_ply(path)
    for k in scene:
        np.testing.assert_allclose(
            back[k], scene[k], rtol=0, atol=1e-6, err_msg=k
        )


def test_ply_python_fallback_matches(scene, tmp_path):
    path = str(tmp_path / "scene.ply")
    save_gaussian_ply(path, scene)
    names_py, n_py, blob_py = _read_ply_python(path)
    native = get_native()
    if native is None:
        pytest.skip("no C toolchain; fallback already exercised")
    names_c, n_c, blob_c = native.load_ply(path)
    assert names_py == list(names_c)
    assert n_py == n_c
    assert blob_py == blob_c


def test_ply_rgb_features_saved_as_sh0(tmp_path):
    raw = mtrain.init_gaussians(jax.random.PRNGKey(1), 8, sh_degree=None)
    raw = {k: np.asarray(v) for k, v in raw.items()}
    path = str(tmp_path / "rgb.ply")
    save_gaussian_ply(path, raw)
    back = load_gaussian_ply(path)
    assert back["features"].shape == (8, 1, 3)
    # sh_to_color at degree 0 must reproduce the original RGB.
    from mojosplat_tpu.ops.sh import sh_to_color

    col = sh_to_color(
        back["features"], back["means3d"], np.zeros(3), 0
    )
    np.testing.assert_allclose(col, raw["features"], atol=1e-6)


def test_ply_rejects_garbage(tmp_path):
    p = tmp_path / "bad.ply"
    p.write_bytes(b"not a ply at all")
    with pytest.raises(ValueError):
        _read_ply_python(str(p))


def test_png_decodable_by_pil(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((40, 60, 3)).astype(np.float32)
    path = str(tmp_path / "img.png")
    save_png(img, path)
    from PIL import Image

    back = np.asarray(Image.open(path))
    assert back.shape == (40, 60, 3)
    np.testing.assert_array_equal(
        back, (np.clip(img, 0, 1) * 255).astype(np.uint8)
    )


def test_png_native_matches_pil_bytes(tmp_path):
    native = get_native()
    if native is None:
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(3)
    arr = (rng.random((16, 16, 4)) * 255).astype(np.uint8)
    path = str(tmp_path / "rgba.png")
    native.write_png(path, 16, 16, 4, arr.tobytes())
    from PIL import Image

    back = np.asarray(Image.open(path))
    np.testing.assert_array_equal(back, arr)
