"""On-device image op tests (geometry identities + cv2 cross-checks)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu.ops import image as I
from eyediseasesegmentation_tpu.utils import make_grid


def test_longest_max_size_shape():
    assert I.longest_max_size_shape(4288, 2848, 1024) == (1024, 680)
    assert I.longest_max_size_shape(100, 100, 50) == (50, 50)


def test_longest_max_size_pad_roundtrip(rng):
    img = jnp.asarray(rng.rand(400, 300, 3).astype(np.float32) * 255)
    out = I.longest_max_size_pad(img, 128)
    assert out.shape == (128, 128, 3)
    # center_crop inverts the pad
    nh, nw = I.longest_max_size_shape(400, 300, 128)
    crop = I.center_crop(out, (nh, nw))
    assert crop.shape == (nh, nw, 3)


def test_d4_views_inverse(rng):
    img = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
    views = I.d4_views(img)
    assert views.shape == (8, 2, 16, 16, 1)
    aligned = I.d4_inverse(views)
    for i in range(8):
        np.testing.assert_allclose(np.asarray(aligned[i]), np.asarray(img), rtol=1e-6)


def test_d4_views_distinct(rng):
    img = jnp.asarray(rng.rand(8, 8, 1).astype(np.float32))
    views = I.d4_views(img)
    flat = np.asarray(views).reshape(8, -1)
    # all 8 dihedral views of a random image are distinct
    assert len({tuple(np.round(v, 5)) for v in flat}) == 8


def test_binarize_mask():
    m = jnp.asarray([[0.0, 49.0, 51.0, 255.0]])
    np.testing.assert_array_equal(np.asarray(I.binarize_mask(m)), [[0, 0, 1, 1]])


def test_normalize_matches_reference(rng):
    x = rng.rand(8, 8, 3).astype(np.float32) * 255
    mean = [0.449, 0.218, 0.064]
    std = [0.332, 0.171, 0.086]
    got = np.asarray(I.normalize(jnp.asarray(x), mean, std))
    want = (x / 255.0 - np.array(mean)) / np.array(std)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rgb_to_gray(rng):
    x = rng.rand(4, 4, 3).astype(np.float32)
    got = np.asarray(I.rgb_to_gray(jnp.asarray(x)))
    want = x @ np.array([0.2989, 0.5870, 0.1140], np.float32)
    np.testing.assert_allclose(got[..., 0], want, rtol=1e-5)


def test_gaussian_blur_preserves_mean(rng):
    x = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    out = I.gaussian_blur(x, sigma=2.0)
    assert out.shape == x.shape
    assert abs(float(jnp.mean(out)) - float(jnp.mean(x))) < 0.02


def test_ben_color_device_range(rng):
    x = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 255)
    out = I.ben_color_device(x)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 255.0


def test_photometric_ops_shapes(rng):
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32) * 255)
    for fn in (I.random_brightness, I.random_contrast, I.random_gamma, I.gauss_noise):
        out = fn(key, img)
        assert out.shape == img.shape
        assert float(jnp.min(out)) >= 0 and float(jnp.max(out)) <= 255


def test_warp_ops_mask_stays_binary(rng):
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32) * 255)
    mask = jnp.asarray((rng.rand(32, 32) < 0.5).astype(np.float32))
    for fn in (I.shift_scale_rotate, I.elastic_transform, I.grid_distortion,
               I.optical_distortion):
        out, m = fn(key, img, mask)
        assert out.shape == img.shape and m.shape == mask.shape
        vals = np.unique(np.asarray(m))
        assert set(np.round(vals, 3)).issubset({0.0, 1.0})


def test_clahe_increases_local_contrast(rng):
    # low-contrast image: CLAHE should expand the value range
    x = jnp.asarray((rng.rand(64, 64) * 20 + 100).astype(np.float32))
    out = I.clahe(x)
    assert out.shape == x.shape
    assert float(jnp.max(out) - jnp.min(out)) > float(jnp.max(x) - jnp.min(x))


def test_make_grid_reference_semantics():
    # matches base_utils.py:52-71 exactly
    g = make_grid((1024, 1024), window=256, min_overlap=32)
    x, y = 1024, 1024
    nx = x // (256 - 32) + 1
    assert g.shape == (nx * nx, 4)
    assert g[0].tolist() == [0, 256, 0, 256]
    # last window snaps to edge
    assert g[-1].tolist() == [x - 256, x, y - 256, y]
    # full coverage
    cover = np.zeros((x, y), bool)
    for x1, x2, y1, y2 in g:
        cover[x1:x2, y1:y2] = True
    assert cover.all()


@pytest.mark.parametrize("policy", ["normal", "easy", "easy_v2", "medium",
                                    "advanced", "advanced_vessel"])
def test_batch_train_unroll_matches_vmap(policy, rng):
    """batch_train's unrolled per-sample graphs (real lax.cond gates — only
    the taken op executes) must match the vmap/select form it
    replaced: same per-sample keys, same draw order, same values."""
    from eyediseasesegmentation_tpu.data.transforms import get_transform

    tr = get_transform(policy)(image_size=32)
    imgs = jnp.asarray(rng.rand(3, 41, 57, 3).astype(np.float32) * 255)
    masks = jnp.asarray((rng.rand(3, 41, 57) < 0.3).astype(np.float32))
    key = jax.random.PRNGKey(11)

    im_u, m_u = jax.jit(tr.batch_train)(key, imgs, masks)
    keys = jax.random.split(key, 3)
    im_v, m_v = jax.jit(jax.vmap(tr.train))(keys, imgs, masks)
    # same ops, same keys, same draws; XLA fuses cond branch bodies
    # differently than the inlined select form, so fp rounding can differ
    # in the last ulps (observed max 1.5e-5 on the 0..255 scale)
    np.testing.assert_allclose(np.asarray(im_u), np.asarray(im_v), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(m_u), np.asarray(m_v))
