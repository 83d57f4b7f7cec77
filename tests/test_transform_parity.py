"""Semantic-parity regressions for the on-device augmentation transforms
vs albumentations/cv2 definitions (parameter units, sampling, ordering).

Each test pins one of the parity fixes: GaussianBlur's cv2 sigma formula,
RandomBrightnessContrast's original-image mean, PadIfNeeded's reflect-101
default border, nested-Compose probability gating, Resize interpolation
validation, GlassBlur's pre+post gaussian, ISONoise's positive lightness
noise, and the HLS conversion roundtrip.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.data import transforms as T
from image_segmentation_lab_tpu.data.pipeline import Pipeline


def make_pipeline(transforms):
    return Pipeline.from_dict({
        "transform": {"__class_fullname__": "Compose", "p": 1.0,
                      "transforms": transforms}})


@pytest.fixture
def img32(rng):
    return rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8)


def test_gaussian_blur_matches_cv2_fixed_sigma(img32):
    spec = [{"__class_fullname__": "GaussianBlur", "p": 1.0,
             "blur_limit": [5, 5], "sigma_limit": [1.5, 1.5]}]
    out, _ = make_pipeline(spec)(jax.random.PRNGKey(0), img32,
                                 np.zeros((1, 32, 32)))
    ref = cv2.GaussianBlur(img32[0].astype(np.float32), (5, 5), 1.5)
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=1e-2)


def test_gaussian_blur_sigma0_uses_cv2_ksize_formula(img32):
    # sigma_limit=0 → sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8, exactly what
    # cv2.GaussianBlur(..., sigmaX=0) computes
    spec = [{"__class_fullname__": "GaussianBlur", "p": 1.0,
             "blur_limit": [5, 5], "sigma_limit": [0.0, 0.0]}]
    out, _ = make_pipeline(spec)(jax.random.PRNGKey(0), img32,
                                 np.zeros((1, 32, 32)))
    ref = cv2.GaussianBlur(img32[0].astype(np.float32), (5, 5), 0)
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=1e-2)


def test_brightness_uses_original_mean_when_not_by_max(img32):
    spec = [{"__class_fullname__": "RandomBrightnessContrast", "p": 1.0,
             "brightness_limit": [0.2, 0.2], "contrast_limit": [0.5, 0.5],
             "brightness_by_max": False}]
    out, _ = make_pipeline(spec)(jax.random.PRNGKey(0), img32,
                                 np.zeros((1, 32, 32)))
    f = img32[0].astype(np.float32)
    ref = np.clip(f * 1.5 + 0.2 * f.mean(), 0, 255)
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=1e-2)


def test_pad_if_needed_default_reflect101():
    t = T.PadIfNeeded(min_height=7, min_width=7)
    img = np.arange(5 * 5 * 1, dtype=np.float32).reshape(5, 5, 1)
    mask = np.arange(25, dtype=np.float32).reshape(5, 5)
    out, m = t.apply(jax.random.PRNGKey(0), jnp.asarray(img),
                     jnp.asarray(mask))
    ref = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    np.testing.assert_array_equal(np.asarray(out), ref)
    np.testing.assert_array_equal(np.asarray(m),
                                  np.pad(mask, 1, mode="reflect"))


def test_pad_if_needed_constant_fill_mask_defaults_zero():
    t = T.PadIfNeeded(min_height=6, min_width=6, border_mode=0, fill=7.0)
    img = np.ones((4, 4, 1), np.float32)
    mask = np.ones((4, 4), np.float32)
    out, m = t.apply(jax.random.PRNGKey(0), jnp.asarray(img),
                     jnp.asarray(mask))
    assert float(out[0, 0, 0]) == 7.0
    assert float(m[0, 0]) == 0.0  # albumentations pads masks with 0


def test_pad_if_needed_rejects_unknown_border_mode():
    with pytest.raises(AssertionError):
        T.PadIfNeeded(min_height=4, min_width=4, border_mode=3)


def test_nested_compose_p_gates_whole_block():
    img = np.arange(16, dtype=np.uint8).reshape(1, 4, 4, 1)
    mask = (np.arange(16).reshape(1, 4, 4) % 2).astype(np.float32)
    for p, changed in [(0.0, False), (1.0, True)]:
        spec = [{"__class_fullname__": "Compose", "p": p, "transforms": [
            {"__class_fullname__": "HorizontalFlip", "p": 1.0}]}]
        out, m = make_pipeline(spec)(jax.random.PRNGKey(0), img, mask)
        o = np.asarray(out[0, ..., 0])
        base = img[0, ..., 0].astype(np.float32)
        expected = base[:, ::-1] if changed else base
        np.testing.assert_array_equal(o, expected)
        np.testing.assert_array_equal(
            np.asarray(m[0]), mask[0][:, ::-1] if changed else mask[0])


def test_resize_rejects_unimplemented_interpolation():
    with pytest.raises(AssertionError):
        T.Resize(height=8, width=8, interpolation=2)
    with pytest.raises(AssertionError):
        T.Resize(height=8, width=8, mask_interpolation=3)


def test_glass_blur_truncate4_kernel_and_smoothing(img32):
    t = T.GlassBlur(sigma=0.7, max_delta=2, iterations=1, p=1.0)
    # scipy gaussian_filter truncate=4: radius = int(4*0.7 + 0.5) = 3 → 7
    g = t._gauss_kernel()
    assert g.shape == (7,)
    # the separable two-pass blur must equal the dense outer-product kernel
    x = jnp.asarray(np.random.RandomState(3).rand(15, 17, 3), jnp.float32)
    dense = T._depthwise_blur(x, g[:, None] * g[None, :])
    np.testing.assert_allclose(np.asarray(t._blur(x)), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)
    out, _ = t.apply(jax.random.PRNGKey(0),
                     jnp.asarray(img32[0], jnp.float32), None)
    f = img32[0].astype(np.float32)
    # blurred before AND after displacement → variance clearly reduced,
    # mean preserved
    assert float(jnp.var(out)) < 0.9 * f.var()
    assert abs(float(jnp.mean(out)) - f.mean()) < 5.0


def test_iso_noise_gray_image_invariant_and_noise_positive(rng):
    t = T.ISONoise(color_shift=(0.05, 0.05), intensity=(0.5, 0.5), p=1.0)
    gray = jnp.full((16, 16, 3), 128.0)
    out, _ = t.apply(jax.random.PRNGKey(0), gray, None)
    # constant image: std(L)=0 → λ=0 → no lightness noise; saturation 0 →
    # hue shift is invisible
    np.testing.assert_allclose(np.asarray(out), np.asarray(gray), atol=1e-3)

    img = jnp.asarray(rng.randint(0, 200, (16, 16, 3)), jnp.float32)
    noisy, _ = t.apply(jax.random.PRNGKey(1), img, None)
    # Poisson lightness noise is strictly positive → mean brightens
    assert float(jnp.mean(noisy)) > float(jnp.mean(img))


def test_hls_roundtrip(rng):
    x = jnp.asarray(rng.rand(8, 8, 3), jnp.float32)
    back = T._hls_to_rgb(T._rgb_to_hls(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_motion_blur_direction_ramp_and_shift(img32):
    t = T.MotionBlur(blur_limit=(7, 7), allow_shifted=True,
                     direction_range=(1.0, 1.0), p=1.0)
    out, _ = t.apply(jax.random.PRNGKey(0),
                     jnp.asarray(img32[0], jnp.float32), None)
    f = img32[0].astype(np.float32)
    assert float(jnp.var(out)) < f.var()
    assert abs(float(jnp.mean(out)) - f.mean()) < 5.0


@pytest.mark.parametrize("border_mode,cv2_mode", [
    (4, cv2.BORDER_REFLECT_101), (2, cv2.BORDER_REFLECT),
    (1, cv2.BORDER_REPLICATE)])
def test_rotate_border_modes_match_cv2(rng, border_mode, cv2_mode):
    """Rotate must honor non-default border_modes (the albumentations
    2.0.6 default is 0 = BORDER_CONSTANT, per the reference's serialized
    YAMLs; the reflect/replicate modes remain supported)."""
    img = rng.randint(0, 255, (33, 32, 3)).astype(np.uint8)
    angle = 37.0
    t = T.Rotate(limit=[angle, angle], border_mode=border_mode, p=1.0)
    out, _ = t.apply(jax.random.PRNGKey(0),
                     jnp.asarray(img, jnp.float32), None)
    h, w = img.shape[:2]
    M = cv2.getRotationMatrix2D(((w - 1) / 2.0, (h - 1) / 2.0), angle, 1.0)
    ref = cv2.warpAffine(img.astype(np.float32), M, (w, h),
                         flags=cv2.INTER_LINEAR, borderMode=cv2_mode)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2.0)


def test_rotate_mask_border_modes_match_cv2(rng):
    mask = rng.randint(0, 3, (32, 32)).astype(np.float32)
    img = rng.rand(32, 32, 3).astype(np.float32)
    t = T.Rotate(limit=[25.0, 25.0], border_mode=4, p=1.0)
    _, out_mask = t.apply(jax.random.PRNGKey(0), jnp.asarray(img),
                          jnp.asarray(mask))
    M = cv2.getRotationMatrix2D((15.5, 15.5), 25.0, 1.0)
    ref = cv2.warpAffine(mask, M, (32, 32), flags=cv2.INTER_NEAREST,
                         borderMode=cv2.BORDER_REFLECT_101)
    # nearest-neighbor rounding at exact .5 source coordinates may differ
    agree = (np.asarray(out_mask) == ref).mean()
    assert agree > 0.98, f"mask agreement {agree:.3f}"


def test_rotate_rejects_unsupported_border_mode():
    with pytest.raises(AssertionError):
        T.Rotate(limit=[10, 10], border_mode=3, p=1.0)


def test_rotate_rejects_unimplemented_interpolations():
    """The fused warp is bilinear-image/nearest-mask only — other cv2
    codes must fail loudly, not silently warp differently."""
    with pytest.raises(AssertionError):
        T.Rotate(limit=[10, 10], interpolation=0, p=1.0)
    with pytest.raises(AssertionError):
        T.Rotate(limit=[10, 10], mask_interpolation=1, p=1.0)


def test_gaussian_blur_rejects_sigma_derived_ksize():
    """albumentations blur_limit=0 (ksize from sigma) is unimplemented —
    reject at construction, not via a trace-time crash."""
    with pytest.raises(ValueError, match="blur_limit"):
        T.GaussianBlur(blur_limit=0, sigma_limit=(0.5, 3.0), p=1.0)


def test_rotate_default_border_mode_matches_albumentations_206():
    """albumentations 2.0.6 (the version the reference pins) defaults
    Rotate to cv2.BORDER_CONSTANT: the reference's serialized YAMLs
    (configs/augmentation/*.yaml, ``__version__: 2.0.6``, generated from
    A.Rotate with no explicit border_mode) all record ``border_mode: 0``.
    A config omitting border_mode must get constant fill, not reflection."""
    assert T.Rotate(limit=[10, 10]).border_mode == 0


@pytest.mark.parametrize("border_mode", [0, 1, 2, 4])
def test_rotate_fused_pair_equals_separate_samples(rng, border_mode):
    """The single-gather img+mask sampler (_affine_sample_pair) must equal
    the two independent _affine_sample calls bit-for-bit — including the
    round-half-even nearest selection for the mask."""
    img = jnp.asarray(rng.rand(21, 19, 3), jnp.float32)
    mask = jnp.asarray(rng.randint(0, 5, (21, 19)), jnp.float32)
    angle = 0.61  # radians; also hits exact .5 coords via the grid center
    c, s = np.cos(angle), np.sin(angle)
    inv = jnp.asarray([[c, s], [-s, c]], jnp.float32)
    center = ((21 - 1) / 2.0, (19 - 1) / 2.0)
    oi, om = T._affine_sample_pair(img, mask, inv, center, 7.0, 2.0,
                                   border_mode)
    ri = T._affine_sample(img, inv, center, 7.0, border_mode=border_mode)
    rm = T._affine_sample(mask, inv, center, 2.0, nearest=True,
                          border_mode=border_mode)
    np.testing.assert_allclose(np.asarray(oi), np.asarray(ri),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(om), np.asarray(rm))


# --------- documented-approximation tolerance bounds (VERDICT r1 #9) ----
def test_iso_noise_normal_vs_poisson_bound():
    """ISONoise approximates Poisson(λ) with Normal(λ, √λ) clipped at 0
    (transforms.py ISONoise docstring).  Pin the distribution gap at the λ
    extremes the Kvasir pipeline produces (std(L)·intensity·255: λ≈2.5 at
    intensity 0.1 on a flat-ish image, λ≈25 at intensity 0.5)."""
    n = 200_000
    for lam, mean_tol, std_tol, q_tol in ((2.5, 0.03, 0.10, 0.6),
                                          (25.0, 0.01, 0.05, 1.0)):
        normal_draw = np.maximum(
            lam + np.sqrt(lam) * np.random.RandomState(0).randn(n), 0.0)
        pois = np.random.RandomState(1).poisson(lam, n).astype(np.float64)
        assert abs(normal_draw.mean() - pois.mean()) < mean_tol * lam
        assert abs(normal_draw.std() - pois.std()) < std_tol * np.sqrt(lam)
        for q in (25, 50, 75):
            assert abs(np.percentile(normal_draw, q)
                       - np.percentile(pois, q)) < q_tol


def _sequential_glass_blur(img_f, sigma, max_delta, iterations, rs):
    """imagecorruptions' exact algorithm: gaussian → sequential in-place
    pixel SWAPS over a reversed raster scan → gaussian (the albumentations
    backend).  Ours replaces the swaps with a parallel gather."""
    r = max(int(4.0 * sigma + 0.5), 1)
    k = 2 * r + 1
    x = cv2.GaussianBlur(img_f, (k, k), sigma,
                         borderType=cv2.BORDER_REFLECT_101)
    H, W = x.shape[:2]
    for _ in range(iterations):
        for h in range(H - max_delta, max_delta, -1):
            for w in range(W - max_delta, max_delta, -1):
                dx, dy = rs.randint(-max_delta, max_delta, size=(2,))
                hp, wp = h + dy, w + dx
                x[h, w], x[hp, wp] = x[hp, wp].copy(), x[h, w].copy()
    return cv2.GaussianBlur(x, (k, k), sigma,
                            borderType=cv2.BORDER_REFLECT_101)


def test_glass_blur_gather_vs_sequential_swap_bound(rng):
    """Distribution-level parity bound for the documented parallel-gather
    approximation: same first/second moments and comparable displacement
    energy as the sequential-swap reference on the interior region."""
    sigma, max_delta, iterations = 0.7, 2, 1
    img = rng.randint(0, 255, (48, 48, 3)).astype(np.float32)
    ours, _ = T.GlassBlur(sigma=sigma, max_delta=max_delta,
                          iterations=iterations, p=1.0).apply(
        jax.random.PRNGKey(0), jnp.asarray(img), None)
    ours = np.asarray(ours)
    ref = _sequential_glass_blur(img.copy(), sigma, max_delta, iterations,
                                 np.random.RandomState(0))
    m = max_delta + 3  # crop the border band the swap loop never visits
    o, f = ours[m:-m, m:-m], ref[m:-m, m:-m]
    assert abs(o.mean() - f.mean()) < 2.0            # 0-255 scale
    # measured gap: the gather keeps ~10% more variance than the swap —
    # sequential swaps chain (a pixel can move repeatedly), mixing harder
    # before the final gaussian.  Pinned at 15%.
    assert abs(o.std() / f.std() - 1.0) < 0.15
    # displacement energy: how far the shuffle moved pixels off the
    # plain gaussian baseline
    base = cv2.GaussianBlur(cv2.GaussianBlur(
        img, (7, 7), sigma, borderType=cv2.BORDER_REFLECT_101),
        (7, 7), sigma, borderType=cv2.BORDER_REFLECT_101)[m:-m, m:-m]
    e_ours = np.abs(o - base).mean()
    e_ref = np.abs(f - base).mean()
    assert 0.6 < e_ours / e_ref < 1.4, (e_ours, e_ref)
