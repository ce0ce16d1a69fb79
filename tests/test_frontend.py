"""Golden tests: TPU front-end kernels vs scalar reference math.

Covers BASELINE config 1 (single-frame pyramid + ORB exactness): the kernels
must reproduce the reference arithmetic (ic_angle integer moments, fastAtan2,
fast cos/sin, rotated-BRIEF bit pattern, pyramid resize/blur) on random
images.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from slam_tpu.ops import detector, orb
from slam_tpu.ops.frontend import OrbExtractor
from slam_tpu.ops.pyramid import ImagePyramid, gaussian_kernel_1d, level_sizes
from slam_tpu.params import Parameters, ParametersSlam, StaticSettings

import ref_orb

rng = np.random.default_rng(7)


def random_image(h=120, w=160):
    # smooth-ish random image so corners exist but ties are rare
    img = rng.integers(0, 256, size=(h, w)).astype(np.float64)
    img = ref_orb.ref_gaussian_blur_7x7_s2(img)
    return np.rint(img).astype(np.uint8)


class TestTrig:
    def test_fast_atan2_matches_reference(self):
        ys = rng.normal(size=200) * 1000
        xs = rng.normal(size=200) * 1000
        got = np.asarray(orb.fast_atan2_deg(ys.astype(np.float32), xs.astype(np.float32)))
        want = np.array([ref_orb.ref_fast_atan2_deg(y, x) for y, x in zip(ys, xs)])
        assert np.allclose(got, want, atol=1e-3)

    def test_fast_cos_sin_match_reference(self):
        vs = rng.uniform(-20, 20, size=200).astype(np.float32)
        gc = np.asarray(orb.fast_cos(vs))
        gs = np.asarray(orb.fast_sin(vs))
        wc = np.array([ref_orb.ref_fast_cos(v) for v in vs])
        ws = np.array([ref_orb.ref_fast_sin(v) for v in vs])
        assert np.allclose(gc, wc, atol=1e-6)
        assert np.allclose(gs, ws, atol=1e-6)

    def test_u_max_table(self):
        assert np.array_equal(orb.u_max_table(), ref_orb.ref_u_max())


class TestIcAngle:
    def test_matches_reference_integer_math(self):
        img = random_image()
        pts = np.stack([rng.integers(20, 140, 30), rng.integers(20, 100, 30)], -1)
        patches = orb.extract_patches(jnp.asarray(img, jnp.float32), jnp.asarray(pts, jnp.float32))
        got = np.asarray(orb.ic_angles(patches))
        want = np.array([ref_orb.ref_ic_angle(img, int(x), int(y)) for x, y in pts])
        assert np.allclose(got, want, atol=1e-2), np.abs(got - want).max()


class TestDescriptor:
    def test_matches_reference_bits(self):
        img = random_image()
        n = 40
        pts = np.stack([rng.integers(20, 140, n), rng.integers(20, 100, n)], -1)
        angles = rng.uniform(0, 360, n).astype(np.float32)
        patches = orb.extract_patches(jnp.asarray(img, jnp.float32), jnp.asarray(pts, jnp.float32))
        got = np.asarray(orb.descriptors_from_patches(patches, jnp.asarray(angles)))
        for i, (x, y) in enumerate(pts):
            want_bytes = ref_orb.ref_descriptor(img, int(x), int(y), angles[i])
            want_words = ref_orb.bytes_to_words(want_bytes)
            assert np.array_equal(got[i], want_words), f"kp {i}: {got[i]} vs {want_words}"

    def test_rotation_changes_bits(self):
        img = random_image()
        pts = np.array([[60, 60]])
        patches = orb.extract_patches(jnp.asarray(img, jnp.float32), jnp.asarray(pts, jnp.float32))
        d0 = np.asarray(orb.descriptors_from_patches(patches, jnp.asarray([0.0], jnp.float32)))
        d90 = np.asarray(orb.descriptors_from_patches(patches, jnp.asarray([90.0], jnp.float32)))
        assert not np.array_equal(d0, d90)


class TestPyramid:
    def test_level_sizes_rounding(self):
        settings = StaticSettings()
        sizes = level_sizes(752, 480, settings.scaleFactors)
        assert sizes[0] == (752, 480)
        # reference: round(cols / scale), round(rows / scale)
        for lvl, (w, h) in enumerate(sizes):
            s = float(settings.scaleFactors[lvl])
            assert w == int(round(752 / s)) and h == int(round(480 / s))

    def test_gaussian_kernel_matches_reference(self):
        k = gaussian_kernel_1d()
        x = np.arange(7) - 3.0
        want = np.exp(-0.5 * x * x / 4.0)
        want /= want.sum()
        assert np.allclose(k, want, atol=1e-7)

    def test_resize_and_blur_match_reference_math(self):
        img = random_image(96, 128)
        settings = StaticSettings()
        pyr = ImagePyramid(settings, 128, 96).update(img)
        # level 1: bilinear downscale of level 0
        w1, h1 = pyr.sizes[1]
        # Quantization happens at .5 ties where f32-vs-f64 accumulation order
        # legitimately flips the rounded value; require max error of one gray
        # level and small mean error.
        want1 = np.rint(np.clip(ref_orb.ref_bilinear_resize(img.astype(np.float64), h1, w1), 0, 255))
        got1 = np.asarray(pyr.levels[1])
        assert np.abs(got1 - want1).max() <= 1.0
        assert np.abs(got1 - want1).mean() < 0.3
        # blurred level 0: Gaussian of the original
        want_b0 = np.rint(ref_orb.ref_gaussian_blur_7x7_s2(img.astype(np.float64)))
        got_b0 = np.asarray(pyr.blurred[0])
        assert np.abs(got_b0 - want_b0).max() <= 1.0
        assert np.abs(got_b0 - want_b0).mean() < 0.3

    def test_chained_levels_shrink(self):
        img = random_image(96, 128)
        pyr = ImagePyramid(StaticSettings(), 128, 96).update(img)
        for lvl in range(1, pyr.num_levels):
            w, h = pyr.sizes[lvl]
            pw, ph = pyr.sizes[lvl - 1]
            assert w < pw and h < ph
            assert pyr.levels[lvl].shape == (h, w)


@pytest.mark.slow
class TestFullGeometryGolden:
    """BASELINE config 1 at the reference's real geometry: 752x480, 8-level
    pyramid (orb_extractor.cpp:73-164). The small-geometry tests above prove
    the arithmetic; this proves it at the production shapes (tiling, padding
    and edge handling differ with size)."""

    def test_config1_pyramid_and_descriptors(self):
        W, H = 752, 480
        img = random_image(H, W)
        settings = StaticSettings()
        pyr = ImagePyramid(settings, W, H).update(img)
        assert pyr.num_levels == 8 and pyr.sizes[0] == (W, H)

        # Pyramid parity per resize/blur step at full frame. Each device
        # level is checked against the float64 reference resize of the
        # device's own previous level, isolating one step so rounding
        # differences can't compound. +-1 gray level is the documented
        # float-vs-fixed-point deviation (docs/ARCHITECTURE.md §4.2) at .5
        # rounding ties; mean error must stay tiny.
        for lvl in range(1, pyr.num_levels):
            w, h = pyr.sizes[lvl]
            prev = np.asarray(pyr.levels[lvl - 1]).astype(np.float64)
            want = np.rint(np.clip(ref_orb.ref_bilinear_resize(prev, h, w),
                                   0, 255))
            got = np.asarray(pyr.levels[lvl])
            assert got.shape == (h, w)
            assert np.abs(got - want).max() <= 1.0, f"level {lvl}"
            assert np.abs(got - want).mean() < 0.3, f"level {lvl}"
        for lvl in range(pyr.num_levels):
            lvl_img = np.asarray(pyr.levels[lvl]).astype(np.float64)
            want_b = np.rint(ref_orb.ref_gaussian_blur_7x7_s2(lvl_img))
            got_b = np.asarray(pyr.blurred[lvl])
            assert np.abs(got_b - want_b).max() <= 1.0, f"blur level {lvl}"
            assert np.abs(got_b - want_b).mean() < 0.3, f"blur level {lvl}"

        # Angle + descriptor bit-equality on ~200 sampled interior keypoints
        # per level, against the scalar reference math on the same (device)
        # blurred level, as the extractor computes them
        # (orb_extractor.cpp:141-164: angles on the level image, descriptors
        # on the blurred level image).
        kp_rng = np.random.default_rng(42)
        for lvl in range(pyr.num_levels):
            w, h = pyr.sizes[lvl]
            n = 200
            pts = np.stack([kp_rng.integers(20, w - 20, n),
                            kp_rng.integers(20, h - 20, n)], -1)
            lvl_img = np.asarray(pyr.levels[lvl])
            blur_img = np.asarray(pyr.blurred[lvl])
            patches_lvl = orb.extract_patches(
                jnp.asarray(lvl_img, jnp.float32),
                jnp.asarray(pts, jnp.float32))
            angles = np.asarray(orb.ic_angles(patches_lvl))
            want_angles = np.array(
                [ref_orb.ref_ic_angle(lvl_img, int(x), int(y))
                 for x, y in pts])
            assert np.allclose(angles, want_angles, atol=1e-2), \
                f"angles level {lvl}: {np.abs(angles - want_angles).max()}"
            patches_blur = orb.extract_patches(
                jnp.asarray(blur_img, jnp.float32),
                jnp.asarray(pts, jnp.float32))
            got_desc = np.asarray(orb.descriptors_from_patches(
                patches_blur, jnp.asarray(angles, jnp.float32)))
            for i, (x, y) in enumerate(pts):
                want_words = ref_orb.bytes_to_words(ref_orb.ref_descriptor(
                    blur_img, int(x), int(y), angles[i]))
                assert np.array_equal(got_desc[i], want_words), \
                    f"descriptor bits differ: level {lvl} kp {i} ({x},{y})"


class TestDetector:
    def test_shi_tomasi_finds_corner(self):
        img = np.zeros((64, 64), np.float32)
        img[30:, 30:] = 200.0  # a single strong corner at (30, 30)
        resp = np.asarray(detector.shi_tomasi_response(jnp.asarray(img)))
        cy, cx = np.unravel_index(np.argmax(resp), resp.shape)
        assert abs(cx - 30) <= 2 and abs(cy - 30) <= 2

    def test_fast_finds_corner_blob(self):
        img = np.full((64, 64), 50.0, np.float32)
        img[32, 32] = 250.0  # isolated bright dot = FAST corner
        resp = np.asarray(detector.fast_response(jnp.asarray(img)))
        assert resp[32, 32] > 0

    def test_select_keypoints_budget_margin(self):
        img = rng.normal(size=(100, 120)).astype(np.float32) ** 2
        xy, score, valid = detector.select_keypoints(jnp.asarray(img), 50, 3)
        xy, score, valid = np.asarray(xy), np.asarray(score), np.asarray(valid)
        assert xy.shape == (50, 2)
        sel = xy[valid]
        assert (sel[:, 0] >= 19).all() and (sel[:, 0] < 120 - 19).all()
        assert (sel[:, 1] >= 19).all() and (sel[:, 1] < 100 - 19).all()
        # scores are sorted descending for valid slots
        s = score[valid]
        assert (np.diff(s) <= 1e-6).all()

    def test_min_distance_enforced(self):
        img = rng.normal(size=(100, 120)).astype(np.float32) ** 2
        xy, _, valid = detector.select_keypoints(jnp.asarray(img), 80, 5)
        sel = np.asarray(xy)[np.asarray(valid)]
        d = np.linalg.norm(sel[:, None] - sel[None, :], axis=-1)
        np.fill_diagonal(d, 1e9)
        assert d.min() >= 5.0


class TestOrbExtractorEndToEnd:
    def test_full_frame(self):
        img = random_image(240, 320)
        settings = StaticSettings(Parameters(slam=ParametersSlam(maxKeypoints=300)))
        ex = OrbExtractor(settings, 320, 240, max_tracked=8)
        tracked = np.array([[100.0, 100.0], [200.0, 150.0]])
        res = ex.detect_and_extract(img, tracked, np.array([11, 22]))
        assert res.valid[:2].all()
        # tracked keypoints keep original full-res coordinates and track ids
        assert np.allclose(res.pts[:2], tracked)
        assert res.track_ids[0] == 11 and res.track_ids[1] == 22
        assert res.octave[0] == settings.parameters.slam.orbLkTrackLevel
        c = res.compact()
        assert len(c.pts) > 50  # detector found a healthy number of corners
        assert c.descriptors.dtype == np.uint32 and c.descriptors.shape[1] == 8
        # all valid detected keypoints are inside the image
        assert (c.pts[:, 0] >= 0).all() and (c.pts[:, 0] < 320).all()
        assert (c.pts[:, 1] >= 0).all() and (c.pts[:, 1] < 240).all()
        # octaves span several pyramid levels
        assert len(np.unique(c.octave)) >= 3

    def test_descriptors_stable_across_calls(self):
        img = random_image(240, 320)
        settings = StaticSettings(Parameters(slam=ParametersSlam(maxKeypoints=200)))
        ex = OrbExtractor(settings, 320, 240)
        r1 = ex.detect_and_extract(img).compact()
        r2 = ex.detect_and_extract(img).compact()
        assert np.array_equal(r1.descriptors, r2.descriptors)
        assert np.array_equal(r1.pts, r2.pts)

    def test_tracked_device_buffer_memoization(self):
        """The device copies of the packed tracked-point buffers are reused
        while the contents repeat and refreshed when they change, without
        affecting the extraction results."""
        img = random_image(240, 320)
        settings = StaticSettings(Parameters(slam=ParametersSlam(maxKeypoints=200)))
        ex = OrbExtractor(settings, 320, 240, max_tracked=8)
        t1 = np.array([[100.0, 100.0], [200.0, 150.0]])
        r1 = ex.detect_and_extract(img, t1, np.array([1, 2]))
        buf1 = ex._dev_txy
        r2 = ex.detect_and_extract(img, t1.copy(), np.array([1, 2]))
        assert ex._dev_txy is buf1  # same contents -> same device buffer
        assert np.array_equal(r1.descriptors, r2.descriptors)
        t2 = np.array([[120.0, 90.0], [210.0, 160.0]])
        r3 = ex.detect_and_extract(img, t2, np.array([1, 2]))
        assert ex._dev_txy is not buf1  # changed contents -> fresh upload
        assert np.allclose(r3.pts[:2], t2)


class TestDeviceBowWords:
    def test_fused_words_match_host_quantize(self):
        """The front-end's on-device BoW quantization must produce the same
        word ids as ops/bow.quantize (exact distances, first-min ties)."""
        import jax
        from slam_tpu.ops.frontend import OrbExtractor
        from slam_tpu.ops import bow
        from slam_tpu.params import StaticSettings

        settings = StaticSettings()
        ex = OrbExtractor(settings, 320, 240, max_tracked=16)
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (240, 320)).astype(np.uint8)
        res = ex.detect_and_extract(img).compact()
        assert res.words is not None and len(res.words) > 50
        codebook = bow.make_codebook(
            settings.parameters.slam.bowVocabularySize)
        want = bow.quantize(res.descriptors, codebook)
        assert np.array_equal(res.words, want)
