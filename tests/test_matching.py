"""Tests for the Hamming GEMM kernel and the matcher-suite semantics."""
import numpy as np
import jax.numpy as jnp

from slam_tpu.ops import hamming, matching

rng = np.random.default_rng(3)


def random_desc(n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


class TestHamming:
    def test_gemm_equals_popcount(self):
        d1, d2 = random_desc(64), random_desc(48)
        gemm = np.asarray(hamming.hamming_matrix(jnp.asarray(d1), jnp.asarray(d2)))
        pop = np.asarray(hamming.hamming_matrix_popcount(jnp.asarray(d1), jnp.asarray(d2)))
        host = hamming.hamming_matrix_host(d1, d2)
        assert np.array_equal(gemm, pop)
        assert np.array_equal(gemm, host)

    def test_identical_is_zero_complement_is_256(self):
        d = random_desc(5)
        m = np.asarray(hamming.hamming_matrix(jnp.asarray(d), jnp.asarray(d)))
        assert np.array_equal(np.diag(m), np.zeros(5))
        inv = ~d
        m2 = np.asarray(hamming.hamming_matrix(jnp.asarray(d), jnp.asarray(inv)))
        assert np.array_equal(np.diag(m2), np.full(5, 256))

    def test_known_single_bit(self):
        a = np.zeros((1, 8), np.uint32)
        b = np.zeros((1, 8), np.uint32)
        b[0, 3] = 1 << 17
        assert hamming.hamming_distance(a[0], b[0]) == 1
        m = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        assert m[0, 0] == 1

    def test_mutual_nn_lowe_ratio(self):
        """Lowe second-best gate of the device matchers: a near-tie between
        candidates is an ambiguous association and must be dropped; a clear
        winner and a single-candidate row (second = MASK_DIST) pass."""
        M = hamming.MASK_DIST
        dist = jnp.asarray(np.array([
            [10, 40, M],   # clear winner: 10 < 0.8 * 40
            [30, 33, M],   # near-tie: 30 >= 0.8 * 33 -> ambiguous
            [20, M, M],    # single candidate: second is MASK_DIST -> passes
        ], np.int32))
        nn, ok = hamming.mutual_nn(dist, thr=50, ratio=0.8)
        nn, ok = np.asarray(nn), np.asarray(ok)
        assert nn.tolist() == [0, 0, 0]
        # row 1 loses mutual-NN to row 0 as well; isolate the ratio effect
        # with a matrix where mutuality holds for every row
        dist2 = jnp.asarray(np.array([
            [10, 40, M],
            [M, 30, 33],
            [M, M, 20],
        ], np.int32))
        _, ok_off = hamming.mutual_nn(dist2, thr=50, ratio=1.0)
        _, ok_on = hamming.mutual_nn(dist2, thr=50, ratio=0.8)
        assert np.asarray(ok_off).tolist() == [True, True, True]
        assert np.asarray(ok_on).tolist() == [True, False, True]


class TestAngleChecker:
    def test_keeps_top3_bins(self):
        # 40 matches at delta=0, 30 at delta=90, 20 at delta=180, 5 at delta=240
        deltas = np.concatenate([np.zeros(40), np.full(30, 90.0),
                                 np.full(20, 180.0), np.full(5, 240.0)])
        valid = np.ones(len(deltas), bool)
        bad = matching.angle_check_invalid(deltas, valid)
        assert not bad[:90].any()      # top-3 bins survive
        assert bad[90:].all()          # smallest bin rejected

    def test_negative_angles_wrap(self):
        deltas = np.array([-10.0, 350.0])
        valid = np.ones(2, bool)
        bad = matching.angle_check_invalid(deltas, valid)
        assert not bad.any()  # same bin, both kept


class TestEpipolar:
    def test_create_E_and_inliers(self):
        # two cameras looking at points; perfect correspondences satisfy E
        from slam_tpu.geometry import se3
        R1, t1 = np.eye(3), np.zeros(3)
        R2 = se3.so3_exp(np.array([0.0, 0.1, 0.0]))
        c2 = np.array([0.5, 0.0, 0.0])
        t2 = -R2 @ c2
        pts = rng.uniform([-1, -1, 3], [1, 1, 6], (30, 3))
        b1 = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        p2 = pts @ R2.T + t2
        b2 = p2 / np.linalg.norm(p2, axis=1, keepdims=True)
        E12 = matching.create_E_21(R2, t2, R1, t1)  # maps cam2 bearings -> epiplanes in cam1
        inl = matching.epipolar_inlier_matrix(b1, b2, E12, np.ones(30), 0.2)
        assert np.diag(inl).all()
        # golden comparison against an independent scalar transcription of
        # check_epipolar_constraint (keyframe_matcher.cpp:23-44). Note the
        # reference's residual is SIGNED (pi/2 - acos(cos)), so negative-side
        # pairs always pass — replicated faithfully.
        want = np.zeros((30, 30), dtype=bool)
        for i in range(30):
            for j in range(30):
                ep = E12 @ b2[j]
                cos = ep.dot(b1[i]) / np.linalg.norm(ep)
                residual = np.pi / 2.0 - abs(np.arccos(np.clip(cos, -1, 1)))
                want[i, j] = residual < np.radians(0.2) * 1.0
        assert np.array_equal(inl, want)
        # mismatched pairs on the positive side of the plane do get rejected
        off_mask = ~np.eye(30, dtype=bool)
        assert inl[off_mask].mean() < 0.9


class TestLoopClosureMatcher:
    def test_perfect_matches_found(self):
        d1 = random_desc(30)
        perm = rng.permutation(30)
        d2 = d1[perm]
        dist = hamming.hamming_matrix_host(d1, d2)
        groups = np.zeros(30, np.int64)
        ang = np.zeros(30)
        matched = matching.match_loop_closure_descriptors(
            dist, groups, groups[perm].copy() * 0, np.ones(30, bool), np.ones(30, bool),
            ang, ang, lowe_ratio=0.9)
        # every feature matches its permuted twin
        want = np.empty(30, np.int64)
        want[np.arange(30)] = np.argsort(perm)[np.arange(30)]
        # matched[i] should be index j with d2[j] == d1[i] -> j = perm^{-1}(i)
        inv = np.argsort(perm)
        assert np.array_equal(matched, inv)

    def test_lowe_ratio_rejects_ambiguous(self):
        d1 = random_desc(1)
        # two near-identical candidates: distances 10 and 11 -> ratio test fails
        d2 = np.repeat(d1, 2, axis=0)
        dist = np.array([[10, 11]], dtype=np.int32)
        matched = matching.match_loop_closure_descriptors(
            dist, np.zeros(1, np.int64), np.zeros(2, np.int64),
            np.ones(1, bool), np.ones(2, bool), np.zeros(1), np.zeros(2),
            lowe_ratio=0.9)
        assert matched[0] == -1
        # distances 10 and 50: passes
        dist2 = np.array([[10, 50]], dtype=np.int32)
        matched2 = matching.match_loop_closure_descriptors(
            dist2, np.zeros(1, np.int64), np.zeros(2, np.int64),
            np.ones(1, bool), np.ones(2, bool), np.zeros(1), np.zeros(2),
            lowe_ratio=0.9)
        assert matched2[0] == 0

    def test_group_restriction(self):
        d1 = random_desc(2)
        d2 = d1.copy()
        dist = hamming.hamming_matrix_host(d1, d2)
        g1 = np.array([0, 1])
        g2 = np.array([1, 0])  # twin descriptors live in the other group
        matched = matching.match_loop_closure_descriptors(
            dist, g1, g2, np.ones(2, bool), np.ones(2, bool),
            np.zeros(2), np.zeros(2), lowe_ratio=0.9)
        assert (matched == -1).all()

    def test_one_to_one_first_wins(self):
        d = random_desc(1)
        d1 = np.repeat(d, 2, axis=0)   # two identical queries
        d2 = d                          # one target
        dist = hamming.hamming_matrix_host(d1, d2)
        matched = matching.match_loop_closure_descriptors(
            dist, np.zeros(2, np.int64), np.zeros(1, np.int64),
            np.ones(2, bool), np.ones(1, bool), np.zeros(2), np.zeros(1),
            lowe_ratio=0.9)
        assert matched[0] == 0 and matched[1] == -1


class TestTriangulationMatcher:
    def test_epipolar_gate_applied(self):
        d1 = random_desc(4)
        d2 = d1.copy()
        dist = hamming.hamming_matrix_host(d1, d2)
        epi = np.ones((4, 4), bool)
        epi[2, 2] = False  # kill one pair via epipolar gate
        pairs = matching.match_for_triangulation(
            dist, np.zeros(4, np.int64), np.zeros(4, np.int64),
            np.ones(4, bool), np.ones(4, bool), epi,
            np.zeros(4), np.zeros(4))
        got = dict(pairs)
        assert 2 not in got
        assert got[0] == 0 and got[1] == 1 and got[3] == 3

    def test_free_mask(self):
        d1 = random_desc(3)
        dist = hamming.hamming_matrix_host(d1, d1)
        free1 = np.array([True, False, True])
        pairs = matching.match_for_triangulation(
            dist, np.zeros(3, np.int64), np.zeros(3, np.int64),
            free1, np.ones(3, bool), np.ones((3, 3), bool),
            np.zeros(3), np.zeros(3))
        assert 1 not in dict(pairs)


class TestNativeFusedMatchers:
    """The C++ fused matchers must agree exactly with the NumPy reference
    paths (same greedy order, tie-breaking, gates) on random problems."""

    def _random_problem(self, n1, n2, n_groups, seed):
        r = np.random.default_rng(seed)
        d1 = r.integers(0, 2**32, size=(n1, 8), dtype=np.uint32)
        d2 = r.integers(0, 2**32, size=(n2, 8), dtype=np.uint32)
        # clone some descriptors across sides so distances go below THR_LOW
        for i in range(0, min(n1, n2), 2):
            d2[i] = d1[i]
            flip = r.integers(0, 8)
            d2[i, flip] ^= np.uint32(1) << np.uint32(r.integers(0, 32))
        g1 = r.integers(0, n_groups, n1).astype(np.int64)
        g2 = r.integers(0, n_groups, n2).astype(np.int64)
        m1 = r.random(n1) < 0.8
        m2 = r.random(n2) < 0.8
        a1 = r.uniform(0, 360, n1)
        a2 = r.uniform(0, 360, n2)
        b1 = r.normal(size=(n1, 3))
        b1 /= np.linalg.norm(b1, axis=1, keepdims=True)
        b2 = r.normal(size=(n2, 3))
        b2 /= np.linalg.norm(b2, axis=1, keepdims=True)
        return d1, d2, g1, g2, m1, m2, a1, a2, b1, b2

    def test_triangulation_matcher_matches_numpy(self):
        from slam_tpu import native
        if not native.available():
            import pytest
            pytest.skip("no native toolchain")
        for seed in range(4):
            (d1, d2, g1, g2, m1, m2, a1, a2,
             b1, b2) = self._random_problem(120, 140, 12, seed)
            r = np.random.default_rng(100 + seed)
            E12 = r.normal(size=(3, 3))
            scale_1 = 1.2 ** r.integers(0, 8, len(d1)).astype(np.float64)
            thr_deg = 1.0 + 3.0 * r.random()
            sin_thr = np.sin(np.radians(thr_deg) * scale_1)
            got = native.match_triangulation(
                d1, g1, m1, b1, sin_thr, d2, g2, m2, b2, E12,
                hamming.HAMMING_DIST_THR_LOW)
            got_pairs = matching.apply_angle_check(got, a1, a2, as_pairs=True)
            epi = matching.epipolar_inlier_matrix(b1, b2, E12, scale_1, thr_deg)
            dist = hamming.hamming_matrix_host(d1, d2)
            want = matching.match_for_triangulation(
                dist, g1, g2, m1, m2, epi, a1, a2)
            assert got_pairs == want, f"seed {seed}"

    def test_loop_closure_matcher_matches_numpy(self):
        from slam_tpu import native
        if not native.available():
            import pytest
            pytest.skip("no native toolchain")
        for seed in range(4):
            (d1, d2, g1, g2, m1, m2, a1, a2,
             _, _) = self._random_problem(120, 140, 12, 50 + seed)
            lowe = 0.9
            got = native.match_loop_closure(
                d1, g1, m1, d2, g2, m2, lowe,
                hamming.HAMMING_DIST_THR_LOW, hamming.MAX_HAMMING_DIST)
            got = matching.apply_angle_check(got, a1, a2)
            dist = hamming.hamming_matrix_host(d1, d2)
            want = matching.match_loop_closure_descriptors(
                dist, g1, g2, m1, m2, a1, a2, lowe_ratio=lowe)
            assert np.array_equal(got, want), f"seed {seed}"
