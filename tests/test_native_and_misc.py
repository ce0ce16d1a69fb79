"""Tests for native hostops, Sim3 refinement, retrieval, and the sharded step."""
import numpy as np
import pytest

from slam_tpu import native
from slam_tpu.geometry import se3
from slam_tpu.ops.hamming import hamming_matrix_host


rng = np.random.default_rng(9)


class TestNativeHostops:
    def test_hamming_matrix_matches_numpy(self):
        a = rng.integers(0, 2**32, (50, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, (70, 8), dtype=np.uint32)
        assert np.array_equal(native.hamming_matrix(a, b),
                              hamming_matrix_host(a, b))

    def test_hamming_row(self):
        a = rng.integers(0, 2**32, (8,), dtype=np.uint32)
        b = rng.integers(0, 2**32, (30, 8), dtype=np.uint32)
        assert np.array_equal(native.hamming_row(a, b),
                              hamming_matrix_host(a[None], b)[0])

    def test_medoid_matches_reference_rule(self):
        for n in (1, 2, 5, 17):
            d = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
            got = native.medoid_descriptor(d)
            dist = hamming_matrix_host(d, d)
            medians = np.sort(dist, axis=1)[:, int(0.5 * (n - 1))]
            assert got == int(np.argmin(medians))

    def test_radius_search_strict_circle(self):
        pts = rng.uniform(0, 100, (200, 2)).astype(np.float32)
        order = np.argsort(pts[:, 1])
        xs, ys = pts[order, 0], pts[order, 1]
        hits = native.radius_search(xs, ys, 50.0, 50.0, 15.0)
        want = np.where((xs - 50) ** 2 + (ys - 50) ** 2 < 225.0)[0]
        assert set(hits.tolist()) == set(want.tolist())

    def test_match_tracker_matches_numpy_twin(self):
        """native.match_tracker vs DescriptorTracker._match_to_prev_numpy on
        clustered keypoints (many inside the motion radius, descriptor ties
        likely at low bit distances)."""
        from slam_tpu.frontends.descriptor_tracker import DescriptorTracker

        tr = DescriptorTracker.__new__(DescriptorTracker)
        tr.match_threshold = 60
        tr.lowe_ratio = 0.9
        tr.max_motion_px = 12.0
        for trial in range(5):
            r = np.random.default_rng(100 + trial)
            n1, n2 = int(r.integers(1, 80)), int(r.integers(1, 80))
            pts2 = r.uniform(0, 60, (n2, 2)).astype(np.float32)
            pts1 = (pts2[r.integers(0, n2, n1)]
                    + r.normal(0, 8, (n1, 2))).astype(np.float32)
            base = r.integers(0, 2**32, (max(n1, n2), 8), dtype=np.uint32)
            d2 = base[:n2].copy()
            d1 = base[r.integers(0, n2, n1)].copy()
            # flip a few bits so distances are small but nonzero, with ties
            for i in range(n1):
                nbits = int(r.integers(0, 30))
                for _ in range(nbits):
                    w, b = int(r.integers(0, 8)), int(r.integers(0, 32))
                    d1[i, w] ^= np.uint32(1 << b)
            got = native.match_tracker(d1, pts1, d2, pts2,
                                       tr.max_motion_px, tr.match_threshold,
                                       tr.lowe_ratio)
            if got is None:
                pytest.skip("native library unavailable")
            want = tr._match_to_prev_numpy(d1, pts1, d2, pts2)
            assert np.array_equal(got, want), trial

    def test_random_array_unique_and_deterministic(self):
        a = native.create_random_array(8, 0, 20, seed=94235682)
        b = native.create_random_array(8, 0, 20, seed=94235682)
        assert np.array_equal(a, b)
        assert len(set(a.tolist())) == 8
        assert a.min() >= 0 and a.max() <= 20


class TestSim3Refinement:
    def test_refines_perturbed_transform(self):
        from slam_tpu.ops.sim3_opt import optimize_sim3_transform
        n = 40
        pts2 = rng.uniform([-1, -1, 3], [1, 1, 7], (n, 3))
        R_true = se3.so3_exp(np.array([0.05, 0.3, -0.04]))
        t_true = np.array([0.3, -0.1, 0.4])
        pts1 = pts2 @ R_true.T + t_true  # p1 = R12 p2 + t12
        obs1 = pts1[:, :2] / pts1[:, 2:3]
        obs2 = pts2[:, :2] / pts2[:, 2:3]
        # start from a perturbed guess
        R0 = se3.so3_exp(np.array([0.02, -0.03, 0.01])) @ R_true
        t0 = t_true + np.array([0.05, -0.04, 0.06])
        R, t, s = optimize_sim3_transform(
            R0, t0, 1.0, pts1, pts2, obs1, obs2,
            np.ones(n), np.ones(n), inlier_threshold=10.0, fix_scale=True)
        assert np.abs(R - R_true).max() < 5e-3
        assert np.linalg.norm(t - t_true) < 2e-2
        assert abs(s - 1.0) < 1e-6  # fix_scale

    def test_scale_estimation(self):
        from slam_tpu.ops.sim3_opt import optimize_sim3_transform
        n = 30
        pts2 = rng.uniform([-1, -1, 3], [1, 1, 7], (n, 3))
        s_true = 1.25
        pts1 = s_true * pts2 + np.array([0.1, 0.0, 0.2])
        obs1 = pts1[:, :2] / pts1[:, 2:3]
        obs2 = pts2[:, :2] / pts2[:, 2:3]
        R, t, s = optimize_sim3_transform(
            np.eye(3), np.array([0.08, 0.01, 0.15]), 1.1,
            pts1, pts2, obs1, obs2, np.ones(n), np.ones(n),
            inlier_threshold=10.0, fix_scale=False)
        assert abs(s - s_true) < 0.02


class TestBowRetrieval:
    def test_identical_frames_score_highest(self):
        from slam_tpu.ops.bow import BowIndex
        from slam_tpu.ids import CURRENT_MAP_ID, KfId
        from slam_tpu.map.keyframe import Keyframe
        from slam_tpu.map.mapdb import MapDB
        from slam_tpu.params import ParametersSlam

        index = BowIndex(ParametersSlam())
        db = MapDB()

        def make_kf(kf_id, desc):
            kf = Keyframe()
            kf.id = KfId(kf_id)
            kf.shared.descriptors = desc
            index.transform(kf.shared)
            return kf

        base = rng.integers(0, 2**32, (120, 8), dtype=np.uint32)
        kfs = [make_kf(0, base),
               make_kf(1, rng.integers(0, 2**32, (120, 8), dtype=np.uint32)),
               make_kf(2, rng.integers(0, 2**32, (120, 8), dtype=np.uint32))]
        for kf in kfs:
            index.add(kf, CURRENT_MAP_ID)
        query = make_kf(99, base.copy())  # identical appearance to kf 0
        sims = index.get_bow_similar(db, [], query)
        assert sims and int(sims[0].map_kf.kf_id) == 0
        assert sims[0].score > 0.99

    def test_remove_entry(self):
        from slam_tpu.ops.bow import BowIndex
        from slam_tpu.ids import CURRENT_MAP_ID, KfId
        from slam_tpu.map.mapdb import MapKf
        from slam_tpu.map.keyframe import Keyframe
        from slam_tpu.params import ParametersSlam
        index = BowIndex(ParametersSlam())
        kf = Keyframe()
        kf.id = KfId(5)
        kf.shared.descriptors = rng.integers(0, 2**32, (50, 8), dtype=np.uint32)
        index.transform(kf.shared)
        index.add(kf, CURRENT_MAP_ID)
        assert len(index) == 1
        index.remove(MapKf(CURRENT_MAP_ID, KfId(5)))
        assert len(index) == 0

    def test_vocabulary_path_loads_custom_codebook(self, tmp_path):
        """A non-empty vocabularyPath loads that vocabulary (reference:
        bow_index.cpp:12-28) and quantize() uses it consistently."""
        from slam_tpu.ops.bow import BowIndex, make_codebook, quantize
        from slam_tpu.params import ParametersSlam

        V = 1024
        vocab = rng.integers(0, 2**32, (V, 8), dtype=np.uint32)
        path = str(tmp_path / "custom_vocab.npz")
        np.savez(path, codebook=vocab)
        p = ParametersSlam(bowVocabularySize=V, vocabularyPath=path)
        index = BowIndex(p)
        assert np.array_equal(index.codebook, vocab)
        assert not np.array_equal(index.codebook, make_codebook(V))
        # exact-centroid descriptors quantize to their own word ids
        words = quantize(vocab[:16], index.codebook)
        assert np.array_equal(words, np.arange(16))
        # size mismatch is a loud failure, not silent truncation
        import pytest
        with pytest.raises(AssertionError):
            make_codebook(V // 2, path=path)

    def test_compaction_preserves_results(self):
        """Tombstoned rows must never surface, and the periodic postings
        compaction must not change retrieval results."""
        from slam_tpu.ops.bow import BowIndex
        from slam_tpu.ids import CURRENT_MAP_ID, KfId
        from slam_tpu.map.mapdb import MapDB, MapKf
        from slam_tpu.map.keyframe import Keyframe
        from slam_tpu.params import ParametersSlam

        index = BowIndex(ParametersSlam())
        db = MapDB()
        local = np.random.default_rng(3)

        def make_kf(kf_id, desc):
            kf = Keyframe()
            kf.id = KfId(kf_id)
            kf.shared.descriptors = desc
            index.transform(kf.shared)
            return kf

        kfs = [make_kf(i, local.integers(0, 2**32, (80, 8), dtype=np.uint32))
               for i in range(200)]
        for kf in kfs:
            index.add(kf, CURRENT_MAP_ID)
        query = make_kf(999, kfs[7].shared.descriptors.copy())
        before = index.get_bow_similar(db, [], query)
        assert before and int(before[0].map_kf.kf_id) == 7
        # remove >half the rows (keeping 7) to force compaction
        for i in range(200):
            if i != 7 and i % 4 != 0:
                index.remove(MapKf(CURRENT_MAP_ID, KfId(i)))
        assert len(index) == 51
        after = index.get_bow_similar(db, [], query)
        assert after and int(after[0].map_kf.kf_id) == 7
        assert abs(after[0].score - before[0].score) < 1e-12
        removed_ids = {int(s.map_kf.kf_id) for s in after}
        assert all(i == 7 or i % 4 == 0 for i in removed_ids)

    def test_loop_revisit_recall(self):
        """On a two-lap loop world the true revisit keyframe must appear in
        the returned candidates for >= 90% of second-lap queries (the recall
        contract loop closure depends on; reference: bow_index.cpp:95-176)."""
        from synthetic_world import make_world, visible_landmarks
        from slam_tpu.ops.bow import BowIndex
        from slam_tpu.ids import CURRENT_MAP_ID, KfId
        from slam_tpu.map.mapdb import MapDB
        from slam_tpu.map.keyframe import Keyframe
        from slam_tpu.params import ParametersSlam
        from slam_tpu.geometry import se3

        lap = 60
        world = make_world(n_frames=2 * lap, n_landmarks=800,
                           trajectory="loop", lap_frames=lap, seed=5)
        index = BowIndex(ParametersSlam())
        db = MapDB()

        def make_kf(i):
            vis, _ = visible_landmarks(world, i)
            kf = Keyframe()
            kf.id = KfId(i)
            kf.shared.descriptors = world.descriptors[vis]
            index.transform(kf.shared)
            return kf

        first_lap = [make_kf(i) for i in range(lap)]
        for kf in first_lap:
            index.add(kf, CURRENT_MAP_ID)
        centers = np.stack([se3.camera_center(world.poses_cw[i])
                            for i in range(2 * lap)])

        hits = total = 0
        for i in range(lap, 2 * lap):
            dists = np.linalg.norm(centers[:lap] - centers[i], axis=1)
            near = set(np.flatnonzero(dists < 0.75).tolist())
            if not near:
                continue
            total += 1
            got = {int(s.map_kf.kf_id)
                   for s in index.get_bow_similar(db, [], make_kf(i))}
            if got & near:
                hits += 1
        assert total >= 40, total
        recall = hits / total
        assert recall >= 0.9, f"revisit recall {recall:.2f} ({hits}/{total})"

    def test_retrieval_scales(self):
        """600 indexed keyframes, one query per insertion — the inverted
        index must stay O(postings-of-query) per query, nowhere near the
        former O(K^2) python scan (config-5 scale, loop_closer.cpp:149)."""
        import time
        from slam_tpu.ops.bow import BowIndex
        from slam_tpu.ids import CURRENT_MAP_ID, KfId
        from slam_tpu.map.mapdb import MapDB
        from slam_tpu.map.keyframe import Keyframe
        from slam_tpu.params import ParametersSlam

        index = BowIndex(ParametersSlam())
        db = MapDB()
        local = np.random.default_rng(9)
        t_query = 0.0
        for i in range(600):
            kf = Keyframe()
            kf.id = KfId(i)
            kf.shared.descriptors = local.integers(
                0, 2**32, (300, 8), dtype=np.uint32)
            index.transform(kf.shared)
            t0 = time.perf_counter()
            index.get_bow_similar(db, [], kf)
            t_query += time.perf_counter() - t0
            index.add(kf, CURRENT_MAP_ID)
        # generous bound for a noisy 1-core box; the old dense-scan path took
        # several seconds at this size
        assert t_query < 3.0, f"600 queries took {t_query:.2f}s"


class TestMultichipStep:
    def test_sharded_update_step_8_devices(self):
        import jax
        from slam_tpu.parallel.mesh import make_mesh, shard_batch
        from slam_tpu.parallel.multichip import build_update_step, make_key_banks
        from jax.sharding import NamedSharding, PartitionSpec as P

        # drop compiled programs accumulated by earlier test files: the
        # 8-device GSPMD compile is the suite's biggest, and running it on
        # top of a large in-process executable cache has produced
        # compiler-thread segfaults on this box
        jax.clear_caches()
        mesh = make_mesh(8, axis_names=("data", "hyp"))
        step = build_update_step(mesh, 96, 80, hypotheses=16, ba_capacity=16)
        images = rng.integers(0, 256, (8, 80, 96)).astype(np.float32)
        ke, ks = make_key_banks(8, 16)
        key_sh = NamedSharding(mesh, P("data", "hyp"))
        out = step(shard_batch(mesh, images),
                   jax.device_put(ke, key_sh), jax.device_put(ks, key_sh))
        jax.block_until_ready(out)
        costs = np.asarray(out.ba_cost)
        assert costs.shape == (8,) and np.isfinite(costs).all()
        assert np.asarray(out.keypoints).shape[0] == 8
        assert np.asarray(out.poses).shape == (8, 2, 4, 4)

    def test_uses_production_kernels(self):
        """Regression for round-1: the sharded step must dispatch the SAME
        kernels as the single-chip pipeline, not multichip-only twins."""
        import inspect
        from slam_tpu.parallel import multichip

        assert not hasattr(multichip, "_batched_pyramid")
        assert not hasattr(multichip, "tiny_ba_problem")
        src = inspect.getsource(multichip)
        for sym in ("_extract_impl", "hamming_matrix",
                    "_essential_ransac_core", "_sim3_ransac_core",
                    "recover_pose_from_E_jax", "ba._lm_run"):
            assert sym in src, f"production kernel {sym} not used"

    def test_pair_step_recovers_known_motion(self):
        """Render two views of a textured synthetic world and check the
        sharded step's chain recovers consistent geometry end to end."""
        import jax
        from slam_tpu.parallel.mesh import make_mesh, shard_batch
        from slam_tpu.parallel.multichip import build_update_step, make_key_banks
        from jax.sharding import NamedSharding, PartitionSpec as P

        # textured dot-field rendered at two nearby camera positions
        from synthetic_world import make_world, visible_landmarks
        world = make_world(n_frames=4, n_landmarks=300, seed=3,
                           trajectory="line")
        local_rng = np.random.default_rng(7)
        patches = local_rng.integers(40, 255, (300, 9, 9)).astype(np.uint8)
        w, h = world.camera.width, world.camera.height

        def render(i):
            img = np.full((h, w), 20, np.uint8)
            vis, pix = visible_landmarks(world, i, margin=6.0)
            for li in vis:
                x, y = int(round(pix[li, 0])), int(round(pix[li, 1]))
                y0, y1 = max(0, y - 4), min(h, y + 5)
                x0, x1 = max(0, x - 4), min(w, x + 5)
                img[y0:y1, x0:x1] = patches[li][:y1 - y0, :x1 - x0]
            return img

        mesh = make_mesh(8, axis_names=("data", "hyp"))
        step = build_update_step(mesh, w, h, hypotheses=32, ba_capacity=32,
                                 max_keypoints=200, camera=world.camera)
        images = np.stack([render(i % 4) for i in range(8)]).astype(np.float32)
        ke, ks = make_key_banks(8, 32, seed=1)
        key_sh = NamedSharding(mesh, P("data", "hyp"))
        out = step(shard_batch(mesh, images),
                   jax.device_put(ke, key_sh), jax.device_put(ks, key_sh))
        jax.block_until_ready(out)
        ess = np.asarray(out.essential_inliers)
        assert (ess >= 8).all(), ess  # real matches between real views
        assert np.isfinite(np.asarray(out.ba_cost)).all()


class TestPallasKernels:
    def test_hamming_argmin_interpret(self):
        from slam_tpu.ops.pallas_kernels import hamming_argmin
        d = rng.integers(0, 2**32, (200, 8), dtype=np.uint32)
        cb = rng.integers(0, 2**32, (1024, 8), dtype=np.uint32)
        best, idx = hamming_argmin(d, cb, interpret=True)
        dist = hamming_matrix_host(d, cb)
        assert np.array_equal(idx, np.argmin(dist, axis=1))
        assert np.array_equal(best, dist.min(axis=1))


class TestBatchSequences:
    def test_two_sequences_concurrently(self):
        from synthetic_world import (FakeOrbExtractor, TrackSimulator,
                                     make_mapper_input, make_world)
        from slam_tpu.parallel.batch import map_sequences
        from slam_tpu.params import Parameters, ParametersSlam
        from slam_tpu.pipeline.mapper_helpers import check_consistency

        worlds = [make_world(n_frames=10, n_landmarks=150, seed=s)
                  for s in (1, 2)]
        trackers = [TrackSimulator(w) for w in worlds]

        def inputs(i):
            return [make_mapper_input(worlds[i], f, trackers[i])
                    for f in range(10)]

        params = Parameters(slam=ParametersSlam(
            useFrontendSlam=False, minVisibleMapPointsInCurrentFrameBA=8,
            localBAProblemSize=12, adjacentSpaceSize=8))
        mappers = map_sequences(
            [inputs(0), inputs(1)], params,
            orb_extractor_factory=lambda i: FakeOrbExtractor(worlds[i], trackers[i]))
        assert len(mappers) == 2
        for m in mappers:
            assert len(m.map_db.keyframes) >= 3
            check_consistency(m.map_db)
        # sessions are fully independent maps
        assert mappers[0].map_db is not mappers[1].map_db


class TestRadiusHammingBest:
    def test_matches_pure_python(self):
        from slam_tpu import native
        if not native.available():
            import pytest
            pytest.skip("no native toolchain")
        from slam_tpu.map.feature_search import FeatureSearch
        r = np.random.default_rng(11)
        n, c = 300, 40
        pts = r.uniform(0, 400, (n, 2)).astype(np.float32)
        descs = r.integers(0, 2**32, (n, 8), dtype=np.uint32)
        octv = r.integers(0, 8, n).astype(np.int32)
        fs = FeatureSearch(pts)
        qx = r.uniform(0, 400, c).astype(np.float32)
        qy = r.uniform(0, 400, c).astype(np.float32)
        qr = r.uniform(5, 60, c).astype(np.float32)
        qd = r.integers(0, 2**32, (c, 8), dtype=np.uint32)
        lmin = r.integers(-1, 4, c).astype(np.int32)
        lmax = lmin + r.integers(0, 5, c).astype(np.int32)
        bi, bd = native.radius_hamming_best(
            fs._xs, fs._ys, fs._order.astype(np.int64), descs, octv,
            qx, qy, qr, qd, qlvl_min=lmin, qlvl_max=lmax)
        from slam_tpu.ops.hamming import hamming_matrix_host
        for q in range(c):
            idxs = fs.get_features_around(float(qx[q]), float(qy[q]), float(qr[q]))
            idxs = idxs[(octv[idxs] >= lmin[q]) & (octv[idxs] <= lmax[q])]
            if len(idxs) == 0:
                assert bi[q] == -1 and bd[q] == 256, q
                continue
            dd = hamming_matrix_host(qd[q][None], descs[idxs])[0]
            k = int(np.argmin(dd))
            assert bi[q] == idxs[k], q
            assert bd[q] == dd[k], q


class TestRefreshMapPoints:
    def test_batched_matches_scalar_loop(self):
        """The columnar refresh_map_points pass must reproduce the scalar
        update_descriptor + update_distance_and_norm loop on a real map."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from synthetic_world import (FakeOrbExtractor, TrackSimulator,
                                     make_mapper_input, make_world)
        from slam_tpu.map.map_point import MapPointStatus
        from slam_tpu.ids import MpId
        from slam_tpu.params import Parameters, ParametersSlam
        from slam_tpu.pipeline.mapper import Mapper
        from slam_tpu.pipeline import mapper_helpers as mh

        world = make_world(n_frames=12, n_landmarks=220, seed=5,
                           odom_noise=0.002)
        tracker = TrackSimulator(world)
        extractor = FakeOrbExtractor(world, tracker, pix_noise=0.3)
        mapper = Mapper(Parameters(slam=ParametersSlam(
            keyframeDecisionMinIntervalSeconds=0.0,
            minVisibleMapPointsInCurrentFrameBA=8,
            localBAProblemSize=12, adjacentSpaceSize=10,
            useFrontendSlam=False)), orb_extractor=extractor)
        for i in range(12):
            mapper.advance(make_mapper_input(world, i, tracker))

        map_db = mapper.map_db
        settings = mapper.settings
        min_obs = settings.parameters.slam.minObservationsForBA
        for kf in map_db.keyframes.values():
            db_scalar = map_db.copy()
            db_batched = map_db.copy()
            kf_s = db_scalar.keyframes[kf.id]
            kf_b = db_batched.keyframes[kf.id]
            # scalar semantics reference (the pre-batching loop)
            for mp_val in kf_s.map_points:
                if mp_val < 0:
                    continue
                mp = db_scalar.map_points[MpId(int(mp_val))]
                if mp.status in (MapPointStatus.NOT_TRIANGULATED,
                                 MapPointStatus.BAD):
                    continue
                mp.update_descriptor(db_scalar)
                mp.update_distance_and_norm(db_scalar, settings)
                mp.status = (MapPointStatus.TRIANGULATED
                             if len(mp.observations) >= min_obs
                             else MapPointStatus.UNSURE)
            mh.refresh_map_points(kf_b, db_batched, settings)
            for mp_id, mp_s in db_scalar.map_points.items():
                mp_b = db_batched.map_points[mp_id]
                assert np.array_equal(mp_s.descriptor, mp_b.descriptor), mp_id
                assert mp_s.status == mp_b.status, mp_id
                np.testing.assert_allclose(mp_s.norm, mp_b.norm, atol=1e-6)
                np.testing.assert_allclose(
                    [mp_s.min_viewing_distance, mp_s.max_viewing_distance],
                    [mp_b.min_viewing_distance, mp_b.max_viewing_distance],
                    rtol=1e-12)


class TestProjectGreedyClaim:
    def test_matches_python_twin_on_episode(self, monkeypatch):
        """The fused native searchByProjection loop must claim exactly the
        same (map point, keypoint) pairs as the Python fallback on a real
        episode's local-map matching calls."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from synthetic_world import (FakeOrbExtractor, TrackSimulator,
                                     make_mapper_input, make_world)
        from slam_tpu.params import Parameters, ParametersSlam
        from slam_tpu.pipeline.mapper import Mapper
        from slam_tpu.pipeline import matcher as pm

        def build_map():
            world = make_world(n_frames=14, n_landmarks=250, seed=3,
                               odom_noise=0.002)
            tracker = TrackSimulator(world)
            extractor = FakeOrbExtractor(world, tracker, pix_noise=0.3)
            mapper = Mapper(Parameters(slam=ParametersSlam(
                keyframeDecisionMinIntervalSeconds=0.0,
                minVisibleMapPointsInCurrentFrameBA=8,
                localBAProblemSize=12, adjacentSpaceSize=10,
                useFrontendSlam=False)), orb_extractor=extractor)
            for i in range(14):
                mapper.advance(make_mapper_input(world, i, tracker))
            return mapper

        def snapshot(mapper):
            return {int(mp_id): dict(mp.observations)
                    for mp_id, mp in mapper.map_db.map_points.items()}

        m_native = build_map()
        assert native.available()
        monkeypatch.setattr(native, "project_greedy_claim",
                            lambda *a, **k: None)
        m_python = build_map()
        assert snapshot(m_native) == snapshot(m_python)


class TestTriangulatePairs:
    """Native fused two-view triangulation vs its NumPy twin
    (`_batch_triangulate_pairs`)."""

    def _make_kf(self, cam, pose_cw, pts, depths, octaves):
        from slam_tpu.ids import KfId
        from slam_tpu.map.keyframe import Keyframe
        kf = Keyframe()
        kf.shared.camera = cam
        kf.shared.pts = np.asarray(pts, np.float32)
        kf.shared.octave = np.asarray(octaves, np.int32)
        rays, _ = cam.pixel_to_ray(kf.shared.pts)
        kf.shared.bearings = rays
        kf.keypoint_depth = np.asarray(depths, np.float32)
        kf.map_points = np.full(len(pts), -1, np.int64)
        kf.pose_cw = np.asarray(pose_cw, np.float64)
        return kf

    def _scene(self, cam, seed, n=120, seeded_frac=0.2):
        from slam_tpu.geometry import se3
        r = np.random.default_rng(seed)
        X = r.uniform([-2.5, -2.0, 3.0], [2.5, 2.0, 9.0], (n, 3))
        pose_cur = np.eye(4)
        pose_adj = np.eye(4)
        th = 0.12
        pose_adj[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)],
                                     [0, 1, 0],
                                     [-np.sin(th), 0, np.cos(th)]])
        pose_adj[:3, 3] = [0.6, 0.05, 0.1]

        def project(pose):
            pc = X @ pose[:3, :3].T + pose[:3, 3]
            pix, ok = cam.ray_to_pixel(pc)
            ok &= cam.is_valid_pixel(pix)
            return pix, pc[:, 2], ok

        pix_c, z_c, ok_c = project(pose_cur)
        pix_a, z_a, ok_a = project(pose_adj)
        keep = ok_c & ok_a
        pix_c, pix_a = pix_c[keep], pix_a[keep]
        z_a = z_a[keep]
        m = keep.sum()
        # pixel noise: most inliers, a few gross outliers to exercise the
        # reprojection gates; a slice of depth-seeded rows
        pix_c = pix_c + r.normal(0, 0.3, (m, 2))
        pix_a = pix_a + r.normal(0, 0.3, (m, 2))
        out = r.random(m) < 0.15
        pix_c[out] += r.uniform(15, 40, (out.sum(), 2))
        d_a = np.full(m, -1.0)
        sel = r.random(m) < seeded_frac
        d_a[sel] = z_a[sel] * r.uniform(0.97, 1.03, sel.sum())
        octv = r.integers(0, 8, m)
        kf_adj = self._make_kf(cam, pose_adj, np.clip(pix_a, 0, None),
                               d_a, octv)
        kf_cur = self._make_kf(cam, pose_cur, np.clip(pix_c, 0, None),
                               np.full(m, -1.0), r.integers(0, 8, m))
        return kf_cur, kf_adj, m

    @pytest.mark.parametrize("camkind", ["pinhole", "radtan", "kb"])
    def test_matches_numpy_twin(self, camkind):
        from slam_tpu.geometry.camera import (KannalaBrandtCamera,
                                              PinholeCamera)
        from slam_tpu.ids import KfId
        from slam_tpu.params import StaticSettings
        from slam_tpu.pipeline import mapper_helpers as mh

        if camkind == "pinhole":
            cam = PinholeCamera(fx=400.0, fy=405.0, cx=320.0, cy=240.0,
                                width=640, height=480)
        elif camkind == "radtan":
            cam = PinholeCamera(fx=458.6, fy=457.3, cx=367.2, cy=248.4,
                                width=752, height=480, k1=-0.28, k2=0.07,
                                p1=2e-4, p2=1.8e-5)
        else:
            cam = KannalaBrandtCamera(fx=380.0, fy=379.0, cx=376.0, cy=240.0,
                                      width=752, height=480, k1=-0.01,
                                      k2=0.02, k3=-0.005, k4=0.001)
        settings = StaticSettings()
        kf_cur, kf_adj, m = self._scene(cam, seed=42)
        kf_adj.id, kf_cur.id = KfId(1), KfId(2)
        matches = np.stack([np.arange(m), np.arange(m)], axis=1)

        pos_np, ok_np = mh._batch_triangulate_pairs(
            kf_cur, [(kf_adj, matches)], settings)

        assert native.available()
        p = settings.parameters.slam
        ref_scale = len(settings.scaleFactors) // 2
        sigma2_rel = (np.asarray(settings.levelSigmaSq, np.float64)
                      / settings.levelSigmaSq[ref_scale])
        res = native.triangulate_pairs(
            matches[:, 0], matches[:, 1],
            mh._tri_frame(kf_cur, native.pack_camera(cam)),
            mh._tri_frame(kf_adj, native.pack_camera(cam)),
            np.cos(np.radians(p.minTriangulationAngleTwoObs)), sigma2_rel,
            p.relativeReprojectionErrorThreshold, mh.CHI2_INV2D)
        assert res is not None
        pos_nat, ok_nat = res
        assert ok_np.sum() > 10  # the scene must actually exercise accepts
        assert (~ok_np).sum() > 3  # ... and rejects
        assert np.array_equal(ok_nat, ok_np)
        sel = ok_np
        assert np.allclose(pos_nat[sel], pos_np[sel], rtol=0, atol=1e-8)


class TestFusedCreatePairStage:
    """native.match_triangulate_pair must be in lockstep with its NumPy/
    composite twin (match_for_triangulation + triangulate_pairs), and the
    end-to-end map built through the fused path must equal the fallback
    path's bit for bit."""

    def test_fused_equals_composite(self):
        from synthetic_world import (FakeOrbExtractor, TrackSimulator,
                                     make_mapper_input, make_world)
        from slam_tpu import native
        from slam_tpu.ops.hamming import HAMMING_DIST_THR_LOW
        from slam_tpu.params import Parameters, ParametersSlam, StaticSettings
        from slam_tpu.pipeline import matcher
        from slam_tpu.pipeline.mapper import Mapper
        from slam_tpu.pipeline.mapper_helpers import CHI2_INV2D, _tri_frame

        if native.get_lib() is None:
            import pytest
            pytest.skip("native lib unavailable")

        world = make_world(n_frames=10, n_landmarks=300, seed=3)
        trk = TrackSimulator(world)
        p = Parameters(slam=ParametersSlam(
            keyframeDecisionMinIntervalSeconds=0.0,
            minVisibleMapPointsInCurrentFrameBA=8, localBAProblemSize=12,
            adjacentSpaceSize=8, useFrontendSlam=False))
        m = Mapper(p, orb_extractor=FakeOrbExtractor(world, trk))
        for i in range(10):
            m.advance(make_mapper_input(world, i, trk))
        settings = StaticSettings(p)
        params = p.slam
        kfs = sorted(m.map_db.keyframes)
        cur = m.map_db.keyframes[kfs[-1]]
        adj = m.map_db.keyframes[kfs[-2]]
        import numpy as np
        cos_min = np.cos(np.radians(params.minTriangulationAngleTwoObs))
        ref_scale = len(settings.scaleFactors) // 2
        sigma2_rel = (np.asarray(settings.levelSigmaSq, np.float64)
                      / settings.levelSigmaSq[ref_scale])
        cam_c = native.pack_camera(cur.shared.camera)
        cam_a = native.pack_camera(adj.shared.camera)
        cf = _tri_frame(cur, cam_c)
        af = _tri_frame(adj, cam_a)
        fused = native.match_triangulate_pair(
            (cur.shared.descriptors, cur.shared.groups,
             (cur.map_points < 0).astype(np.uint8),
             cur.shared.bearings, cur.shared.angle, cur.shared.octave),
            (adj.shared.descriptors, adj.shared.groups,
             (adj.map_points < 0).astype(np.uint8),
             adj.shared.bearings, adj.shared.angle),
            cf[0], af[0], np.asarray(settings.scaleFactors, np.float64),
            params.epipolarCheckThresholdDegrees, HAMMING_DIST_THR_LOW,
            cf, af, cos_min, sigma2_rel,
            params.relativeReprojectionErrorThreshold, CHI2_INV2D)
        assert fused is not None
        kpc, kpa, pos_f, ok_f = fused

        matches = matcher.match_for_triangulation(cur, adj, settings)
        assert np.array_equal(np.stack([kpc, kpa], axis=1)
                              if len(kpc) else np.zeros((0, 2), np.int64),
                              matches)
        if len(matches):
            pos_c, ok_c = native.triangulate_pairs(
                matches[:, 0], matches[:, 1], cf, af, cos_min, sigma2_rel,
                params.relativeReprojectionErrorThreshold, CHI2_INV2D)
            assert np.array_equal(ok_f, ok_c)
            np.testing.assert_array_equal(pos_f, pos_c)

    def test_e2e_map_identical_to_fallback(self, monkeypatch):
        from synthetic_world import (FakeOrbExtractor, TrackSimulator,
                                     make_mapper_input, make_world)
        from slam_tpu import native
        from slam_tpu.params import Parameters, ParametersSlam
        from slam_tpu.pipeline.mapper import Mapper
        import numpy as np

        def run(disable_fused):
            if disable_fused:
                monkeypatch.setattr(native, "match_triangulate_pair",
                                    lambda *a, **k: None)
            else:
                monkeypatch.undo()
            world = make_world(n_frames=12, n_landmarks=300, seed=5)
            trk = TrackSimulator(world)
            p = Parameters(slam=ParametersSlam(
                keyframeDecisionMinIntervalSeconds=0.0,
                minVisibleMapPointsInCurrentFrameBA=8,
                localBAProblemSize=12, adjacentSpaceSize=8,
                useFrontendSlam=False))
            m = Mapper(p, orb_extractor=FakeOrbExtractor(world, trk))
            for i in range(12):
                m.advance(make_mapper_input(world, i, trk))
            return m.map_db

        db_a = run(False)
        db_b = run(True)
        assert sorted(db_a.keyframes) == sorted(db_b.keyframes)
        assert sorted(db_a.map_points) == sorted(db_b.map_points)
        for k in db_a.keyframes:
            np.testing.assert_array_equal(db_a.keyframes[k].map_points,
                                          db_b.keyframes[k].map_points)
            np.testing.assert_array_equal(db_a.keyframes[k].pose_cw,
                                          db_b.keyframes[k].pose_cw)
        for mp_id in db_a.map_points:
            a, b = db_a.map_points[mp_id], db_b.map_points[mp_id]
            np.testing.assert_array_equal(a.position, b.position)
            assert a.observations == b.observations
