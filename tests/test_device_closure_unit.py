"""Unit tests of the device-path correctLoop dispatch
(`device_vo._rebase_states`): creation-frame-gated rebase, per-slot
interpolated snapshot-pose smear, and the post-closure duplicate-landmark
merge/dedup (reference: loop_closer.cpp:405-591) — exercised on
hand-constructed states where every expected value is known exactly."""
import jax
import numpy as np
import pytest

from slam_tpu.geometry import se3
from slam_tpu.pipeline.device_vo import (DeviceVOConfig, VOState,
                                         _rebase_states, init_state)


def _np_state(cfg, batch=1, num_slots=16):
    base = init_state(cfg, num_slots=num_slots)
    host = jax.tree.map(np.asarray, base)
    return VOState(*[np.repeat(x[None], batch, axis=0).copy() for x in host])


def _desc(seed):
    return np.random.default_rng(seed).integers(
        0, 2 ** 32, 8, dtype=np.uint32)


CFG = DeviceVOConfig(width=160, height=120, lm_capacity=8, max_keypoints=32,
                     window=2, loop_every=1, loop_slots=4, loop_points=4)


def _setup_state():
    """One sequence, correction T = translate y by -0.1 (so world entities
    move by T^-1 = +0.1 in y), candidate frame 30."""
    st = _np_state(CFG)
    T = np.eye(4, dtype=np.float32)
    T[1, 3] = -0.1
    Tinv = np.linalg.inv(T)

    D0, D2, D3 = _desc(0), _desc(2), _desc(3)
    # lm 0: OLD (created before candidate) — must not move
    st.lm_valid[0, 0] = True
    st.lm_created[0, 0] = 2
    st.lm_pos[0, 0] = [0.0, 0.0, 5.0]
    st.lm_desc[0, 0] = D0
    st.lm_n_obs[0, 0] = 5
    st.lm_last_seen[0, 0] = 41
    # lm 1: NEW duplicate of lm 0 (post-rebase it lands 0.04 m away)
    st.lm_valid[0, 1] = True
    st.lm_created[0, 1] = 40
    st.lm_pos[0, 1] = [0.0, -0.06, 5.0]
    st.lm_desc[0, 1] = D0 ^ np.uint32(0b111)       # 3 bits apart
    st.lm_n_obs[0, 1] = 3
    st.lm_last_seen[0, 1] = 44
    # lm 2: NEW, no duplicate anywhere — must move by T^-1, stay valid
    st.lm_valid[0, 2] = True
    st.lm_created[0, 2] = 41
    st.lm_pos[0, 2] = [2.0, 0.0, 7.0]
    st.lm_desc[0, 2] = D2
    # lm 3: NEW duplicate of a SNAPSHOT point whose live landmark was
    # culled — must snap onto the snapshot's world position
    st.lm_valid[0, 3] = True
    st.lm_created[0, 3] = 42
    st.lm_pos[0, 3] = [-1.0, -0.08, 4.0]
    st.lm_desc[0, 3] = D3
    st.lm_anchor_origin[0, 3] = [0.0, 0.0, 0.0]

    # window observation stores: lm1 observed in col 0, lm0 in col 1
    st.wobs_valid[0, 1, 0] = True
    st.wobs_meas[0, 1, 0] = [0.25, -0.125]
    st.wobs_valid[0, 0, 1] = True
    st.wobs_meas[0, 0, 1] = [0.5, 0.25]

    # candidate snapshot in ring slot 2 (frame 30): one valid row holding
    # the world point lm 3 should land on, expressed in the snapshot camera
    W3 = np.array([-1.0, 0.0, 4.0])
    pose_c = np.eye(4, dtype=np.float32)
    pose_c[:3, 3] = [0.3, -0.2, 0.5]
    st.sig_pose[0, 2] = pose_c
    st.sig_frame[0, 2] = 30
    st.sig_pc[0, 2, 0] = W3 @ pose_c[:3, :3].T + pose_c[:3, 3]
    st.sig_desc[0, 2, 0] = D3 ^ np.uint32(0b11)
    st.sig_pvalid[0, 2, 0] = True
    # other ring rows: frames 10 (old), 44 (corrected region)
    st.sig_frame[0, 0] = 10
    st.sig_frame[0, 1] = 44
    st.sig_pose[0, 1] = np.eye(4, dtype=np.float32)

    st.pose_cw[0] = np.eye(4, dtype=np.float32)
    st.pose_cw[0][:3, 3] = [0.1, 0.2, 0.3]
    return st, T, Tinv, W3


def _run(st, T, merge, slot_T=None, slot_frame=None, cand_slot=2,
         apply=True):
    args = dict(merge_radius=0.3, merge=merge)
    out = _rebase_states(
        jax.tree.map(np.asarray, st), T[None].astype(np.float32),
        np.array([apply]), np.array([30], np.int32),
        np.array([cand_slot], np.int32),
        slot_T if slot_T is not None else None,
        slot_frame if slot_frame is not None else None, **args)
    return jax.tree.map(np.asarray, out)


class TestGatedRebase:
    def test_only_corrected_region_landmarks_move(self):
        st, T, Tinv, _ = _setup_state()
        out = _run(st, T, merge=False)
        # poses move by T (right-multiplied)
        np.testing.assert_allclose(out.pose_cw[0], st.pose_cw[0] @ T,
                                   atol=1e-6)
        # old landmark (created 2 <= 30) stays
        np.testing.assert_allclose(out.lm_pos[0, 0], st.lm_pos[0, 0],
                                   atol=1e-7)
        # new landmarks (created > 30) move by T^-1
        want = st.lm_pos[0, 2] @ Tinv[:3, :3].T + Tinv[:3, 3]
        np.testing.assert_allclose(out.lm_pos[0, 2], want, atol=1e-6)
        # nothing merged without the merge flag
        assert out.lm_valid[0, :4].all()

    def test_apply_false_is_identity(self):
        st, T, _, _ = _setup_state()
        out = _run(st, T, merge=True, apply=False)
        for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(
                jax.tree.map(np.asarray, st))):
            np.testing.assert_array_equal(a, b)

    def test_slot_pose_smear(self):
        """Ring slots use the host's interpolated matrices when the stored
        frame matches; rows the host did not know (overwritten in flight)
        fall back to the rigid frame>candidate predicate."""
        st, T, _, _ = _setup_state()
        half = np.eye(4, dtype=np.float32)
        half[1, 3] = -0.05                           # half the correction
        slot_T = np.broadcast_to(np.eye(4, dtype=np.float32),
                                 (1, 4, 4, 4)).copy()
        slot_frame = np.full((1, 4), -2, np.int32)
        slot_T[0, 1] = half
        slot_frame[0, 1] = 44                        # matches -> custom
        slot_T[0, 2] = np.eye(4)
        slot_frame[0, 2] = 29                        # MISMATCH (ring has 30)
        out = _run(st, T, merge=False, slot_T=slot_T, slot_frame=slot_frame)
        np.testing.assert_allclose(out.sig_pose[0, 1],
                                   st.sig_pose[0, 1] @ half, atol=1e-6)
        # mismatched row: rigid predicate — frame 30 > cf? no (30 == cf)
        # -> identity
        np.testing.assert_allclose(out.sig_pose[0, 2], st.sig_pose[0, 2],
                                   atol=1e-6)
        # unknown row with frame 10 <= cf: identity
        np.testing.assert_allclose(out.sig_pose[0, 0], st.sig_pose[0, 0],
                                   atol=1e-6)


class TestPostClosureMerge:
    def test_duplicate_merges_into_older_landmark(self):
        st, T, Tinv, _ = _setup_state()
        out = _run(st, T, merge=True)
        # the corrected-region duplicate is freed; the old slot survives
        assert not out.lm_valid[0, 1]
        assert out.lm_valid[0, 0]
        # observation counts combine, last_seen advances
        assert out.lm_n_obs[0, 0] == 5 + 3
        assert out.lm_last_seen[0, 0] == 44
        # kept position is the OLD landmark's (authoritative geometry)
        np.testing.assert_allclose(out.lm_pos[0, 0], st.lm_pos[0, 0],
                                   atol=1e-7)
        # window observations transfer into the kept slot
        assert out.wobs_valid[0, 0, 0] and out.wobs_valid[0, 0, 1]
        np.testing.assert_allclose(out.wobs_meas[0, 0, 0],
                                   st.wobs_meas[0, 1, 0], atol=1e-7)
        np.testing.assert_allclose(out.wobs_meas[0, 0, 1],
                                   st.wobs_meas[0, 0, 1], atol=1e-7)
        # the freed slot's observation rows are cleared
        assert not out.wobs_valid[0, 1].any()

    def test_snapshot_snap_for_culled_geometry(self):
        st, T, Tinv, W3 = _setup_state()
        out = _run(st, T, merge=True)
        # lm 3 has no live old twin; it snaps onto the candidate
        # snapshot's world point
        assert out.lm_valid[0, 3]
        np.testing.assert_allclose(out.lm_pos[0, 3], W3, atol=1e-5)
        # anchored parametrization re-derived around the snapped position
        ray = out.lm_pos[0, 3] - out.lm_anchor_origin[0, 3]
        np.testing.assert_allclose(out.lm_depth[0, 3], np.linalg.norm(ray),
                                   rtol=1e-5)
        # the unrelated landmark is untouched beyond the rigid move
        want2 = st.lm_pos[0, 2] @ Tinv[:3, :3].T + Tinv[:3, 3]
        np.testing.assert_allclose(out.lm_pos[0, 2], want2, atol=1e-6)
        assert out.lm_valid[0, 2]

    def test_merge_respects_radius_and_descriptor_gates(self):
        st, T, _, _ = _setup_state()
        # push the duplicate out of the 3D radius -> no merge
        st.lm_pos[0, 1] = [0.0, -0.06, 6.0]
        out = _run(st, T, merge=True)
        assert out.lm_valid[0, 1]
        assert out.lm_n_obs[0, 0] == 5
        # restore position but break the descriptor -> no merge
        st2, T2, _, _ = _setup_state()
        st2.lm_desc[0, 1] = _desc(99)
        out2 = _run(st2, T2, merge=True)
        assert out2.lm_valid[0, 1]


class TestRingOverwrittenRecovery:
    def test_try_close_rejects_stale_mirror_row(self):
        """A flagged candidate whose ring slot was overwritten between the
        in-scan retrieval and host consumption must be rejected cleanly
        (reason=ring_overwritten), not crash the consumer."""
        from slam_tpu.pipeline.device_slam import DeviceSlam, DeviceSlamParams

        cfg = DeviceVOConfig(width=160, height=120, lm_capacity=64,
                             max_keypoints=60, loop_every=2, loop_slots=4,
                             loop_words=64, loop_min_gap=4, loop_points=16)
        slam = DeviceSlam(cfg, batch=1,
                          params=DeviceSlamParams(min_loop_score=0.5))
        # mirror says slot holds frame 16, but the flagged candidate is the
        # overwritten frame 8 that mapped to the same slot
        slot = (8 // cfg.loop_every) % cfg.loop_slots
        slam._ring_frame[0, slot] = 16
        q = 22
        q_slot = (q // cfg.loop_every) % cfg.loop_slots
        slam._ring_frame[0, q_slot] = q
        ev = slam._try_close(0, q, 8, 0.95)
        assert not ev.accepted
        assert ev.reason == "ring_overwritten"
