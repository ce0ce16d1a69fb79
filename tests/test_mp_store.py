"""Unit tests for the columnar map-point store (slam_tpu/map/mp_store.py).

The store mirrors live MapPoint attributes write-through; these tests pin the
registration lifecycle (adopt/release/row recycling), the write-through of
every mirrored attribute, the observation-count/first-kf maintenance hooks,
and the vectorized id->row translation the pipeline stages build on.
"""
import numpy as np

from slam_tpu.ids import KfId, KpId, MpId, TrackId
from slam_tpu.map.map_point import MapPoint, MapPointStatus
from slam_tpu.map.mapdb import MapDB


def _mk(mp_id, kf=1, kp=0):
    return MapPoint(MpId(mp_id), KfId(kf), KpId(kp))


class TestAdoption:
    def test_adopt_snapshots_state(self):
        db = MapDB()
        mp = _mk(0)
        mp.position = np.array([1.0, 2.0, 3.0])
        mp.status = MapPointStatus.TRIANGULATED
        mp.descriptor = np.arange(8, dtype=np.uint32)
        db.map_points[mp.id] = mp
        s = db.mp_store
        row = mp._row
        assert s.objs[row] is mp
        assert np.array_equal(s.position[row], [1.0, 2.0, 3.0])
        assert s.status[row] == int(MapPointStatus.TRIANGULATED)
        assert np.array_equal(s.descriptor[row], np.arange(8))
        assert s.n_obs[row] == 1
        assert s.first_kf[row] == 1

    def test_write_through_after_adoption(self):
        db = MapDB()
        mp = _mk(0)
        db.map_points[mp.id] = mp
        s = db.mp_store
        mp.position = np.array([4.0, 5.0, 6.0])
        mp.norm = np.array([0.0, 1.0, 0.0], np.float32)
        mp.min_viewing_distance = 0.5
        mp.max_viewing_distance = 9.5
        mp.status = MapPointStatus.UNSURE
        mp.descriptor = np.full(8, 7, np.uint32)
        row = mp._row
        assert np.array_equal(s.position[row], [4.0, 5.0, 6.0])
        assert np.array_equal(s.norm[row], [0.0, 1.0, 0.0])
        assert s.min_viewing_distance[row] == 0.5
        assert s.max_viewing_distance[row] == 9.5
        assert s.status[row] == int(MapPointStatus.UNSURE)
        assert np.all(s.descriptor[row] == 7)

    def test_release_and_row_recycling(self):
        db = MapDB()
        a, b = _mk(0), _mk(1)
        db.map_points[a.id] = a
        db.map_points[b.id] = b
        row_a = a._row
        del db.map_points[a.id]
        assert a._store is None and a._row == -1
        assert db.mp_store.id2row[0] == -1
        c = _mk(2)
        db.map_points[c.id] = c
        assert c._row == row_a  # freed row recycled
        # stale writes through the released object must be no-ops
        a.position = np.array([9.0, 9.0, 9.0])
        assert not np.array_equal(db.mp_store.position[row_a], [9.0, 9.0, 9.0])

    def test_observation_hooks(self):
        db = MapDB()
        mp = _mk(0, kf=5)
        db.map_points[mp.id] = mp
        s = db.mp_store
        row = mp._row
        mp.add_observation(KfId(3), KpId(1))
        assert s.n_obs[row] == 2 and s.first_kf[row] == 3
        mp.add_observation(KfId(7), KpId(2))
        assert s.n_obs[row] == 3 and s.first_kf[row] == 3
        mp.erase_observation(KfId(3))
        assert s.n_obs[row] == 2 and s.first_kf[row] == 5
        mp.set_observation(KfId(5), KpId(9))     # replace: count unchanged
        assert s.n_obs[row] == 2
        mp.set_observation(KfId(11), KpId(4))    # insert: count grows
        assert s.n_obs[row] == 3

    def test_growth_past_initial_capacity(self):
        db = MapDB()
        s = db.mp_store
        n = s.cap * 2 + 3
        for i in range(n):
            db.map_points[MpId(i)] = _mk(i)
        assert len(db.map_points) == n
        rows, live = s.rows_of(np.arange(n))
        assert live.all()
        assert len(np.unique(rows)) == n

    def test_rows_of_translation(self):
        db = MapDB()
        for i in (0, 2, 5):
            db.map_points[MpId(i)] = _mk(i)
        rows, live = db.mp_store.rows_of(np.array([-1, 0, 1, 2, 5, 99]))
        assert list(live) == [False, True, False, True, True, False]
        assert db.mp_store.objs[rows[1]].id == MpId(0)
        assert db.mp_store.objs[rows[3]].id == MpId(2)
        assert db.mp_store.objs[rows[4]].id == MpId(5)

    def test_unadopted_points_are_plain_objects(self):
        mp = _mk(0)
        mp.position = np.ones(3)
        mp.add_observation(KfId(9), KpId(0))
        assert mp._store is None  # no store interaction before adoption


class TestCovisibility:
    """The incremental pair counts (MpStore.covis) must track the
    observation links exactly; Keyframe.get_neighbors reads them instead of
    recounting every observation dict (keyframe.cpp:192-230 tally)."""

    @staticmethod
    def _recount(db):
        from collections import Counter
        out = {}
        for mp in db.map_points.values():
            keys = list(mp.observations)
            for i, a in enumerate(keys):
                for b in keys[i + 1:]:
                    out.setdefault(a, Counter())[b] += 1
                    out.setdefault(b, Counter())[a] += 1
        return out

    def _check(self, db):
        cached = {k: v for k, v in db.mp_store.covis.items() if v}
        assert cached == self._recount(db)

    def test_links_follow_observation_lifecycle(self):
        db = MapDB()
        a = _mk(0, kf=1)
        db.map_points[a.id] = a
        a.add_observation(KfId(2), KpId(1))
        a.add_observation(KfId(3), KpId(2))
        assert db.mp_store.covis[KfId(1)][KfId(2)] == 1
        assert db.mp_store.covis[KfId(2)][KfId(3)] == 1
        self._check(db)
        a.erase_observation(KfId(2))
        assert KfId(2) not in db.mp_store.covis.get(KfId(1), {})
        self._check(db)
        # set_observation: replace keeps counts, insert bumps them
        a.set_observation(KfId(3), KpId(9))
        self._check(db)
        a.set_observation(KfId(4), KpId(0))
        assert db.mp_store.covis[KfId(1)][KfId(4)] == 1
        self._check(db)

    def test_adopt_links_preexisting_observations(self):
        db = MapDB()
        mp = _mk(0, kf=1)
        mp.add_observation(KfId(2), KpId(1))   # before adoption: no store
        db.map_points[mp.id] = mp              # adopt links every pair
        assert db.mp_store.covis[KfId(1)][KfId(2)] == 1
        self._check(db)
        del db.map_points[mp.id]               # release drains the pairs
        assert not any(db.mp_store.covis.values())

    def test_counts_accumulate_across_points(self):
        db = MapDB()
        for i in range(3):
            mp = _mk(i, kf=1, kp=i)
            db.map_points[mp.id] = mp
            mp.add_observation(KfId(2), KpId(i))
        assert db.mp_store.covis[KfId(1)][KfId(2)] == 3
        db.map_points[MpId(0)].erase_observation(KfId(2))
        assert db.mp_store.covis[KfId(2)][KfId(1)] == 2
        self._check(db)
