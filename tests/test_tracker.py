"""Feature tracker + navigation front-end tests (reference:
src/legacy/BayesTracker.jl, NavigationSystem.jl behaviors).
"""

import numpy as np
import pytest

from rome_tpu.frontend import (
    FeatureTracker,
    LaserFeatures,
    adv_odo_by_rules,
    c2p,
    cart2pol,
    make_in_situ_system,
    p2c,
    p2c_pts_kde,
    pol2cart,
    pose_trig_and_add,
    ute_odom_easy,
)


def test_polar_cartesian_roundtrip():
    z = np.array([5.0, 0.7])
    u, R = p2c(z)
    np.testing.assert_allclose(u, [5 * np.cos(0.7), 5 * np.sin(0.7)], atol=1e-12)
    r, b = c2p(u)
    np.testing.assert_allclose([r, b], z, atol=1e-12)

    u2, P = pol2cart(z, [0.5, 0.03])
    br, P2 = cart2pol(u2, [0.1, 0.1])
    np.testing.assert_allclose(br, [0.7, 5.0], atol=1e-9)
    assert P.shape == (2, 2) and P2.shape == (2, 2)


def test_p2c_pts_kde_spread():
    kde = p2c_pts_kde([10.0, 0.0], [0.5, 0.02], N=200)
    pts = np.asarray(kde.points)
    np.testing.assert_allclose(pts.mean(axis=0), [10, 0], atol=0.3)
    # range noise dominates x spread; bearing noise shapes y
    assert pts[:, 0].std() > pts[:, 1].std()


@pytest.mark.slow
def test_tracker_propagate_and_update():
    tr = FeatureTracker.init_from(np.array([[10.0], [0.0]]))  # one feature ahead
    assert len(tr.trackers) == 1
    f0 = list(tr.trackers.values())[0]
    m0 = np.asarray(f0.bel.points).mean(axis=0)
    np.testing.assert_allclose(m0, [10, 0], atol=0.5)

    # robot moves 1 m forward: feature should appear 1 m closer in body frame
    tr.step([1.0, 0, 0], sightings=None, prop_noise=(1e-3, 1e-3, 1e-4))
    m1 = np.asarray(list(tr.trackers.values())[0].bel.points).mean(axis=0)
    np.testing.assert_allclose(m1, [9, 0], atol=0.5)
    assert list(tr.trackers.values())[0].lastzage == 1

    # a matching sighting at ~9 m snaps the belief and resets lastzage
    assoc = tr.step([0.0, 0, 0], sightings=np.array([[9.0], [0.0]]),
                    prop_noise=(1e-3, 1e-3, 1e-4))
    assert len(assoc) == 1
    f = tr.trackers[list(assoc)[0]]
    assert f.lastzage == 0
    np.testing.assert_allclose(
        np.asarray(f.bel.points).mean(axis=0), [9, 0], atol=0.5
    )


def test_tracker_new_features_and_discard():
    tr = FeatureTracker.init_from(np.array([[10.0], [0.0]]))
    # sighting far from any tracker spawns a new feature
    tr.step([0.0, 0, 0], sightings=np.array([[10.0], [np.pi / 2]]),
            prop_noise=(1e-3, 1e-3, 1e-4))
    assert len(tr.trackers) == 2
    # age out stale trackers
    tr.max_zage = 2
    for _ in range(4):
        tr.step([0.0, 0, 0], sightings=None, prop_noise=(1e-3, 1e-3, 1e-4))
    assert len(tr.trackers) == 0


def test_ute_odometry_and_pose_trigger():
    # straight driving at 2 m/s for 1 s
    x = ute_odom_easy([0, 0, 0], 2.0, 0.0, 1.0)
    np.testing.assert_allclose(x, [2, 0, 0], atol=1e-9)
    # steering left turns positive yaw
    x = ute_odom_easy([0, 0, 0], 2.0, 0.2, 1.0)
    assert x[2] > 0

    sys = make_in_situ_system(np.zeros(3), np.array([[10.0], [0.0]]))
    sys.x = np.array([25.0, 0, 0.0])
    assert pose_trig_and_add(sys, 1.0, 20.0, 30.0, np.pi / 3)
    assert sys.poseid == 2
    np.testing.assert_allclose(sys.x, 0.0)  # local frame reset
    np.testing.assert_allclose(sys.dOdo[2][:3], [25, 0, 0])
    assert sys.dOdo[2][4] == 1.0  # distance rule fired


@pytest.mark.slow
def test_adv_odo_by_rules_smoke():
    """Victoria-Park-style driver: DRS stream + laser features."""
    rng = np.random.default_rng(0)
    t = np.arange(1, 21) * 0.5
    DRS = np.stack([t, np.full_like(t, 4.0), np.zeros_like(t)], axis=1)
    lsr = {
        i + 1: LaserFeatures(float(tt), np.array([[15.0 - 2 * tt], [0.0]]))
        for i, tt in enumerate(t)
    }
    dOdo, FeatAssc = adv_odo_by_rules(DRS, lsr, distrule=10.0, timerule=1e6, trkfeats=True)
    assert len(dOdo) >= 2  # at least one triggered pose beyond the initial
    assert 1 in FeatAssc
