"""StageTimer (REGISTER_TIMES analog) tests."""

import json
import time


def test_span_accumulation(tmp_path):
    from orb_slam3_detailed_comments_kor_tpu.utils.timing import StageTimer

    t = StageTimer(enabled=True)
    for _ in range(3):
        with t.span("a"):
            time.sleep(0.002)
            with t.span("b"):
                time.sleep(0.001)
    s = t.summary()
    assert s["a"]["count"] == 3
    assert s["a/b"]["count"] == 3
    assert s["a"]["mean_ms"] >= s["a/b"]["mean_ms"]
    p = str(tmp_path / "t.json")
    t.dump_json(p)
    loaded = json.load(open(p))
    assert set(loaded) == {"a", "a/b"}
    assert "a/b" in t.report()


def test_disabled_records_nothing():
    from orb_slam3_detailed_comments_kor_tpu.utils.timing import StageTimer

    t = StageTimer(enabled=False)
    with t.span("x"):
        pass
    assert t.summary() == {}


def test_keyframe_trajectory_and_verbose(tmp_path):
    """SaveKeyFrameTrajectory* + Verbose logger surface."""
    import numpy as np

    from orb_slam3_detailed_comments_kor_tpu.utils.verbose import Verbose

    Verbose.set_th_verbosity(Verbose.VERBOSITY_QUIET)
    Verbose.normal("hidden")  # must not raise
    import sys as _sys
    _sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_slam_e2e import run_sequence

    slam, _Rs, ts = run_sequence(30)
    for fmt in ("tum", "euroc", "kitti"):
        p = tmp_path / f"kf.{fmt}"
        slam.save_keyframe_trajectory(str(p), fmt)
        assert p.exists() and p.stat().st_size > 0
        p2 = tmp_path / f"fr.{fmt}"
        slam.save_trajectory(str(p2), fmt)
        assert p2.exists() and p2.stat().st_size > 0
    kts, kc, _ = slam.keyframe_trajectory_arrays()
    assert len(kts) == int(np.asarray(slam.ms.kf_valid).sum())
