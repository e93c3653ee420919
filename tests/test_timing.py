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
