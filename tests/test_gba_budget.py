"""Adaptive GBA chunk budget (VERDICT r2 weak-5).

The post-loop GBA runs as bounded background slices; each slice returns
its final chi² sum and `_adapt_gba_budget` turns that into convergence
control: a converged solve cancels the remaining slices, a still-descending
solve on its last scheduled slice gets extended (bounded). The reference's
background GBA thread simply runs to its iteration cap
(``src/LoopClosing.cc:2286``) — chi² budgeting is the chunked analog of
"iterate until converged".
"""

import numpy as np

from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem


def make_sys():
    s = SlamSystem.__new__(SlamSystem)
    s._gba_chunks_left = 4
    s._gba_chunks_run = 0
    s._gba_prev_cost = None
    # map signature inputs (costs are only comparable on an unchanged map)
    s._map_gen = 0
    s.n_kf = 10
    s.stats = {"kf_inserted": 10, "kf_culled": 0, "kf_evicted": 0}
    return s


def feed(s, cost):
    s._gba_chunks_left -= 1
    s._gba_chunks_run += 1
    s._adapt_gba_budget(cost)


def test_converged_solve_stops_early():
    s = make_sys()
    feed(s, 100.0)
    assert s._gba_chunks_left == 3  # first chunk: no reference point yet
    feed(s, 99.99)  # relative improvement 1e-4 < tol
    assert s._gba_chunks_left == 0


def test_descending_solve_extends_but_bounded():
    s = make_sys()
    costs = [1000.0 * 0.8 ** i for i in range(20)]  # always improving 20%
    for c in costs:
        feed(s, c)
        if s._gba_chunks_left == 0:
            break
    assert s._gba_chunks_run > 4  # extended past the base budget
    assert s._gba_chunks_run <= SlamSystem._GBA_CHUNKS_MAX


def test_distributed_path_reports_no_cost():
    s = make_sys()
    for _ in range(4):
        feed(s, None)  # mesh GBA returns no scalar (avoids device sync)
    assert s._gba_chunks_left == 0  # fixed budget, no adaptation


def test_oscillating_cost_stops():
    s = make_sys()
    feed(s, 100.0)
    feed(s, 120.0)  # got worse: rel < tol -> stop
    assert s._gba_chunks_left == 0


def test_map_change_between_chunks_resets_comparison():
    """ADVICE r3 (medium): a keyframe inserted between two chunks changes
    the observation set — the chi² sums are not comparable, and the budget
    must neither fake convergence nor fake divergence from them."""
    s = make_sys()
    feed(s, 100.0)
    s.stats["kf_inserted"] += 1  # new KF raised the chi² sum
    s.n_kf += 1
    feed(s, 130.0)  # would read as "got worse: stop" without the signature
    assert s._gba_chunks_left == 2  # untouched: comparison restarted
    feed(s, 129.9)  # same map now: rel = 7.7e-4 < tol -> converged
    assert s._gba_chunks_left == 0
