"""End-to-end dataset-driver test: synthetic EuRoC-layout sequence -> the
``examples/run_dataset.py`` main -> trajectory file + ATE.

This is the CI stand-in for the reference's dataset workflow
(``euroc_examples.sh`` -> ``evaluate_ate_scale.py``, SURVEY.md §4): render
a controllable sequence with exact ground truth, lay it out on disk exactly
like EuRoC MAV, and drive the whole stack through the public CLI.
"""

import os
import sys

import numpy as np
import pytest

from orb_slam3_detailed_comments_kor_tpu.io import synthetic

H, W, FX, BL = 240, 376, 230.0, 0.11

SETTINGS = f"""%YAML:1.0
Camera.type: "PinHole"
Camera.fx: {FX}
Camera.fy: {FX}
Camera.cx: {W / 2.0}
Camera.cy: {H / 2.0}
Camera.width: {W}
Camera.height: {H}
Camera.fps: 20.0
Camera.bf: {FX * BL}
ThDepth: 35.0
ORBextractor.nFeatures: 600
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import jax.numpy as jnp
    from PIL import Image

    root = tmp_path_factory.mktemp("synt_euroc")
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    n = 14
    Rs, ts = synthetic.make_trajectory(n, motion="strafe", speed=0.03)
    gt_rows = []
    for cam in ("cam0", "cam1"):
        (root / "mav0" / cam / "data").mkdir(parents=True)
    csv0, csv1 = ["#t,name"], ["#t,name"]
    for i in range(n):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BL, scene,
            h=H, w=W,
        )
        tn = 1000000000000000000 + i * 50_000_000
        name = f"{tn}.png"
        for cam, img in (("cam0", il), ("cam1", ir)):
            arr = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
            Image.fromarray(arr, mode="L").save(
                str(root / "mav0" / cam / "data" / name)
            )
        csv0.append(f"{tn},{name}")
        csv1.append(f"{tn},{name}")
        gt_rows.append(
            f"{tn},{ts[i][0]},{ts[i][1]},{ts[i][2]},1,0,0,0"
        )
    (root / "mav0" / "cam0" / "data.csv").write_text("\n".join(csv0))
    (root / "mav0" / "cam1" / "data.csv").write_text("\n".join(csv1))
    (root / "gt.csv").write_text("\n".join(gt_rows))
    (root / "settings.yaml").write_text(SETTINGS)
    return root


def test_stereo_euroc_cli(dataset, tmp_path, capsys):
    from examples import run_dataset

    out = str(tmp_path / "traj.csv")
    run_dataset.main([
        "--mode", "stereo", "--dataset", "euroc",
        "--seq", str(dataset),
        "--settings", str(dataset / "settings.yaml"),
        "--out", out,
        "--gt", str(dataset / "gt.csv"),
    ])
    txt = capsys.readouterr().out
    assert "ATE RMSE" in txt
    ate = float(txt.rsplit("ATE RMSE:", 1)[1].split("m")[0])
    assert ate < 0.05, f"ATE too high: {ate}"
    rows = np.loadtxt(out, delimiter=",")
    assert rows.shape[0] == 14 and rows.shape[1] == 8
