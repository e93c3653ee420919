"""Online sensor-node runtime (io/online.py): topic queues + sync thread.

TPU-native analog of the reference ROS nodes
(``Examples/ROS/ORB_SLAM3/src/ros_stereo_inertial.cc`` — ImuGrabber /
ImageGrabber queues + ``SyncWithImu``). Feeds the same synthetic stereo
sequence through the queue front door from producer threads and checks the
node pairs/orders frames correctly and the system tracks.
"""

import threading

import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, SLAMConfig, TrackingConfig,
)
from orb_slam3_detailed_comments_kor_tpu.io import synthetic
from orb_slam3_detailed_comments_kor_tpu.io.online import ImageQueue, OnlineNode
from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem, TrackingState

H, W = 240, 376
FX, BASELINE = 230.0, 0.11
FPS = 20.0


def small_config() -> SLAMConfig:
    return SLAMConfig(
        camera=CameraConfig(
            width=W, height=H, fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0,
            bf=BASELINE * FX,
        ),
        orb=ORBConfig(n_features=600, cell_size=24),
        capacity=CapacityConfig(
            max_keyframes=16, max_landmarks=2048, max_local_landmarks=1024,
        ),
        tracking=TrackingConfig(max_frames_between_kf=8),
    )


def render_frames(n):
    params = jnp.array([FX, FX, W / 2.0, H / 2.0])
    scene = synthetic.default_scene()
    Rs, ts = synthetic.make_trajectory(n, motion="strafe", speed=0.03)
    out = []
    for i in range(n):
        il, ir, _ = synthetic.stereo_pair(
            params, jnp.asarray(Rs[i]), jnp.asarray(ts[i]), BASELINE, scene,
            h=H, w=W,
        )
        out.append((np.asarray(il), np.asarray(ir)))
    return out


class TestImageQueue:
    def test_fifo_and_drop(self):
        q = ImageQueue(max_queue=3)
        for i in range(5):
            q.push(i * 0.1, np.zeros(1))
        assert len(q) == 3 and q.n_dropped == 2
        assert q.front_time() == 0.2  # oldest two dropped
        assert q.pop()[0] == 0.2


class TestStereoNode:
    def test_tracks_from_producer_threads(self):
        n = 30
        frames = render_frames(n)
        slam = SlamSystem(small_config())
        node = OnlineNode(slam, mode="stereo", max_queue=n + 1).start()

        def feed_left():
            for i in range(n):
                node.publish_left(i / FPS, frames[i][0])

        def feed_right():
            for i in range(n):
                node.publish_right(i / FPS, frames[i][1])

        tl = threading.Thread(target=feed_left)
        tr = threading.Thread(target=feed_right)
        tl.start(); tr.start(); tl.join(); tr.join()
        node.stop(drain=True, timeout=600.0)  # first frames jit-compile
        assert node.n_processed == n
        assert slam.state == TrackingState.OK
        assert slam.n_kf >= 2

    def test_unmatched_frames_dropped(self):
        # right stream missing the first two frames: node must resync by
        # dropping the older unmatched left frames, not mispair them
        n = 12
        frames = render_frames(n)
        slam = SlamSystem(small_config())
        node = OnlineNode(slam, mode="stereo", max_queue=n + 1).start()
        for i in range(n):
            node.publish_left(i / FPS, frames[i][0])
            if i >= 2:
                node.publish_right(i / FPS, frames[i][1])
        node.stop(drain=True, timeout=600.0)
        assert node.n_processed == n - 2


class _StubSystem:
    """Records calls; isolates the node's queue/sync logic from SLAM."""

    def __init__(self):
        self.calls = []

    def track_stereo_inertial(self, img_l, img_r, t, imu_samples):
        self.calls.append((t, list(imu_samples)))


class TestStereoInertialNode:
    def test_waits_for_imu_window(self):
        """A frame is processed only after IMU newer than it arrives, and
        its IMU window contains exactly the samples up to the frame time
        (``ros_stereo_inertial.cc`` SyncWithImu gating)."""
        sys = _StubSystem()
        node = OnlineNode(sys, mode="stereo_inertial")
        img = np.zeros((4, 4), np.float32)
        # no IMU yet -> _step must refuse the frame
        node.publish_left(0.0, img)
        node.publish_right(0.0, img)
        assert node._step() is False
        node.publish_imu(-0.01, np.zeros(3), np.zeros(3))
        assert node._step() is False  # IMU still older than the image
        node.publish_imu(0.002, np.array([0, 9.81, 0.0]), np.zeros(3))
        assert node._step() is True
        assert node.n_processed == 1
        t, window = sys.calls[0]
        assert t == 0.0
        # window = samples <= frame time only; the 0.002 sample stays queued
        assert [s[0] for s in window] == [-0.01]
        assert node.imu.newest_time() == 0.002
