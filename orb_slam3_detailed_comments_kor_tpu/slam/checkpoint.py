"""Map checkpoint / resume: save and restore the full SLAM state.

The reference left ``System::SaveMap/LoadMap`` as an explicit TODO
(``include/System.h:179-181``; Boost-serialization scaffolding was wired
but never used). With array-based state a snapshot is a dict of arrays:
MapState + InertialKF + the host scalars of the tracking state machine +
the loop-closer BoW database + shelved Atlas maps. Format: one ``.npz``.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.slam import map_state as msx

if TYPE_CHECKING:  # pragma: no cover
    from orb_slam3_detailed_comments_kor_tpu.slam.system import SlamSystem

#: v2: MapState gained kf_uvr (fisheye right-pixel rig observations) and
#: the BoW database became sparse (lc_bow_words/lc_bow_wts); fields missing
#: from older snapshots are defaulted on load instead of raising KeyError.
#: v3: shelved Atlas maps additionally carry their merge-plausibility
#: prior, inertial state (ikf/gravity), and the host keyframe-time /
#: tracking-quality mirrors; all optional on load (older snapshots get
#: None/defaults — the merge gate then skips, as for any unknown prior)
FORMAT_VERSION = 3

#: per-field defaults for fields added after a snapshot was written:
#: name -> callable(reference_field_of_same_name_from_live_system) -> array
_MS_FIELD_DEFAULTS = {
    "kf_uvr": lambda ref: -jnp.ones_like(ref),
}


def _pack_namedtuple(prefix: str, nt, out: dict) -> None:
    for name, arr in nt._asdict().items():
        out[f"{prefix}{name}"] = np.asarray(arr)


def _unpack_namedtuple(prefix: str, cls, z, like=None) -> object:
    fields = {}
    for name in cls._fields:
        key = f"{prefix}{name}"
        if key in z:
            fields[name] = jnp.asarray(z[key])
        elif like is not None and name in _MS_FIELD_DEFAULTS:
            fields[name] = _MS_FIELD_DEFAULTS[name](
                getattr(like, name)
            )
        else:
            raise KeyError(
                f"checkpoint missing field {key} and no default is known"
            )
    return cls(**fields)


def save_map(slam: "SlamSystem", path: str) -> None:
    """Snapshot the active map + tracking state to ``path`` (.npz)."""
    out: dict = {}
    _pack_namedtuple("ms_", slam.ms, out)
    meta = {
        "version": FORMAT_VERSION,
        "state": int(slam.state),
        "n_kf": int(slam.n_kf),
        "frames_since_kf": int(slam.frames_since_kf),
        "inliers_at_last_kf": int(slam.inliers_at_last_kf),
        "n_frames": int(slam.n_frames),
        "has_velocity": bool(slam.has_velocity),
        "is_inertial": bool(slam.cfg.is_inertial),
        "n_atlas_maps": len(slam.atlas_maps),
    }
    out["R_cw"] = np.asarray(slam.R_cw)
    out["t_cw"] = np.asarray(slam.t_cw)
    out["vel_R"] = np.asarray(slam.vel_R)
    out["vel_t"] = np.asarray(slam.vel_t)
    if slam.cfg.is_inertial:
        _pack_namedtuple("ikf_", slam.ikf, out)
        out["gravity"] = np.asarray(slam.gravity)
        out["frame_vel"] = np.asarray(slam.frame_vel)
        meta["imu_initialized"] = bool(slam.imu_initialized)
        meta["last_kf_time"] = (
            float(slam._last_kf_time)
            if slam._last_kf_time is not None else None
        )
        meta["last_frame_time"] = (
            float(slam._last_frame_time)
            if slam._last_frame_time is not None else None
        )
    lc = slam.loop_closer
    if lc.db_words is not None:
        out["lc_bow_words"] = np.asarray(lc.db_words)
        out["lc_bow_wts"] = np.asarray(lc.db_wts)
        meta["lc_n_loops_closed"] = lc.n_loops_closed
    # shelved Atlas maps (Atlas::CreateNewMap keeps old maps; Atlas.cc:58)
    for i, m in enumerate(slam.atlas_maps):
        _pack_namedtuple(f"atlas{i}_ms_", m["ms"], out)
        meta[f"atlas{i}_n_kf"] = int(m["n_kf"])
        meta[f"atlas{i}_traj_end"] = int(m["traj_end"])
        meta[f"atlas{i}_gen"] = int(m.get("gen", -1))
        lc_i = m.get("loop_closer")
        if lc_i is not None and lc_i.db_words is not None:
            out[f"atlas{i}_bow_words"] = np.asarray(lc_i.db_words)
            out[f"atlas{i}_bow_wts"] = np.asarray(lc_i.db_wts)
        mp = m.get("merge_prior")
        if mp is not None:
            meta[f"atlas{i}_merge_prior"] = [
                np.asarray(mp[0]).reshape(-1).tolist(),
                np.asarray(mp[1]).reshape(-1).tolist(),
                float(mp[2]) if len(mp) > 2 else 0.0,
                float(mp[3]) if len(mp) > 3 else 0.0,
            ]
        if "ikf" in m:
            _pack_namedtuple(f"atlas{i}_ikf_", m["ikf"], out)
            out[f"atlas{i}_gravity"] = np.asarray(m["gravity"])
            meta[f"atlas{i}_imu_initialized"] = bool(
                m.get("imu_initialized", False)
            )
        meta[f"atlas{i}_kf_times"] = [
            float(x) for x in m.get("kf_times", [])
        ]
        meta[f"atlas{i}_kf_lowq"] = [
            bool(x) for x in m.get("kf_lowq", [])
        ]
    meta["kf_times_host"] = [
        float(x) for x in getattr(slam, "_kf_times_host", [])
    ]
    meta["kf_lowq_host"] = [
        bool(x) for x in getattr(slam, "_kf_lowq_host", [])
    ]
    out["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **out)


def load_map(slam: "SlamSystem", path: str) -> None:
    """Restore a snapshot into an existing (same-config) SlamSystem."""
    from orb_slam3_detailed_comments_kor_tpu.slam import inertial
    from orb_slam3_detailed_comments_kor_tpu.slam.system import TrackingState

    z = np.load(path)
    meta = json.loads(bytes(z["meta_json"]).decode())
    if meta["version"] > FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} unsupported")
    ms = _unpack_namedtuple("ms_", msx.MapState, z, like=slam.ms)
    if ms.K != slam.ms.K or ms.N != slam.ms.N or ms.L != slam.ms.L:
        raise ValueError(
            f"capacity mismatch: checkpoint ({ms.K},{ms.N},{ms.L}) vs "
            f"system ({slam.ms.K},{slam.ms.N},{slam.ms.L})"
        )
    slam.ms = ms
    slam.state = meta["state"]
    slam.n_kf = meta["n_kf"]
    slam.frames_since_kf = meta["frames_since_kf"]
    slam.inliers_at_last_kf = meta["inliers_at_last_kf"]
    slam.n_frames = meta["n_frames"]
    slam.has_velocity = meta["has_velocity"]
    slam._kf_times_host = list(meta.get("kf_times_host", []))
    slam._kf_lowq_host = list(meta.get("kf_lowq_host", []))
    slam.R_cw = jnp.asarray(z["R_cw"])
    slam.t_cw = jnp.asarray(z["t_cw"])
    slam.vel_R = jnp.asarray(z["vel_R"])
    slam.vel_t = jnp.asarray(z["vel_t"])
    if meta["is_inertial"] and slam.cfg.is_inertial:
        slam.ikf = _unpack_namedtuple("ikf_", inertial.InertialKF, z)
        slam.gravity = jnp.asarray(z["gravity"])
        slam.frame_vel = jnp.asarray(z["frame_vel"])
        slam.imu_initialized = meta["imu_initialized"]
        slam._last_kf_time = meta["last_kf_time"]
        slam._last_frame_time = meta["last_frame_time"]
        slam._imu_buf = []
    if "lc_bow_words" in z and slam.loop_closer.db_words is not None:
        dbw = jnp.asarray(z["lc_bow_words"])
        if dbw.shape == slam.loop_closer.db_words.shape:
            slam.loop_closer.db_words = dbw
            slam.loop_closer.db_wts = jnp.asarray(z["lc_bow_wts"])
            slam.loop_closer.n_loops_closed = meta.get(
                "lc_n_loops_closed", 0
            )
    # v1 snapshots carried the dense [K, n_words] database; re-deriving the
    # sparse rows from it is lossless (top-k of each row)
    elif "lc_bow_db" in z and slam.loop_closer.db_words is not None:
        import jax as _jax
        from orb_slam3_detailed_comments_kor_tpu.models import (
            vocabulary as _v,
        )
        dense = jnp.asarray(z["lc_bow_db"])
        if dense.shape[0] == slam.loop_closer.db_words.shape[0]:
            wts, ids = _jax.lax.top_k(dense, _v.TOPW)
            slam.loop_closer.db_words = jnp.where(
                wts > 0, ids, -1
            ).astype(jnp.int32)
            slam.loop_closer.db_wts = wts
            slam.loop_closer.n_loops_closed = meta.get(
                "lc_n_loops_closed", 0
            )
    # shelved Atlas maps
    slam.atlas_maps = []
    for i in range(meta.get("n_atlas_maps", 0)):
        m = {
            "ms": _unpack_namedtuple(
                f"atlas{i}_ms_", msx.MapState, z, like=slam.ms
            ),
            "n_kf": meta[f"atlas{i}_n_kf"],
            "traj_end": meta[f"atlas{i}_traj_end"],
            "gen": meta.get(f"atlas{i}_gen", -1),
            "loop_closer": None,
        }
        mp = meta.get(f"atlas{i}_merge_prior")
        if mp is not None:
            m["merge_prior"] = (
                np.asarray(mp[0], np.float64).reshape(3, 3),
                np.asarray(mp[1], np.float64),
                float(mp[2]), float(mp[3]),
            )
        if f"atlas{i}_ikf_bg" in z:
            from orb_slam3_detailed_comments_kor_tpu.slam import (
                inertial as _inertial,
            )

            m["ikf"] = _unpack_namedtuple(
                f"atlas{i}_ikf_", _inertial.InertialKF, z
            )
            m["gravity"] = jnp.asarray(z[f"atlas{i}_gravity"])
            m["imu_initialized"] = meta.get(
                f"atlas{i}_imu_initialized", False
            )
        m["kf_times"] = list(meta.get(f"atlas{i}_kf_times", []))
        m["kf_lowq"] = list(meta.get(f"atlas{i}_kf_lowq", []))
        if f"atlas{i}_bow_words" in z or f"atlas{i}_bow_db" in z:
            from orb_slam3_detailed_comments_kor_tpu.models import (
                vocabulary as _voc,
            )
            from orb_slam3_detailed_comments_kor_tpu.slam.loop_closing import (
                LoopCloser,
            )

            cap = slam.cfg.capacity
            lc_i = LoopCloser(
                max_kf=cap.max_keyframes,
                vocab_k=cap.vocab_branching,
                vocab_depth=min(cap.vocab_depth, 3),
                vocab=_voc.load_default(),
            )
            if f"atlas{i}_bow_words" in z:
                lc_i.db_words = jnp.asarray(z[f"atlas{i}_bow_words"])
                lc_i.db_wts = jnp.asarray(z[f"atlas{i}_bow_wts"])
            else:
                import jax as _jax
                from orb_slam3_detailed_comments_kor_tpu.models import (
                    vocabulary as _v,
                )
                dense = jnp.asarray(z[f"atlas{i}_bow_db"])
                wts, ids = _jax.lax.top_k(dense, _v.TOPW)
                lc_i.db_words = jnp.where(wts > 0, ids, -1).astype(jnp.int32)
                lc_i.db_wts = wts
            m["loop_closer"] = lc_i
        slam.atlas_maps.append(m)
    # a loaded map has no pending deferred decision
    slam._pending_decision = None
