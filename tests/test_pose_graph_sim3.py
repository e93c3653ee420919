"""Sim(3) and 4-DoF essential-graph optimizers (OptimizeEssentialGraph,
Optimizer.cc:2113; OptimizeEssentialGraph4DoF, Optimizer.cc:7523)."""

import jax.numpy as jnp
import numpy as np

from orb_slam3_detailed_comments_kor_tpu.optim import pose_graph
from orb_slam3_detailed_comments_kor_tpu.utils import lie


def circle_poses(K: int, radius: float = 2.0):
    """K camera poses looking inward on a circle (world→camera)."""
    Rs, ts = [], []
    for k in range(K):
        a = 2 * np.pi * k / K
        c = np.array([radius * np.cos(a), 0.0, radius * np.sin(a)])
        # camera z looks toward the origin
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_wc = np.stack([x, y, z], axis=1)
        R_cw = R_wc.T
        ts.append(-R_cw @ c)
        Rs.append(R_cw)
    return jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ts))


def sim3_rel(Ri, ti, si, Rj, tj, sj):
    Rji, tji, sji = lie.sim3_inverse(Rj, tj, sj)
    return lie.sim3_compose(Ri, ti, si, Rji, tji, sji)


class TestSim3Graph:
    def test_scale_drift_loop_correction(self):
        """Odometry chain with 1%-per-step scale drift + a drift-free loop
        edge: the Sim3 graph must spread the scale error over the loop
        (the monocular loop-closing scenario)."""
        K = 16
        R_gt, t_gt = circle_poses(K)
        s_gt = jnp.ones((K,))

        # corrupted states: accumulate scale drift along the chain
        drift = 1.012 ** np.arange(K)
        s0 = jnp.ones((K,))
        t0 = t_gt * jnp.asarray(drift)[:, None]
        R0 = R_gt

        # edges: consecutive TRUE relative sim3 (drift-free measurements)
        i_idx = jnp.arange(K - 1, dtype=jnp.int32)
        j_idx = jnp.arange(1, K, dtype=jnp.int32)
        Rm, tm, sm = sim3_rel(
            R_gt[i_idx], t_gt[i_idx], s_gt[i_idx],
            R_gt[j_idx], t_gt[j_idx], s_gt[j_idx],
        )
        # loop edge K-1 -> 0
        Rl, tl, sl = sim3_rel(
            R_gt[-1:], t_gt[-1:], s_gt[-1:], R_gt[:1], t_gt[:1], s_gt[:1]
        )
        edges = pose_graph.PoseGraphEdges(
            i=jnp.concatenate([i_idx, jnp.array([K - 1], jnp.int32)]),
            j=jnp.concatenate([j_idx, jnp.array([0], jnp.int32)]),
            R_meas=jnp.concatenate([Rm, Rl]),
            t_meas=jnp.concatenate([tm, tl]),
            s_meas=jnp.concatenate([sm, sl]),
            weight=jnp.ones((K,)),
            valid=jnp.ones((K,), bool),
        )
        fixed = jnp.zeros((K,), bool).at[0].set(True)
        R1, t1, s1 = pose_graph.optimize_pose_graph_sim3(
            R0, t0, s0, edges, fixed, iters=30
        )
        # camera centers after folding scale: c = -Rᵀ t / s
        c1 = -jnp.einsum("kji,kj->ki", R1, t1) / s1[:, None]
        c_gt = -jnp.einsum("kji,kj->ki", R_gt, t_gt)
        err = np.linalg.norm(np.asarray(c1 - c_gt), axis=1)
        assert err.max() < 0.05, err
        assert np.abs(np.asarray(s1) - 1.0).max() < 0.05

    def test_noop_at_optimum(self):
        K = 8
        R_gt, t_gt = circle_poses(K)
        s_gt = jnp.ones((K,))
        i_idx = jnp.arange(K - 1, dtype=jnp.int32)
        j_idx = jnp.arange(1, K, dtype=jnp.int32)
        Rm, tm, sm = sim3_rel(
            R_gt[i_idx], t_gt[i_idx], s_gt[i_idx],
            R_gt[j_idx], t_gt[j_idx], s_gt[j_idx],
        )
        edges = pose_graph.PoseGraphEdges(
            i=i_idx, j=j_idx, R_meas=Rm, t_meas=tm, s_meas=sm,
            weight=jnp.ones((K - 1,)), valid=jnp.ones((K - 1,), bool),
        )
        fixed = jnp.zeros((K,), bool).at[0].set(True)
        R1, t1, s1 = pose_graph.optimize_pose_graph_sim3(
            R_gt, t_gt, s_gt, edges, fixed, iters=10
        )
        assert np.allclose(np.asarray(t1), np.asarray(t_gt), atol=1e-4)
        assert np.allclose(np.asarray(s1), 1.0, atol=1e-4)


class Test4DoFGraph:
    def test_yaw_translation_correction(self):
        """Chain with accumulated yaw + translation drift and a loop edge:
        the 4-DoF graph must recover while leaving roll/pitch (gravity
        alignment) untouched — the inertial loop-closing invariant."""
        K = 16
        g_dir = jnp.array([0.0, 9.81, 0.0])
        R_gt, t_gt = circle_poses(K)

        # corrupt: growing yaw about gravity + translation drift
        rng = np.random.default_rng(1)
        R0, t0 = [], []
        for k in range(K):
            psi = 0.004 * k
            W = np.asarray(lie.so3_exp(jnp.asarray([0.0, psi, 0.0])))
            c = -np.asarray(R_gt[k]).T @ np.asarray(t_gt[k])
            c2 = W @ c + 0.01 * k * np.array([1.0, 0.0, 0.5])
            R2 = np.asarray(R_gt[k]) @ W.T
            R0.append(R2)
            t0.append(-R2 @ c2)
        R0 = jnp.asarray(np.stack(R0))
        t0 = jnp.asarray(np.stack(t0))

        i_idx = jnp.arange(K - 1, dtype=jnp.int32)
        j_idx = jnp.arange(1, K, dtype=jnp.int32)
        edges_chain = pose_graph.make_edges_from_poses(
            i_idx, j_idx, R_gt, t_gt
        )
        edges_loop = pose_graph.make_edges_from_poses(
            jnp.array([K - 1], jnp.int32), jnp.array([0], jnp.int32),
            R_gt, t_gt,
        )
        import jax

        edges = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b]), edges_chain, edges_loop
        )
        fixed = jnp.zeros((K,), bool).at[0].set(True)
        R1, t1 = pose_graph.optimize_pose_graph_4dof(
            R0, t0, g_dir, edges, fixed, iters=30
        )
        c1 = -jnp.einsum("kji,kj->ki", R1, t1)
        c_gt = -jnp.einsum("kji,kj->ki", R_gt, t_gt)
        err = np.linalg.norm(np.asarray(c1 - c_gt), axis=1)
        assert err.max() < 0.05, err

    def test_update_is_gravity_constrained(self):
        """A 4-DoF step can never change the gravity direction seen by a
        camera: R'·g must equal a yaw-rotated R·g, i.e. the angle between
        camera-frame gravity before/after is 0 for any yaw update."""
        K = 6
        g_dir = jnp.array([0.0, 9.81, 0.0])
        R_gt, t_gt = circle_poses(K)
        # corrupt ONLY roll (not correctable by 4-DoF)
        roll = lie.so3_exp(jnp.array([0.05, 0.0, 0.0]))
        R0 = jnp.einsum("kij,jl->kil", R_gt, roll.T)
        i_idx = jnp.arange(K - 1, dtype=jnp.int32)
        j_idx = jnp.arange(1, K, dtype=jnp.int32)
        edges = pose_graph.make_edges_from_poses(i_idx, j_idx, R_gt, t_gt)
        fixed = jnp.zeros((K,), bool).at[0].set(True)
        R1, t1 = pose_graph.optimize_pose_graph_4dof(
            R0, t0 := t_gt, g_dir, edges, fixed, iters=10
        )
        # camera-frame gravity direction must be untouched by the update
        g_before = jnp.einsum("kij,j->ki", R0, g_dir / 9.81)
        g_after = jnp.einsum("kij,j->ki", R1, g_dir / 9.81)
        cos = np.sum(np.asarray(g_before) * np.asarray(g_after), axis=1)
        assert cos.min() > 0.99999, cos
