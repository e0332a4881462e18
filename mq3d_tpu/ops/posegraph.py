"""Pose-graph optimization: Levenberg-Marquardt with line-process weights.

Re-design of Open3D's GlobalOptimization(LM) + GlobalOptimizationOption
(used by the reference at make_fragments.py:258-269 and
refine_fragment_poses.py:297-308): nodes are camera-to-world poses, edges
carry relative transforms T_e = X_target^-1 X_source with 6x6 information
matrices; uncertain (loop-closure) edges get Choi-Zhou-Koltun line-process
weights l_e so bad loops are automatically down-weighted, and edges whose
converged weight falls below edge_prune_threshold are pruned followed by a
re-optimization.

Residuals r_e = se3_log(X_t^-1 X_s T_e^-1) with left (world-frame)
perturbations; Jacobians come from jax.jacrev (exact, no small-angle
approximation), batched over edges with vmap.  The normal system is dense
(6N x 6N) — pose graphs here are O(10-100) nodes (fragments of 100 frames,
dozens of fragments), so one solve is microseconds on host.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mq3d_tpu.geometry import se3


@dataclass
class PoseGraphEdge:
    source_node_id: int
    target_node_id: int
    transformation: np.ndarray  # (4,4): X_t^-1 X_s at consistency
    information: np.ndarray = field(default_factory=lambda: np.eye(6))
    uncertain: bool = False
    confidence: float = 1.0


@dataclass
class PoseGraph:
    nodes: List[np.ndarray] = field(default_factory=list)  # (4,4) camera-to-world
    edges: List[PoseGraphEdge] = field(default_factory=list)


@dataclass
class GlobalOptimizationOption:
    max_correspondence_distance: float = 0.075
    edge_prune_threshold: float = 0.25
    preference_loop_closure: float = 1.0
    reference_node: int = 0


def _residual(xi_s, xi_t, X_s, X_t, T_inv):
    Xs = se3.se3_exp(xi_s) @ X_s
    Xt = se3.se3_exp(xi_t) @ X_t
    return se3.se3_log(se3.se3_inverse(Xt) @ Xs @ T_inv)


@partial(jax.jit, static_argnames=())
def _edge_terms(X_s, X_t, T_inv):
    """Batched residuals and Jacobians at xi = 0.

    X_s, X_t, T_inv: (E, 4, 4) float64.
    Returns r (E, 6), J_s (E, 6, 6), J_t (E, 6, 6).
    """
    zero = jnp.zeros((X_s.shape[0], 6), X_s.dtype)

    def one(xi_s, xi_t, xs, xt, tinv):
        r = _residual(xi_s, xi_t, xs, xt, tinv)
        Js = jax.jacrev(_residual, argnums=0)(xi_s, xi_t, xs, xt, tinv)
        Jt = jax.jacrev(_residual, argnums=1)(xi_s, xi_t, xs, xt, tinv)
        return r, Js, Jt

    return jax.vmap(one)(zero, zero, X_s, X_t, T_inv)


def _pad_edges(arrs, e_pad):
    return [np.concatenate([a, np.repeat(a[-1:], e_pad - len(a), axis=0)]) for a in arrs]


def _bucket(e: int) -> int:
    b = 16
    while b < e:
        b *= 2
    return b


def global_optimization(
    pose_graph: PoseGraph,
    option: Optional[GlobalOptimizationOption] = None,
    max_iteration: int = 100,
    rel_tol: float = 1e-9,
) -> PoseGraph:
    """In-place LM optimization of node poses (reference node fixed)."""
    option = option or GlobalOptimizationOption()
    n = len(pose_graph.nodes)
    if n == 0 or len(pose_graph.edges) == 0:
        return pose_graph

    X = np.stack([np.asarray(p, np.float64) for p in pose_graph.nodes])

    def run(edges, X):
        e = len(edges)
        if e == 0:
            return X, np.zeros(0)
        src = np.asarray([ed.source_node_id for ed in edges], np.int64)
        tgt = np.asarray([ed.target_node_id for ed in edges], np.int64)
        T_inv = np.stack(
            [np.linalg.inv(np.asarray(ed.transformation, np.float64)) for ed in edges]
        )
        Lam = np.stack([np.asarray(ed.information, np.float64) for ed in edges])
        unc = np.asarray([ed.uncertain for ed in edges], bool)

        e_pad = _bucket(e)
        valid = np.concatenate([np.ones(e), np.zeros(e_pad - e)])
        src_p, tgt_p, T_inv_p, Lam_p = _pad_edges([src, tgt, T_inv, Lam], e_pad)
        unc_p = np.concatenate([unc, np.zeros(e_pad - e, bool)])

        mu = option.preference_loop_closure
        weights = np.ones(e_pad) * valid

        def quad_at(Xc):
            r, _, _ = _edge_terms(
                jnp.asarray(Xc[src_p]), jnp.asarray(Xc[tgt_p]), jnp.asarray(T_inv_p)
            )
            r = np.asarray(r)
            return r, np.einsum("ei,eij,ej->e", r, Lam_p, r)

        def lm_inner(X, weights, iters):
            """LM to convergence with FIXED line-process weights."""
            lam_lm = 1e-6
            _, quad = quad_at(X)
            cost = float(np.sum(weights * quad))
            for _ in range(iters):
                r, Js, Jt = _edge_terms(
                    jnp.asarray(X[src_p]), jnp.asarray(X[tgt_p]), jnp.asarray(T_inv_p)
                )
                r, Js, Jt = np.asarray(r), np.asarray(Js), np.asarray(Jt)
                WL = Lam_p * weights[:, None, None]
                H = np.zeros((n, 6, n, 6))
                b = np.zeros((n, 6))
                Hss = np.einsum("eai,eab,ebj->eij", Js, WL, Js)
                Htt = np.einsum("eai,eab,ebj->eij", Jt, WL, Jt)
                Hst = np.einsum("eai,eab,ebj->eij", Js, WL, Jt)
                bs = np.einsum("eai,eab,eb->ei", Js, WL, r)
                bt = np.einsum("eai,eab,eb->ei", Jt, WL, r)
                np.add.at(H, (src_p, slice(None), src_p, slice(None)), Hss)
                np.add.at(H, (tgt_p, slice(None), tgt_p, slice(None)), Htt)
                np.add.at(H, (src_p, slice(None), tgt_p, slice(None)), Hst)
                np.add.at(H, (tgt_p, slice(None), src_p, slice(None)),
                          np.swapaxes(Hst, -1, -2))
                np.add.at(b, src_p, bs)
                np.add.at(b, tgt_p, bt)

                Hd = H.reshape(6 * n, 6 * n)
                bd = b.reshape(6 * n)
                ref = option.reference_node
                fix = np.arange(ref * 6, ref * 6 + 6)
                Hd[fix, :] = 0.0
                Hd[:, fix] = 0.0
                Hd[fix, fix] = 1.0
                bd[fix] = 0.0

                improved = False
                for _ in range(8):
                    Hlm = Hd + lam_lm * np.diag(np.maximum(np.diag(Hd), 1e-12))
                    try:
                        dx = np.linalg.solve(Hlm, -bd)
                    except np.linalg.LinAlgError:
                        lam_lm *= 10
                        continue
                    X_new = np.asarray(se3.se3_exp(dx.reshape(n, 6)) @ X)
                    _, quad2 = quad_at(X_new)
                    cost2 = float(np.sum(weights * quad2))
                    if np.isfinite(cost2) and cost2 < cost:
                        improved = True
                        lam_lm = max(lam_lm / 3, 1e-12)
                        X = X_new
                        new_cost = cost2
                        break
                    lam_lm *= 10
                if not improved:
                    break
                converged = abs(cost - new_cost) < rel_tol * max(cost, 1e-12)
                cost = new_cost
                if converged:
                    break
            return X, cost

        # Outer line-process rounds (Open3D: optimize, re-estimate l, repeat).
        n_outer = 5 if unc.any() else 1
        for _ in range(n_outer):
            X, _ = lm_inner(X, weights, max_iteration)
            _, quad = quad_at(X)
            w_line = np.where(unc_p, (mu / (mu + quad)) ** 2, 1.0)
            new_weights = w_line * valid
            if np.allclose(new_weights, weights, atol=1e-4):
                weights = new_weights
                break
            weights = new_weights

        return X, weights[:e]

    X, w_final = run(pose_graph.edges, X)

    # Edge pruning (uncertain edges with low converged line-process weight)
    # followed by a re-optimization — Open3D's CreatePoseGraphWithoutInvalidEdges.
    kept = [
        ed
        for ed, w in zip(pose_graph.edges, w_final)
        if not ed.uncertain or w >= option.edge_prune_threshold
    ]
    if len(kept) < len(pose_graph.edges):
        print(
            f"[Info] Pose graph pruning: dropped "
            f"{len(pose_graph.edges) - len(kept)} uncertain edge(s)"
        )
        X, _ = run(kept, X)
        pose_graph.edges = kept

    pose_graph.nodes = [X[i] for i in range(n)]
    return pose_graph
