"""SPMD tracker: keyframe rows sharded across chips, psum'd reductions.

Each device owns an H/n_dev row block of the keyframe template (planes +
IC Jacobians). Per IRLS iteration it warps/samples its block against the
(replicated) current frame, builds partial Student-t sums and partial
J^T W J / J^T W r, and two tiny `lax.psum`s (a handful of floats over the
ICI) produce the global scale estimate and normal equations; the 6x6
Cholesky + exp-map update run replicated so every chip steps the same
pose. This is the scaling-book recipe applied to SLAM: shard the pixel
axis, let collectives carry only the reduced statistics.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..core import se3
from ..core.camera import Intrinsics
from ..ops.warp import bilinear_sample

try:  # jax>=0.6 moved shard_map out of experimental
    from jax import shard_map

    def _shard_map(f, mesh, in_specs, out_specs):
        return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm

    def _shard_map(f, mesh, in_specs, out_specs):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def _warp_block(xi, mask, T, intr: Intrinsics, v0):
    """warp_points for a row block whose first row is global row v0."""
    h, w = xi.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + v0
    z = 1.0 / jnp.maximum(xi, 1e-8)
    x = (u - intr.cx) * (1.0 / intr.fx) * z
    y = (v - intr.cy) * (1.0 / intr.fy) * z
    R, t = T[:3, :3], T[:3, 3]
    xp = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0]
    yp = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1]
    zp = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2]
    front = (zp > 1e-6).astype(jnp.float32)
    rho = 1.0 / jnp.maximum(zp, 1e-6)
    up = intr.fx * xp * rho + intr.cx
    vp = intr.fy * yp * rho + intr.cy
    return up, vp, rho, mask * front


class SpmdTracker:
    """Row-sharded single-level IRLS tracking step over a 1-D mesh.

    Usage:
        mesh = make_mesh(8, "sp")
        tr = SpmdTracker(mesh, intr_l, block_h=kf_h // 8)
        T = tr.track(kf_planes, jac, cur_planes, T_init, iters=10)

    Keyframe planes/Jacobians are sharded P("sp", None[, None]); the
    current frame is replicated (every chip samples anywhere in it).
    """

    def __init__(
        self,
        mesh: Mesh,
        intr_l: Intrinsics,
        nu: float = 5.0,
        damping: float = 1e-6,
    ):
        self.mesh = mesh
        self.intr_l = intr_l
        self.nu = nu
        self.damping = damping
        self.axis = mesh.axis_names[0]
        self._fn_cache = {}

    def _build(self, iters: int):
        axis = self.axis
        intr_l, nu, damping = self.intr_l, self.nu, self.damping
        n_shards = self.mesh.shape[axis]

        def step(kf_int, kf_xi, kf_mask, jac12, cur_int, cur_xi, cur_mask, T0):
            block_h = kf_int.shape[0]  # local rows per shard
            v0 = jax.lax.axis_index(axis).astype(jnp.float32) * block_h

            def body(_, carry):
                T, s2i, s2x = carry
                up, vp, rho, valid0 = _warp_block(kf_xi, kf_mask, T, intr_l, v0)
                i_s, ok_i = bilinear_sample(cur_int, None, up, vp)
                xi_s, ok_x = bilinear_sample(cur_xi, cur_mask, up, vp)
                valid = valid0 * ok_i * ok_x
                r_i = (i_s - kf_int) * valid
                r_x = (xi_s - rho) * valid

                # Global Student-t scale: psum the sufficient statistics.
                n_glob = jnp.maximum(jax.lax.psum(jnp.sum(valid), axis), 1.0)
                w_i0 = (nu + 1.0) / (nu + r_i * r_i / s2i)
                w_x0 = (nu + 1.0) / (nu + r_x * r_x / s2x)
                s2i_new = jnp.maximum(
                    jax.lax.psum(jnp.sum(valid * w_i0 * r_i * r_i), axis) / n_glob, 1e-12
                )
                s2x_new = jnp.maximum(
                    jax.lax.psum(jnp.sum(valid * w_x0 * r_x * r_x), axis) / n_glob, 1e-12
                )
                w_i = (nu + 1.0) / (nu + r_i * r_i / s2i_new) * valid / s2i_new
                w_x = (nu + 1.0) / (nu + r_x * r_x / s2x_new) * valid / s2x_new

                ji = jac12[:6].reshape(6, -1)
                jx = jac12[6:].reshape(6, -1)
                wi = w_i.reshape(-1) / n_glob
                wx = w_x.reshape(-1) / n_glob
                H_loc = (ji * wi[None, :]) @ ji.T + (jx * wx[None, :]) @ jx.T
                b_loc = ji @ (wi * r_i.reshape(-1)) + jx @ (wx * r_x.reshape(-1))
                # The only collectives on the critical path: 36 + 6 floats.
                H = jax.lax.psum(H_loc, axis)
                b = jax.lax.psum(b_loc, axis)

                Hd = H + damping * jnp.eye(6, dtype=H.dtype)
                delta = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Hd), b)
                ok = jnp.all(jnp.isfinite(delta))
                delta = jnp.where(ok, delta, jnp.zeros_like(delta))
                T_new = se3.orthonormalize(T @ se3.exp(-delta))
                return (T_new, s2i_new, s2x_new)

            T, s2i, s2x = jax.lax.fori_loop(
                0, iters, body, (T0, jnp.asarray(0.01, jnp.float32), jnp.asarray(0.0025, jnp.float32))
            )
            return T, s2i, s2x

        shard2 = P(self.axis, None)
        shard_jac = P(None, self.axis, None)  # (12, H, W): rows sharded
        rep = P()
        mapped = _shard_map(
            step,
            self.mesh,
            in_specs=(shard2, shard2, shard2, shard_jac, rep, rep, rep, rep),
            out_specs=(rep, rep, rep),
        )
        return jax.jit(mapped)

    def track(self, kf_int, kf_xi, kf_mask, jac12, cur_int, cur_xi, cur_mask, T0, iters: int):
        if iters not in self._fn_cache:
            self._fn_cache[iters] = self._build(iters)
        fn = self._fn_cache[iters]
        # Place the inputs with their shardings so jit doesn't resharded-copy.
        sh2 = NamedSharding(self.mesh, P(self.axis, None))
        sh_jac = NamedSharding(self.mesh, P(None, self.axis, None))
        rep = NamedSharding(self.mesh, P())
        put = jax.device_put
        return fn(
            put(kf_int, sh2), put(kf_xi, sh2), put(kf_mask, sh2),
            put(jac12, sh_jac),
            put(cur_int, rep), put(cur_xi, rep), put(cur_mask, rep),
            put(T0, rep),
        )
