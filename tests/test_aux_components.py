"""3D stress rotation, DPCap gradients, free-surface Vy BC, pvtk, plotting.

Covers reference components: rotate_stress_particles! 3D
(stress_rotation_particles.jl:114-141), DruckerPragerCap gradients
(StressUpdate.jl:465-550), FreeSurface_Vy! (free_surface.jl:38-67),
save_pvtk (IO/VTK.jl), Makie plotting ext (quick-look panels).
"""

import os

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.ops.bc import free_surface_vy
from justrelax_tpu.ops.stress_rotation import (
    rotate_stress_particles_2d,
    rotate_stress_particles_3d,
)
from justrelax_tpu.rheology.plasticity import (
    DruckerPragerCap,
    PlasticParams,
    plastic_gradients,
    yield_function_cap,
)


def _pp(sinphi=0.5, sinpsi=0.1):
    one = jnp.asarray(1.0)
    return PlasticParams(
        is_pl=one > 0, pl_frac=one, C_cosphi=one * 0.866,
        sinphi=one * sinphi, cosphi=one * 0.866, sinpsi=one * sinpsi,
        eta_reg=one * 0.0, pT=one * 0.0, dq_shear=one,
    )


# --- 3D Euler-Rodrigues rotation -------------------------------------------
def test_rotation3d_reduces_to_2d():
    rng = np.random.default_rng(0)
    txx, tyy, txy = rng.normal(size=(3, 5))
    tzz = -(txx + tyy)
    w = rng.normal(size=5)
    dt = 0.3
    xx2, yy2, xy2 = rotate_stress_particles_2d(txx, tyy, txy, w, dt)
    xx3, yy3, zz3, yz3, xz3, xy3 = rotate_stress_particles_3d(
        txx, tyy, tzz, np.zeros(5), np.zeros(5), txy,
        np.zeros(5), np.zeros(5), w, dt,
    )
    np.testing.assert_allclose(np.asarray(xx3), xx2, atol=1e-12)
    np.testing.assert_allclose(np.asarray(yy3), yy2, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xy3), xy2, atol=1e-12)
    np.testing.assert_allclose(np.asarray(zz3), tzz, atol=1e-12)  # z decoupled
    np.testing.assert_allclose(np.asarray(yz3), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xz3), 0.0, atol=1e-12)


def test_rotation3d_preserves_invariants():
    rng = np.random.default_rng(1)
    t = rng.normal(size=(6, 7))  # xx yy zz yz xz xy
    w = rng.normal(size=(3, 7))
    out = rotate_stress_particles_3d(*t, *w, dt=0.7)
    out = np.stack([np.asarray(o) for o in out])

    def invariants(c):
        xx, yy, zz, yz, xz, xy = c
        tr = xx + yy + zz
        j2 = 0.5 * (xx**2 + yy**2 + zz**2) + yz**2 + xz**2 + xy**2
        return tr, j2

    tr0, j20 = invariants(t)
    tr1, j21 = invariants(out)
    np.testing.assert_allclose(tr1, tr0, atol=1e-12)
    np.testing.assert_allclose(j21, j20, rtol=1e-12)


def test_rotation3d_small_angle_is_jaumann():
    # dτ = dt·(Wτ − τW) to first order
    t = np.array([1.0, -0.3, -0.7, 0.2, -0.4, 0.6])
    w = np.array([0.3, -0.2, 0.5])  # ω_yz, ω_xz, ω_xy
    dt = 1.0e-7
    out = np.array([float(np.asarray(o)) for o in
                    rotate_stress_particles_3d(*t, *w, dt=dt)])
    W = np.array([
        [0.0, w[2], w[1]],
        [-w[2], 0.0, w[0]],
        [-w[1], -w[0], 0.0],
    ])
    # rotation vector (ω_yz, −ω_xz, ω_xy) ⇒ spin matrix W with W@a = w_vec×a
    wv = np.array([w[0], -w[1], w[2]])
    W = np.array([
        [0.0, -wv[2], wv[1]],
        [wv[2], 0.0, -wv[0]],
        [-wv[1], wv[0], 0.0],
    ])
    tau = np.array([
        [t[0], t[5], t[4]],
        [t[5], t[1], t[3]],
        [t[4], t[3], t[2]],
    ])
    dtau = dt * (W @ tau - tau @ W)
    expect = tau + dtau
    got = np.array([
        [out[0], out[5], out[4]],
        [out[5], out[1], out[3]],
        [out[4], out[3], out[2]],
    ])
    np.testing.assert_allclose(got, expect, atol=1e-12)


# --- DPCap gradients --------------------------------------------------------
def test_plastic_gradients_cone():
    pp = _pp()
    txx, tyy, txy = jnp.asarray(1.0), jnp.asarray(-1.0), jnp.asarray(0.5)
    tII = jnp.sqrt(0.5 * (txx**2 + tyy**2) + txy**2)
    (gxx, gyy, gxy), dQdP, dFdP = plastic_gradients(txx, tyy, txy, tII, jnp.asarray(2.0), pp)
    np.testing.assert_allclose(float(gxx), float(txx / (2 * tII)), rtol=1e-12)
    np.testing.assert_allclose(float(gxy), float(txy / (2 * tII)), rtol=1e-12)
    assert float(dQdP) == -0.1 and float(dFdP) == -0.5


def test_plastic_gradients_cap_branch():
    pp = _pp()
    cap = DruckerPragerCap(Pc=10.0, a=5.0, b=2.0)
    txx, tyy, txy = jnp.asarray(1.0), jnp.asarray(-1.0), jnp.asarray(0.5)
    tII = jnp.sqrt(0.5 * (txx**2 + tyy**2) + txy**2)

    # below the cap pressure: cone gradients
    _, dQdP, dFdP = plastic_gradients(txx, tyy, txy, tII, jnp.asarray(5.0), pp, cap=cap)
    assert float(dFdP) == -0.5

    # above: cap gradients, ∂F/∂P > 0 (compression closes the surface)
    P = jnp.asarray(14.0)
    (gxx, _, _), dQdP, dFdP = plastic_gradients(txx, tyy, txy, tII, P, pp, cap=cap)
    S = float(jnp.sqrt(((P - cap.Pc) / cap.a) ** 2 + (tII / cap.b) ** 2))
    np.testing.assert_allclose(float(dFdP), (14.0 - 10.0) / (cap.a**2 * S), rtol=1e-12)
    assert float(dFdP) > 0 and float(dQdP) == float(dFdP)  # associated on cap
    # gradients match autodiff of F_cap wrt (τxx, P)
    import jax

    def Fc(args):
        txx_, P_ = args
        tII_ = jnp.sqrt(0.5 * (txx_**2 + tyy**2) + txy**2)
        return yield_function_cap(pp, P_, tII_, cap)

    gF = jax.grad(Fc)((txx, P))
    # tensor convention halves the xx slot? no: normal slots are kept ⇒
    # dF/dτxx via chain rule = fac · ∂τII/∂τxx with ∂τII/∂τxx = τxx/(2τII)
    np.testing.assert_allclose(float(gxx), float(gF[0]), rtol=1e-10)
    np.testing.assert_allclose(float(dFdP), float(gF[1]), rtol=1e-10)


def test_yield_function_cap_continuous_at_corner():
    pp = _pp()
    # pick the cap so cone and cap agree at the transition pressure
    Pc = 0.5
    tII = jnp.asarray(1.5)
    F_cone_at_Pc = float(tII - pp.C_cosphi - Pc * pp.sinphi)
    # F_cap(Pc, τII) = τII/b − 1 ⇒ choose b so values match
    b = float(tII) / (1.0 + F_cone_at_Pc)
    cap = DruckerPragerCap(Pc=Pc, a=3.0, b=b)
    lo = float(yield_function_cap(pp, jnp.asarray(Pc - 1e-9), tII, cap))
    hi = float(yield_function_cap(pp, jnp.asarray(Pc + 1e-9), tII, cap))
    assert abs(lo - hi) < 1e-6


# --- free-surface Vy --------------------------------------------------------
def test_free_surface_vy_viscous_balance():
    # uniform extension: ∂Vx/∂x = ε̇, P = 0, elastic off ⇒ the surface row
    # relaxes toward Vy[top-1] + (ε̇/2)·dy  (σyy = 0 ⇒ ∂Vy/∂y = ... /3 ⇒ 3/2·(ε̇/3) = ε̇/2)
    nx, ny = 8, 6
    dx = dy = 0.5
    eps = 1.0e-3
    xv = np.arange(nx + 1) * dx
    Vx = np.broadcast_to((eps * xv)[:, None], (nx + 1, ny + 2)).copy()
    Vy = np.zeros((nx + 2, ny + 1))
    P = np.zeros(nx)
    tyy_o = np.zeros(nx)
    eta = np.ones(nx)
    out = free_surface_vy(
        jnp.asarray(Vx), jnp.asarray(Vy), jnp.asarray(P), jnp.asarray(P),
        jnp.asarray(tyy_o), jnp.asarray(eta), jnp.inf, 1 / dx, 1 / dy, nu=1.0,
    )
    np.testing.assert_allclose(
        np.asarray(out)[1:-1, -1], 0.5 * eps * dy, rtol=1e-12
    )
    # under-relaxed version moves 1% of the way
    out2 = free_surface_vy(
        jnp.asarray(Vx), jnp.asarray(Vy), jnp.asarray(P), jnp.asarray(P),
        jnp.asarray(tyy_o), jnp.asarray(eta), jnp.inf, 1 / dx, 1 / dy, nu=0.01,
    )
    np.testing.assert_allclose(
        np.asarray(out2)[1:-1, -1], 0.01 * 0.5 * eps * dy, rtol=1e-12
    )


# --- pvtk + plotting --------------------------------------------------------
def test_save_pvtk_roundtrip(tmp_path):
    from justrelax_tpu.io.vtk import save_pvtk
    from justrelax_tpu.parallel.decomp import Decomp2D

    geom = Geometry((8, 6), (2.0, 1.5), origin=(-1.0, 0.0))
    dec = Decomp2D.make((8, 6), (2, 3))
    A = np.arange(48, dtype=float).reshape(8, 6)
    path = save_pvtk(str(tmp_path / "out"), geom, dec, cell_data={"T": A})
    assert path.endswith(".pvti") and os.path.exists(path)
    txt = open(path).read()
    assert 'WholeExtent="0 8 0 6 0 0"' in txt
    assert txt.count("<Piece") == 6
    # every piece exists and its extent appears in the index
    for ix in range(2):
        for iy in range(3):
            piece = str(tmp_path / f"out_{ix}_{iy}.vti")
            assert os.path.exists(piece)
            ptxt = open(piece).read()
            ext = f'"{ix * 4} {(ix + 1) * 4} {iy * 2} {(iy + 1) * 2} 0 0"'
            assert ext in ptxt and ext in txt


def test_plotting_helpers(tmp_path):
    from justrelax_tpu.utils.plotting import (
        convergence_plot,
        heatmap,
        multipanel,
        velocity_quiver,
    )

    geom = Geometry((16, 12), (2.0, 1.5))
    A = np.random.default_rng(0).normal(size=(16, 12))
    assert os.path.exists(heatmap(A, geom, str(tmp_path / "h.png"), title="T"))
    assert os.path.exists(
        multipanel({"T": A, "eta": np.abs(A) + 1}, geom, str(tmp_path / "m.png"))
    )
    assert os.path.exists(
        convergence_plot([1.0, 0.1, 1e-3, np.nan], str(tmp_path / "c.png"), eps=1e-6)
    )
    assert os.path.exists(
        velocity_quiver(A, -A, geom, str(tmp_path / "q.png"), background=A)
    )
