"""VMEM-resident Pallas VEP chunk kernel (ops/pallas_stokes_vep.py):
interpret-mode equivalence with the XLA iteration and solve-level dispatch.

A single chunk iteration is bit-identical to the XLA path; over many
iterations the only divergence source is 1-ulp yield-branch flips at cells
sitting exactly on the yield surface (F ≈ 0), which stay bounded (~1e-7)
and converge to the same fixed point."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.models.shearband import _circle_phase_ratios
from justrelax_tpu.ops import stokes as kernels
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions, flow_bcs
from justrelax_tpu.ops.pallas_stokes_vep import stokes_vep_chunk_vmem
from justrelax_tpu.ops.stencil import maxloc
from justrelax_tpu.ops.stokes_vep import update_stresses_center_vertex
from justrelax_tpu.rheology.materials import (
    Material,
    MaterialStack,
    get_bulk_modulus,
    get_shear_modulus,
)
from justrelax_tpu.rheology.viscosity import (
    compute_viscosity_fields,
    phase_viscosity,
)


def _setup(n, dilation=10.0):
    ni = (n, n)
    geometry = Geometry(ni, (1.0, 1.0))
    xci, xvi = geometry.xci, geometry.xvi
    C = 1.6 / math.cos(math.radians(30.0))
    common = dict(rho0=0.0, Kb=5.0, eta0=1.0, is_plastic=1.0, C=C,
                  friction_angle=30.0, dilation_angle=dilation, eta_reg=1e-2)
    material = MaterialStack.make(
        [Material(G=1.0, **common), Material(G=0.5, **common)])
    pr_c = jnp.asarray(_circle_phase_ratios(xci[0], xci[1], (0.5, 0.5), 0.1))
    pr_v = jnp.asarray(_circle_phase_ratios(xvi[0], xvi[1], (0.5, 0.5), 0.1))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True))
    st = StokesState.make(ni)
    f = st.P.dtype
    xv = jnp.asarray(xvi[0], f)
    yv = jnp.asarray(xvi[1], f)
    Vx = jnp.broadcast_to(xv[:, None], (n + 1, n + 2))
    Vy = jnp.broadcast_to((-yv)[None, :], (n + 2, n + 1))
    Vx, Vy = flow_bcs((Vx, Vy), bc)
    pt = PTStokesCoeffs.make(geometry.li, geometry.di,
                             CFL=0.75 / math.sqrt(2.1))
    return ni, geometry, material, pr_c, pr_v, bc, st, Vx, Vy, pt


def _xla_loop(NIT, n, ni, geometry, material, pr_c, pr_v, bc, st, Vx0, Vy0,
              pt, tau_o, EII, rel_lambda, relax_v, cutoff, dt,
              T=None, T_v=None):
    inv_dx, inv_dy = 1.0 / geometry.di[0], 1.0 / geometry.di[1]
    r, theta_dtau, etadtau = pt.r, pt.theta_dtau, pt.etadtau
    K_c = get_bulk_modulus(material, pr_c)
    G_c = get_shear_modulus(material, pr_c)
    f = st.P.dtype
    txx_o, tyy_o, txy_c_o, txy_v_o = tau_o
    eta = phase_viscosity(material, jnp.ones(ni, f), None, pr_c, "tau") * 1.1
    eta_v = phase_viscosity(
        material, jnp.ones((n + 1, n + 1), f), None, pr_v, "tau") * 1.1
    s = dict(Vx=Vx0, Vy=Vy0, theta=st.P, P=st.P, txx=txx_o, tyy=tyy_o,
             txy_c=txy_c_o, txy_v=txy_v_o, eta=eta, eta_v=eta_v,
             lam=jnp.zeros(ni, f), lam_v=jnp.zeros((n + 1, n + 1), f))
    for _ in range(NIT):
        eta_tau = maxloc(s["eta"], window=1)
        grad_V = kernels.compute_grad_V(s["Vx"], s["Vy"], inv_dx, inv_dy)
        _, th = kernels.compute_P(
            s["theta"], st.P, grad_V, st.Q, eta_tau, K_c, G_c, dt, r,
            theta_dtau)
        exx, eyy, exy = kernels.compute_strain_rate(
            grad_V, s["Vx"], s["Vy"], inv_dx, inv_dy)
        res = update_stresses_center_vertex(
            exx, eyy, exy, s["txx"], s["tyy"], s["txy_c"], s["txy_v"],
            txx_o, tyy_o, txy_c_o, txy_v_o, th, s["eta"], s["lam"],
            s["lam_v"], EII, material, pr_c, pr_v, rel_lambda, dt,
            theta_dtau)
        etaN, etavN = compute_viscosity_fields(
            s["eta"], s["eta_v"], material, res.txx, res.tyy, res.txy_c,
            jnp.zeros_like(s["eta_v"]), jnp.zeros_like(s["eta_v"]),
            res.txy_v, pr_c, pr_v, T=T, T_v=T_v, mode="tau",
            relaxation=relax_v, cutoff=cutoff)
        Vxn, Vyn = kernels.compute_V(
            s["Vx"], s["Vy"], res.P_corrected, res.txx, res.tyy, res.txy_v,
            etadtau, jnp.zeros(ni, f), jnp.zeros(ni, f), eta_tau,
            inv_dx, inv_dy)
        Vxn, Vyn = flow_bcs((Vxn, Vyn), bc)
        s = dict(Vx=Vxn, Vy=Vyn, theta=th, P=res.P_corrected, txx=res.txx,
                 tyy=res.tyy, txy_c=res.txy_c, txy_v=res.txy_v, eta=etaN,
                 eta_v=etavN, lam=res.lam, lam_v=res.lam_v)
    return s, eta, eta_v


@pytest.mark.parametrize("NIT,tol", [(1, 1e-15), (40, 2e-6)])
def test_vep_chunk_matches_xla(NIT, tol):
    """One iteration matches to the ulp; 40 iterations with yield + dilation
    + viscosity continuation agree to the yield-branch-flip bound."""
    n = 24
    ni, geometry, material, pr_c, pr_v, bc, st, Vx0, Vy0, pt = _setup(n)
    f = st.P.dtype
    txx_o = jnp.full(ni, 1.6, f)
    tau_o = (txx_o, -txx_o, jnp.full(ni, 1.0, f),
             jnp.full((n + 1, n + 1), 1.0, f))
    EII = st.EII_pl + 0.001
    dt = 0.25
    cutoff = (1e-3, 1e3)
    s, eta0, etav0 = _xla_loop(
        NIT, n, ni, geometry, material, pr_c, pr_v, bc, st, Vx0, Vy0, pt,
        tau_o, EII, 0.2, 0.5, cutoff, dt)
    inv_dx, inv_dy = 1.0 / geometry.di[0], 1.0 / geometry.di[1]
    out = stokes_vep_chunk_vmem(
        Vx0, Vy0, st.P, st.P, tau_o[0], tau_o[1], tau_o[2], tau_o[3],
        eta0, etav0, jnp.zeros(ni, f), jnp.zeros((n + 1, n + 1), f),
        st.P, st.Q, *tau_o, EII, material, pr_c, pr_v, None,
        dt, inv_dx, inv_dy, pt.r, pt.theta_dtau, pt.etadtau,
        0.2, 0.5, cutoff, nout=NIT, interpret=True)
    names = ["Vx", "Vy", "theta", "P", "txx", "tyy", "txy_c", "txy_v",
             "eta", "eta_v", "lam", "lam_v"]
    # plasticity must actually be active for this to mean anything
    assert float(s["lam"].max()) > 0.1
    for nm, a in zip(names, out):
        d = float(jnp.abs(a - s[nm]).max())
        assert d <= tol, f"{nm}: {d} > {tol}"


@pytest.mark.slow
def test_solve_vep_use_pallas_dispatch():
    """solve_vep(use_pallas=True) reproduces the XLA solve on the shearband
    configuration (interpret mode on CPU)."""
    from justrelax_tpu.models.shearband import run as shearband_run
    from justrelax_tpu.solvers.stokes2d_vep import solve_vep

    n = 24
    ni, geometry, material, pr_c, pr_v, bc, st, Vx0, Vy0, pt = _setup(
        n, dilation=0.0)
    st = st.replace(V=st.V.replace(Vx=Vx0, Vy=Vy0))
    kw = dict(iter_max=2000, iter_min=200, nout=100)
    s_ref, info_ref = solve_vep(
        st, pt, geometry, bc, material, pr_c, pr_v, 0.25, **kw)
    s_pal, info_pal = solve_vep(
        st, pt, geometry, bc, material, pr_c, pr_v, 0.25,
        use_pallas=True, **kw)
    assert int(info_pal.iters) == int(info_ref.iters)
    np.testing.assert_allclose(
        np.asarray(s_pal.tau.II), np.asarray(s_ref.tau.II), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(s_pal.P), np.asarray(s_ref.P), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(s_pal.V.Vx), np.asarray(s_ref.V.Vx), atol=2e-6)


@pytest.mark.slow
def test_solve_vep_use_pallas_dispatch_powerlaw_noslip():
    """solve_vep(use_pallas=True) reproduces the XLA solve with both new
    chunk capabilities active at once: no-slip top/bot walls and the
    collapsed power-law creep table with a T field.

    This configuration's PT iteration is physically divergent (the residual
    grows), so ulp-level path differences amplify ~100× per 200 iterations —
    the assertion window stops at 400 iterations where genuine path
    equivalence (1e-11 observed) is still distinguishable from a wrong
    kernel (1e-3+). Chunk-level equivalence of the same combination is
    pinned tightly in test_vep_chunk_matches_xla_{noslip,powerlaw}."""
    from justrelax_tpu.solvers.stokes2d_vep import solve_vep

    n = 24
    ni, geometry, _, pr_c, pr_v, _, st, Vx0, Vy0, pt = _setup(
        n, dilation=0.0)
    material = _powerlaw_material(dilation=0.0)
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True),
        no_slip=Faces(top=True, bot=True))
    Vx0, Vy0 = flow_bcs((Vx0, Vy0), bc)
    st = st.replace(V=st.V.replace(Vx=Vx0, Vy=Vy0))
    f = st.P.dtype
    xc = jnp.asarray(geometry.xci[0], f)
    T = 300.0 + 50.0 * jnp.sin(
        2.0 * jnp.pi * xc[:, None]) * jnp.ones((1, n), f)
    kw = dict(iter_max=400, iter_min=400, nout=100)
    s_ref, info_ref = solve_vep(
        st, pt, geometry, bc, material, pr_c, pr_v, 0.25, T=T, **kw)
    s_pal, info_pal = solve_vep(
        st, pt, geometry, bc, material, pr_c, pr_v, 0.25, T=T,
        use_pallas=True, **kw)
    assert int(info_pal.iters) == int(info_ref.iters)
    np.testing.assert_allclose(
        np.asarray(s_pal.tau.II), np.asarray(s_ref.tau.II), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(s_pal.P), np.asarray(s_ref.P), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(s_pal.V.Vx), np.asarray(s_ref.V.Vx), atol=1e-9)


@pytest.mark.slow
def test_solve_vep_use_pallas_buoyancy_rho_T():
    """solve_vep(use_pallas=True) reproduces the XLA solve with a
    temperature-dependent density ρ(T) = ρ0·(1 − α(T − T0)) driving the
    flow — the Blankenbach-class coupled-application configuration. T is
    frozen during a Stokes solve, so the XLA path's per-iteration
    ρ(T)·g refresh (reference update_ρg!, Stokes2D.jl:678) equals the
    chunk's one buoyancy canvas exactly; convergence parity follows."""
    from justrelax_tpu.solvers.stokes2d_vep import solve_vep

    n = 24
    ni = (n, n)
    geometry = Geometry(ni, (1.0, 1.0), origin=(0.0, -1.0))
    # Kb=inf like the Blankenbach material: with dt=inf a finite Kb makes
    # K*dt = inf and the dilatancy correction inf*0 = NaN on both paths
    material = Material(rho0=1.0, T0=0.0, alpha=0.5, beta=0.0,
                        G=1.0, eta0=1.0, gravity=1.0)
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True))
    st = StokesState.make(ni)
    f = st.P.dtype
    xc = jnp.asarray(geometry.xci[0], f)
    yc = jnp.asarray(geometry.xci[1], f)
    # hot blob → buoyant rise, the Blankenbach driving pattern
    T = jnp.exp(-(((xc[:, None] - 0.5) ** 2 + (yc[None, :] + 0.6) ** 2)
                  / 0.02))
    st = st.replace(viscosity=st.viscosity.replace(
        eta=jnp.ones(ni, f), eta_v=jnp.ones((n + 1, n + 1), f)))
    pt = PTStokesCoeffs.make(geometry.li, geometry.di,
                             CFL=0.9 / math.sqrt(2.1))
    kw = dict(iter_max=2000, iter_min=200, nout=100)
    s_ref, info_ref = solve_vep(
        st, pt, geometry, bc, material, None, None, jnp.inf, T=T, **kw)
    s_pal, info_pal = solve_vep(
        st, pt, geometry, bc, material, None, None, jnp.inf, T=T,
        use_pallas=True, **kw)
    # the flow must actually be driven by ρ(T)·g
    assert float(jnp.abs(s_ref.V.Vy).max()) > 1e-6
    assert int(info_pal.iters) == int(info_ref.iters)
    np.testing.assert_allclose(
        np.asarray(s_pal.V.Vy), np.asarray(s_ref.V.Vy), atol=2e-9)
    np.testing.assert_allclose(
        np.asarray(s_pal.P), np.asarray(s_ref.P), atol=2e-9)


def test_vep_chunk_dispatch_guards():
    """Unsupported configurations raise instead of silently degrading."""
    from justrelax_tpu.solvers.stokes2d_vep import solve_vep

    n = 16
    ni, geometry, material, pr_c, pr_v, bc, st, Vx0, Vy0, pt = _setup(n)
    # a face with neither free-slip nor no-slip
    bad_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True))
    with pytest.raises(ValueError):
        solve_vep(st, pt, geometry, bad_bc, material, pr_c, pr_v, 0.25,
                  use_pallas=True, iter_max=100, nout=50)
    # pressure-dependent density (beta != 0) still falls back: the chunk's
    # buoyancy canvas is solve-invariant, ρ(P) is not
    beta_mat = MaterialStack.make([
        Material(G=1.0, rho0=1.0, beta=0.1, Kb=5.0, eta0=1.0),
        Material(G=0.5, rho0=1.0, beta=0.1, Kb=5.0, eta0=1.0)])
    with pytest.raises(ValueError):
        solve_vep(st, pt, geometry, bc, beta_mat, pr_c, pr_v, 0.25,
                  use_pallas=True, iter_max=100, nout=50)
    # a creep table that does not collapse (Peierls mechanism)
    C = 1.6 / math.cos(math.radians(30.0))
    common = dict(rho0=0.0, Kb=5.0, is_plastic=1.0, C=C,
                  friction_angle=30.0, dilation_angle=10.0, eta_reg=1e-2)
    bad_mat = MaterialStack.make([
        Material(G=1.0, peierls_A=1.0, peierls_n=2.0, peierls_E=1e3,
                 peierls_tauP=10.0, **common),
        Material(G=0.5, eta0=1.0, **common)])
    with pytest.raises(ValueError):
        solve_vep(st, pt, geometry, bc, bad_mat, pr_c, pr_v, 0.25,
                  use_pallas=True, iter_max=100, nout=50)
    # mixed dislocation exponents do not collapse either
    mixed = MaterialStack.make([
        Material(G=1.0, disl_A=0.5, disl_n=3.0, **common),
        Material(G=0.5, disl_A=0.5, disl_n=2.0, **common)])
    with pytest.raises(ValueError):
        solve_vep(st, pt, geometry, bc, mixed, pr_c, pr_v, 0.25,
                  use_pallas=True, iter_max=100, nout=50)


def _powerlaw_material(dilation=10.0):
    """Two phases: shared-n dislocation creep and a diffusion-creep phase —
    the collapsible nonlinear table (1/η = A + B·τII²)."""
    C = 1.6 / math.cos(math.radians(30.0))
    common = dict(rho0=0.0, Kb=5.0, is_plastic=1.0, C=C,
                  friction_angle=30.0, dilation_angle=dilation, eta_reg=1e-2)
    return MaterialStack.make([
        Material(G=1.0, disl_A=0.4, disl_n=3.0, disl_E=1.0e3, **common),
        Material(G=0.5, diff_A=0.3, diff_m=1.0, grain_size=0.5,
                 diff_E=5.0e2, **common)])


def test_shared_powerlaw_exponent():
    from justrelax_tpu.rheology.viscosity import shared_powerlaw_exponent

    assert shared_powerlaw_exponent(_powerlaw_material()) == 2.0
    common = dict(rho0=0.0, Kb=5.0)
    lin = MaterialStack.make([Material(G=1.0, eta0=2.0, **common)])
    assert shared_powerlaw_exponent(lin) is None  # pure linear: table path
    diff_only = MaterialStack.make(
        [Material(G=1.0, diff_A=0.3, **common), Material(G=1.0, **common)])
    assert shared_powerlaw_exponent(diff_only) == 0.0
    gbs = MaterialStack.make(
        [Material(G=1.0, gbs_A=1.0, gbs_n=2.0, **common)])
    assert shared_powerlaw_exponent(gbs) is None


def test_powerlaw_recip_coeffs_match_phase_viscosity():
    """The collapsed (A, B) canvases reproduce phase_viscosity's tau-mode
    harmonic blend (incl. the >0.999 dominant-phase exit) at any stress."""
    from justrelax_tpu.rheology.viscosity import (
        phase_viscosity,
        powerlaw_recip_coeffs,
        shared_powerlaw_exponent,
    )

    material = _powerlaw_material()
    rng = np.random.default_rng(0)
    ni = (6, 5)
    r0 = rng.uniform(0.0, 1.0, ni)
    r0[0, 0] = 0.9995  # exercise the dominant-phase early exit
    ratios = jnp.asarray(np.stack([r0, 1.0 - r0], axis=-1))
    T = jnp.asarray(250.0 + 100.0 * rng.uniform(size=ni))
    m = shared_powerlaw_exponent(material)
    A, B = powerlaw_recip_coeffs(material, jnp.ones(ni), T, ratios)
    for tau in (1.0e-3, 0.7, 13.0):
        eta_ref = phase_viscosity(
            material, jnp.full(ni, tau), T, ratios, "tau")
        eta_col = 1.0 / (A + B * tau**m)
        np.testing.assert_allclose(
            np.asarray(eta_col), np.asarray(eta_ref), rtol=1e-12)


@pytest.mark.parametrize("NIT,tol", [(1, 1e-15), (40, 2e-6)])
def test_vep_chunk_matches_xla_noslip(NIT, tol):
    """Per-side no-slip (negative-mirror ghosts, face zeroing, the
    reference's bottom-row Vx/3 smoothing) runs in-kernel and matches the
    XLA path (ops/bc.py::_no_slip_velocity_2d)."""
    n = 24
    ni, geometry, material, pr_c, pr_v, _, st, Vx0, Vy0, pt = _setup(n)
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True),
        no_slip=Faces(top=True, bot=True))
    Vx0, Vy0 = flow_bcs((Vx0, Vy0), bc)
    f = st.P.dtype
    txx_o = jnp.full(ni, 1.6, f)
    tau_o = (txx_o, -txx_o, jnp.full(ni, 1.0, f),
             jnp.full((n + 1, n + 1), 1.0, f))
    EII = st.EII_pl + 0.001
    dt = 0.25
    cutoff = (1e-3, 1e3)
    s, eta0, etav0 = _xla_loop(
        NIT, n, ni, geometry, material, pr_c, pr_v, bc, st, Vx0, Vy0, pt,
        tau_o, EII, 0.2, 0.5, cutoff, dt)
    inv_dx, inv_dy = 1.0 / geometry.di[0], 1.0 / geometry.di[1]
    out = stokes_vep_chunk_vmem(
        Vx0, Vy0, st.P, st.P, tau_o[0], tau_o[1], tau_o[2], tau_o[3],
        eta0, etav0, jnp.zeros(ni, f), jnp.zeros((n + 1, n + 1), f),
        st.P, st.Q, *tau_o, EII, material, pr_c, pr_v, None,
        dt, inv_dx, inv_dy, pt.r, pt.theta_dtau, pt.etadtau,
        0.2, 0.5, cutoff, nout=NIT, interpret=True, flow_bc=bc)
    names = ["Vx", "Vy", "theta", "P", "txx", "tyy", "txy_c", "txy_v",
             "eta", "eta_v", "lam", "lam_v"]
    assert float(s["lam"].max()) > 0.1
    for nm, a in zip(names, out):
        d = float(jnp.abs(a - s[nm]).max())
        assert d <= tol, f"{nm}: {d} > {tol}"


@pytest.mark.parametrize("NIT,tol", [(1, 1e-12), (40, 5e-6)])
def test_vep_chunk_matches_xla_powerlaw(NIT, tol):
    """The collapsed tau-mode power-law continuation (1/η = A + B·τII^m
    chunk-invariant canvases, T-dependent Arrhenius) matches
    compute_viscosity_fields' full per-phase blend inside the solve loop."""
    n = 24
    ni, geometry, _, pr_c, pr_v, bc, st, Vx0, Vy0, pt = _setup(n)
    material = _powerlaw_material()
    f = st.P.dtype
    xc = jnp.asarray(geometry.xci[0], f)
    T = 300.0 + 50.0 * jnp.sin(
        2.0 * jnp.pi * xc[:, None]) * jnp.ones((1, n), f)
    from justrelax_tpu.ops.stencil import av_vertex_to_center

    T_v = av_vertex_to_center(jnp.pad(T, 1, mode="edge"))
    txx_o = jnp.full(ni, 1.6, f)
    tau_o = (txx_o, -txx_o, jnp.full(ni, 1.0, f),
             jnp.full((n + 1, n + 1), 1.0, f))
    EII = st.EII_pl + 0.001
    dt = 0.25
    cutoff = (1e-3, 1e3)
    s, eta0, etav0 = _xla_loop(
        NIT, n, ni, geometry, material, pr_c, pr_v, bc, st, Vx0, Vy0, pt,
        tau_o, EII, 0.2, 0.5, cutoff, dt, T=T, T_v=T_v)
    inv_dx, inv_dy = 1.0 / geometry.di[0], 1.0 / geometry.di[1]
    out = stokes_vep_chunk_vmem(
        Vx0, Vy0, st.P, st.P, tau_o[0], tau_o[1], tau_o[2], tau_o[3],
        eta0, etav0, jnp.zeros(ni, f), jnp.zeros((n + 1, n + 1), f),
        st.P, st.Q, *tau_o, EII, material, pr_c, pr_v, T,
        dt, inv_dx, inv_dy, pt.r, pt.theta_dtau, pt.etadtau,
        0.2, 0.5, cutoff, nout=NIT, interpret=True, T_v=T_v)
    names = ["Vx", "Vy", "theta", "P", "txx", "tyy", "txy_c", "txy_v",
             "eta", "eta_v", "lam", "lam_v"]
    assert float(s["lam"].max()) > 0.1
    for nm, a in zip(names, out):
        d = float(jnp.abs(a - s[nm]).max())
        assert d <= tol, f"{nm}: {d} > {tol}"
