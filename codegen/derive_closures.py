"""Derive gap-averaged viscous stress closures with sympy and emit JAX code.

Physics (cf. Holey et al., Tribology Letters 70 (2022), Eq. 9-11; reference
derivation documented in /root/reference/doc/tutorials/02_stress_sympy.ipynb):

The velocity profile across the gap is the standard lubrication ansatz

    u(z) = (Ut - Ub) z / h + Ub + a z (h - z),        z in [0, h]

(quadratic Poiseuille part + linear Couette part), with the analogous profile
for v(z) and w(z) = 0 (no vertical flux).  Wall slip enters through Navier
slip conditions with slip lengths Lsb (bottom) and Lst (top):

    Ub = U_wall,bot + Lsb * du/dz|_{z=0}
    Ut = U_wall,top - Lst * du/dz|_{z=h}

The parameters (a, Ub, Ut) are fixed by the gap-averaged flux constraint

    jx = rho / h * Int_0^h u dz

and the two slip conditions — a linear system solved symbolically.  The
Newtonian stress tensor

    tau_ij = eta (u_i,j + u_j,i) + (zeta - 2/3 eta) u_k,k delta_ij

is then evaluated at z=0 (bottom wall), z=h (top wall), z-resolved, and
gap-averaged (1/h Int_0^h dz), for the four slip modes
(none, top, bottom, both).  Common-subexpression elimination keeps the
generated code compact and fast.

Run:  python codegen/derive_closures.py
Emits: gapflow_tpu/models/_closures.py  (committed, do not edit by hand)
"""

import sys
import sympy as sp
from sympy.printing.pycode import PythonCodePrinter


x, y, z = sp.symbols("x y z")
a, b = sp.symbols("a b")
Lsb, Lst = sp.symbols("Lsb Lst")
Ub, Ut, Vb, Vt = sp.symbols("Ub Ut Vb Vt")
Ubw, Utw, Vbw, Vtw = sp.symbols("Ubw Utw Vbw Vtw")
eta, zeta = sp.symbols("eta zeta")

h = sp.Function("h")(x, y)
rho = sp.Function("rho")(x, y)
jx = sp.Function("jx")(x, y)
jy = sp.Function("jy")(x, y)

# Final-code symbols
H, Hx, Hy = sp.symbols("H Hx Hy")
q0, q1, q2 = sp.symbols("q0 q1 q2")
dqx0, dqx1, dqx2 = sp.symbols("dqx0 dqx1 dqx2")
dqy0, dqy1, dqy2 = sp.symbols("dqy0 dqy1 dqy2")
U, V, Ls = sp.symbols("U V Ls")
zs = sp.Symbol("z")

SLIP_MODES = {
    "none": (0, 0),
    "top": (0, Ls),
    "bottom": (Ls, 0),
    "both": (Ls, Ls),
}


def solve_profile(flux, wb, wt, avg_symbol, slope_symbol, wall_b, wall_t):
    """Solve for one in-plane velocity profile.

    flux: jx or jy (sympy function of x,y); wb/wt: boundary-layer velocity
    symbols (Ub/Ut or Vb/Vt); avg: unused; slope_symbol: 'a' or 'b';
    wall_b/wall_t: wall velocity symbols (Ubw/Utw or Vbw/Vtw).
    Returns the resolved velocity profile u(x, y, z).
    """
    prof = (wt - wb) * z / h + wb + slope_symbol * z * (h - z)
    dprof = sp.diff(prof, z)
    eq_slip_b = sp.Eq(wb, wall_b + Lsb * dprof.subs(z, 0))
    eq_slip_t = sp.Eq(wt, wall_t - Lst * dprof.subs(z, h))
    eq_flux = sp.Eq(flux, rho / h * sp.integrate(prof, (z, 0, h)))
    (sol,) = sp.solve([eq_flux, eq_slip_b, eq_slip_t],
                      [slope_symbol, wb, wt], dict=True)
    return prof.subs(sol)


print("Solving velocity profiles...", flush=True)
u_prof = solve_profile(jx, Ub, Ut, None, a, Ubw, Utw)
v_prof = solve_profile(jy, Vb, Vt, None, b, Vbw, Vtw)

# Strain-rate tensor (w = 0)
du_dx, du_dy, du_dz = (sp.diff(u_prof, s) for s in (x, y, z))
dv_dx, dv_dy, dv_dz = (sp.diff(v_prof, s) for s in (x, y, z))

Dxx = du_dx
Dyy = dv_dy
Dzz = sp.Integer(0)
Dxy = (du_dy + dv_dx) / 2
Dxz = du_dz / 2
Dyz = dv_dz / 2

v1 = zeta + sp.Rational(4, 3) * eta
v2 = zeta - sp.Rational(2, 3) * eta

TAU = {
    "xx": v1 * Dxx + v2 * (Dyy + Dzz),
    "yy": v1 * Dyy + v2 * (Dxx + Dzz),
    "zz": v1 * Dzz + v2 * (Dxx + Dyy),
    "yz": 2 * eta * Dyz,
    "xz": 2 * eta * Dxz,
    "xy": 2 * eta * Dxy,
}
VOIGT = ["xx", "yy", "zz", "yz", "xz", "xy"]

FINAL_SUBS = {
    sp.Derivative(h, x): Hx,
    sp.Derivative(h, y): Hy,
    sp.Derivative(rho, x): dqx0,
    sp.Derivative(rho, y): dqy0,
    sp.Derivative(jx, x): dqx1,
    sp.Derivative(jx, y): dqy1,
    sp.Derivative(jy, x): dqx2,
    sp.Derivative(jy, y): dqy2,
    h: H,
    rho: q0,
    jx: q1,
    jy: q2,
    Ubw: U,
    Vbw: V,
    Utw: 0,
    Vtw: 0,
}


def _gap_average(e):
    """Integrate a z-polynomial-over-z-free-denominator from 0 to H, divide by H.

    Much faster than sympy.integrate for these large rational expressions.
    """
    e = sp.cancel(sp.together(e))
    num, den = sp.fraction(e)
    if den.has(zs):
        raise RuntimeError("denominator depends on z; cannot integrate termwise")
    poly = sp.Poly(sp.expand(num), zs)
    integral = sum(c * H ** (k + 1) / (k + 1)
                   for (k,), c in poly.terms())
    return integral / den / H


def finalize(expr, mode, at=None, average=False):
    """Specialize a stress expression to a slip mode and evaluation location."""
    lsb, lst = SLIP_MODES[mode]
    e = expr.subs({Lsb: lsb, Lst: lst}).subs(FINAL_SUBS).subs(z, zs)
    if average:
        e = _gap_average(e)
    elif at is not None:
        # wall evaluation: z -> 0 or z -> H (h was already renamed to H)
        e = e.subs(zs, at if at == 0 else H)
    return sp.together(sp.cancel(sp.together(e)))


class _Printer(PythonCodePrinter):
    def _print_Rational(self, expr):
        return f"({expr.p}/{expr.q})"


_printer = _Printer()


def emit_function(name, exprs, args, out):
    """CSE a list of expressions and emit one python function."""
    repl, reduced = sp.cse(exprs, optimizations="basic", order="none")
    lines = [f"def {name}({', '.join(args)}):"]
    for sym, sub in repl:
        lines.append(f"    {sym} = {_printer.doprint(sub)}")
    rets = ", ".join(_printer.doprint(e) for e in reduced)
    lines.append(f"    return ({rets})")
    out.append("\n".join(lines))
    print(f"  emitted {name} ({len(repl)} cse temps)", flush=True)


HEADER = '''"""GENERATED by codegen/derive_closures.py — DO NOT EDIT.

Closed-form Newtonian stress closures of the gap-averaged lubrication model,
derived symbolically from the quadratic-profile ansatz with Navier wall slip
(see codegen/derive_closures.py for the derivation).  All functions are plain
arithmetic and broadcast over array arguments; they are jit/vmap/pallas safe.

Function families (mode in none/top/bottom/both; "top" = slip at top wall):
  _vel_<mode>(z, q0, qi, H, W, Ls)              -> velocity profile
  _tau_profile_<mode>(z, q0..dqy2, U, V, eta, zeta, Ls) -> 6 Voigt profiles
  _tau_bottom_<mode>(...)                        -> 6 Voigt at z=0
  _tau_top_<mode>(...)                           -> 6 Voigt at z=h
  _tau_avg_<mode>(...)                           -> 6 Voigt gap-averaged
"""
'''

STRESS_ARGS = ["q0", "q1", "q2", "H", "Hx", "Hy",
               "dqx0", "dqx1", "dqx2", "dqy0", "dqy1", "dqy2",
               "U", "V", "eta", "zeta", "Ls"]
NODQ_ARGS = ["q0", "q1", "q2", "H", "Hx", "Hy", "U", "V", "eta", "zeta", "Ls"]


def main():
    chunks = [HEADER]

    for mode in SLIP_MODES:
        print(f"mode={mode}: velocity profile", flush=True)
        lsb, lst = SLIP_MODES[mode]
        uu = u_prof.subs({Lsb: lsb, Lst: lst}).subs(FINAL_SUBS).subs(z, zs)
        uu = sp.together(sp.cancel(sp.together(uu)))
        # u depends only on (q0, q1, U); emit with generic flux/wall symbols
        uu = uu.subs({q1: sp.Symbol("qi"), U: sp.Symbol("W")})
        emit_function(f"_vel_{mode}", [uu],
                      ["z", "q0", "qi", "H", "W", "Ls"], chunks)

        print(f"mode={mode}: stress profiles", flush=True)
        profs = [finalize(TAU[c], mode) for c in VOIGT]
        emit_function(f"_tau_profile_{mode}", profs,
                      ["z"] + STRESS_ARGS, chunks)

        print(f"mode={mode}: wall/avg stresses", flush=True)
        bots = [finalize(TAU[c], mode, at=sp.Integer(0)) for c in VOIGT]
        emit_function(f"_tau_bottom_{mode}", bots, STRESS_ARGS, chunks)

        tops = [finalize(TAU[c], mode, at=h) for c in VOIGT]
        emit_function(f"_tau_top_{mode}", tops, STRESS_ARGS, chunks)

        avgs = [finalize(TAU[c], mode, average=True) for c in VOIGT]
        emit_function(f"_tau_avg_{mode}", avgs, STRESS_ARGS, chunks)

        # solver hot-path specialization: state gradients dq are structurally
        # zero there (reference passes no dq in its hot loop); the expressions
        # collapse to a fraction of the ops, shrinking the jitted step graph
        nodq = {s: 0 for s in (dqx0, dqx1, dqx2, dqy0, dqy1, dqy2)}
        for tag, exprs in (("bottom", bots), ("top", tops), ("avg", avgs)):
            small = [sp.cancel(e.subs(nodq)) for e in exprs]
            emit_function(f"_tau_{tag}_{mode}_nodq", small,
                          NODQ_ARGS, chunks)

    # Fused solver-pass closure (hot kernel): only the quantities the
    # MacCormack update consumes, CSE'd jointly:
    #   bulk stresses (xx, yy, xy) entering the fluxes, and the three
    #   geometric source terms (with wall stresses folded in).
    # Mode 'top' (no-slip bottom / slip top), no state gradients -- the
    # deterministic hot path.
    print("fused solver pass (mode=top, nodq)", flush=True)
    nodq = {s: 0 for s in (dqx0, dqx1, dqx2, dqy0, dqy1, dqy2)}

    def spec(expr, at=None, average=False):
        return finalize(expr, "top", at=at, average=average).subs(nodq)

    tb_xx = spec(TAU["xx"], average=True)
    tb_yy = spec(TAU["yy"], average=True)
    tb_xy = spec(TAU["xy"], average=True)

    su_xx = spec(TAU["xx"], at=h)
    su_yy = spec(TAU["yy"], at=h)
    su_yz = spec(TAU["yz"], at=h)
    su_xz = spec(TAU["xz"], at=h)
    su_xy = spec(TAU["xy"], at=h)

    sl_yz = spec(TAU["yz"], at=sp.Integer(0))
    sl_xz = spec(TAU["xz"], at=sp.Integer(0))

    S0 = (-q1 * Hx - q2 * Hy) / H
    S1 = ((tb_xx - su_xx) * Hx + (tb_xy - su_xy) * Hy + su_xz - sl_xz) / H
    S2 = ((tb_xy - su_xy) * Hx + (tb_yy - su_yy) * Hy + su_yz - sl_yz) / H

    emit_function("_fused_pass_top",
                  [sp.cancel(e) for e in (tb_xx, tb_yy, tb_xy, S0, S1, S2)],
                  NODQ_ARGS, chunks)

    src = "\n\n\n".join(chunks) + "\n"
    outfile = sys.argv[1] if len(sys.argv) > 1 else \
        "gapflow_tpu/models/_closures.py"
    with open(outfile, "w") as fh:
        fh.write(src)
    print(f"wrote {outfile} ({len(src)} bytes)")


if __name__ == "__main__":
    main()
