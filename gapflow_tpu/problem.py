"""Problem driver: configuration, time loop, I/O and model orchestration.

Hosts the simulation: field registry, constitutive models, topography,
output writers, signal handling and the time loop.  Two execution paths:

- deterministic (no GP): the whole MacCormack step runs as one fused,
  jit-compiled XLA program (:func:`gapflow_tpu.core.make_det_step`); the
  host only syncs state for output frames.  ``run_compiled`` additionally
  runs whole convergence loops on-device (``lax.while_loop``).
- GP-surrogate: constitutive fields come from on-the-fly trained GPs with
  active learning; each MacCormack pass is a smaller jitted kernel and the
  GP machinery drives retraining between passes.

Protocol parity: reference GaPFlow/problem.py:56-881 (same YAML sections,
field conventions, MacCormack ordering, ghost-cell handling, residual and
adaptive-dt logic, NaN/negative-density rollback and signal handling).
"""

import os
from collections import deque
from datetime import datetime

import numpy as np
import jax.numpy as jnp

from . import __version__
from .config import (read_yaml_input, read_yaml_string, write_yaml,
                     create_output_directory, history_to_csv)
from .core.state import SimState
from .core.step import (SolverConfig, make_det_step, make_pass_fn,
                        make_run_loop, make_trajectory, apply_bcs,
                        mc_directions)

from .db import Database
from .fields import FieldCollection
from .md import Mock, LennardJones, GoldAlkane
from .models import Pressure, WallStress, BulkStress
from .nc import NCWriter
from .topography import Topography
from .utils import handle_signals, get_termination_signals, set_quiet, echo


class Problem:
    """A gap-averaged lubrication flow problem.

    Use :meth:`from_yaml` / :meth:`from_string` to construct from sanitized
    YAML input.
    """

    def __init__(self, options, grid, numerics, prop, geo, gp=None,
                 database=None, extra_field=None):
        if database is not None and not database.has_mock_md:
            prop["shear"] = 0.
            prop["bulk"] = 0.

        self.options = options
        set_quiet(options.get("silent", False))
        self.grid = grid
        self.numerics = numerics
        self.geo = geo
        self.prop = prop

        nb_grid_pts = (grid["Nx"] + 2, grid["Ny"] + 2)
        fc = FieldCollection(nb_grid_pts)
        self.fc = fc

        # solution field
        self.step = None
        self.__field = fc.real_field("solution", (3,))
        self._initialize(rho0=prop["rho0"], U=geo["U"], V=geo["V"])

        # extra features (e.g. slip length)
        num_extra = 1 if database is None else database.num_features - 6
        extra = fc.real_field("extra", (num_extra,))
        if extra_field is not None:
            extra.p[...] = extra_field

        fc.register_real_field("x")
        fc.register_real_field("y")
        fc.register_real_field("pressure")
        fc.register_real_field("topography", (4,))

        gpx, gpy, gpz = self._select_gp_config(gp)
        self.has_gp_model = gp is not None
        self.gp_config = gp
        self.database = database
        self.pressure = Pressure(fc, prop, geo, data=database, gp=gpz)
        self.bulk_stress = BulkStress(fc, prop, geo, data=None, gp=None)
        self.wall_stress_xz = WallStress(fc, prop, geo, direction="x",
                                         data=database, gp=gpx)
        self.wall_stress_yz = WallStress(fc, prop, geo, direction="y",
                                         data=database, gp=gpy)

        self.topo = Topography(fc, grid, geo, prop)

        # fused deterministic step (built lazily; only used without GPs)
        self._solver_cfg = SolverConfig.from_dicts(grid, geo, prop, numerics)
        self._det_step = None
        self._pass_fn = None

        # I/O
        if not options["silent"]:
            self.outdir = create_output_directory(options["output"],
                                                  options["use_tstamp"])

            if database is not None:
                database.set_training_path(os.path.join(self.outdir, "train"),
                                           check_temporary=True)
                database.output_path = self.outdir
                options["output"] = self.outdir

            full_dict = {"version": __version__}
            for k, v in zip(["options", "grid", "numerics", "geo", "prop"],
                            [options, grid, numerics, geo, prop]):
                full_dict[k] = v
            if database is not None:
                full_dict["gp"] = gp
                full_dict["db"] = database.config
                full_dict["md"] = database.md_config
            write_yaml(full_dict, os.path.join(self.outdir, "config.yml"))

            # topography output: once, or per-frame when elastic
            self.topofile = NCWriter(os.path.join(self.outdir, "topo.nc"),
                                     fc, field_names=["topography"])
            self.topofile.append_frame().write()
            if not prop["elastic"]["enabled"]:
                self.topofile.close()

            field_names = ["solution", "pressure",
                           "wall_stress_xz", "wall_stress_yz"]
            if gpx is not None:
                field_names.append("wall_stress_xz_var")
            if gpy is not None:
                field_names.append("wall_stress_yz_var")
            if gpz:
                field_names.append("pressure_var")

            self.file = NCWriter(os.path.join(self.outdir, "sol.nc"),
                                 fc, field_names=field_names)

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------

    @staticmethod
    def _get_mandatory_input(input_dict):
        return (input_dict["options"], input_dict["grid"],
                input_dict["numerics"], input_dict["properties"],
                input_dict["geometry"])

    @staticmethod
    def _get_optional_input(input_dict):
        gp = input_dict.get("gp")
        md = input_dict.get("md")
        db = input_dict.get("db")

        if db is not None:
            if md is None:
                MD = Mock(input_dict["properties"], input_dict["geometry"], gp)
            elif md["system"] == "lj":
                MD = LennardJones(md)
            elif md["system"] == "mol":
                MD = GoldAlkane(md)
            else:
                raise ValueError(f"unknown MD system: {md['system']}")
            database = Database(MD, db)
        else:
            database = None

        return {"gp": gp, "database": database, "extra_field": None}

    @classmethod
    def from_yaml(cls, fname):
        """Build a Problem from a YAML file."""
        print(f"Reading input file: {fname}")
        with open(fname) as ymlfile:
            input_dict = read_yaml_input(ymlfile)
        return cls._from_dict(input_dict)

    @classmethod
    def from_string(cls, ymlstring):
        """Build a Problem from a YAML string."""
        return cls._from_dict(read_yaml_string(ymlstring))

    @classmethod
    def _from_dict(cls, input_dict):
        return cls(*cls._get_mandatory_input(input_dict),
                   **cls._get_optional_input(input_dict))

    # ------------------------------------------------------------------
    # Field accessors / scalars
    # ------------------------------------------------------------------

    @property
    def q(self):
        """The conserved-variable field (rho, jx, jy), ghost cells included."""
        return self.__field.p

    @property
    def q_has_nan(self):
        return bool(np.any(np.isnan(self.q)))

    @property
    def q_has_negative_density(self):
        return bool(np.any(self.q[0] < 0.))

    @property
    def q_is_valid(self):
        return not self.q_has_nan and not self.q_has_negative_density

    @property
    def mass(self):
        """Total mass integrated over the domain."""
        return np.sum(self.q[0] * self.topo.h
                      * self.grid["dx"] * self.grid["dy"])

    @property
    def kinetic_energy(self):
        return np.sum((self.q[1] ** 2 + self.q[2] ** 2) / self.q[0] / 2.)

    @property
    def v_max(self):
        return np.sqrt((self.q[1] ** 2 + self.q[2] ** 2) / self.q[0]).max()

    @property
    def dt_crit(self):
        """Critical timestep from grid spacing, flow speed and sound speed."""
        return (min(self.grid["dx"], self.grid["dy"])
                / (self.v_max + self.pressure.v_sound))

    @property
    def cfl(self):
        return self.dt / self.dt_crit

    @property
    def converged(self):
        return bool(np.all(np.array(self.residual_buffer) < self.tol))

    # ------------------------------------------------------------------
    # Run loop
    # ------------------------------------------------------------------

    def run(self, keep_open=False):
        """Advance until convergence, max_it, or a termination signal.

        If ``options['profile']`` is set, the whole run is captured with
        ``jax.profiler.trace`` into that directory (view with tensorboard
        or xprof).
        """
        profile_dir = self.options.get("profile")
        if profile_dir:
            import jax
            with jax.profiler.trace(profile_dir):
                return self._run(keep_open)
        return self._run(keep_open)

    def _run(self, keep_open=False):
        if self.step is None:
            self._pre_run()

        self._stop = False
        self.history = {"step": [], "time": [], "ekin": [],
                        "residual": [], "vsound": []}

        # Silent deterministic runs need no per-step host I/O: run the whole
        # convergence loop on-device.  Float32 production problems covered
        # by the fused Pallas kernel take the chunked fast path (convergence
        # checked at chunk granularity); everything else runs the XLA
        # lax.while_loop with the reference per-step semantics.
        if (self.options["silent"] and not self.has_gp_model
                and not self.topo.elastic):
            self._tic = datetime.now()
            if self._fast_run_eligible():
                self.run_compiled_fast()
            else:
                self.run_compiled()
            if not keep_open:
                self._post_run()
            return

        # Non-silent deterministic runs: advance write_freq steps per device
        # round-trip (scanned trajectory), writing frames at the reference
        # cadence.  Convergence is checked at frame boundaries.
        if not self.has_gp_model and not self.topo.elastic:
            self._run_chunked(keep_open)
            return

        # Silent MULTISCALE runs (GP surrogates and/or elastic): whole-run
        # device paths — chunked host-protocol AL, frozen-GP fused loops,
        # or the pass-2 EHL loop — with convergence checked at chunk
        # granularity (the same trade the silent det route makes).
        # python -m gapflow_tpu on a GP/EHL config gets device speed
        # without knowing the run_steps_* family.  Adaptive dt rides the
        # device loop carry on the frozen-GP and EHL routes
        # (tests/test_adaptive_device.py); chunked AL refreshes it at
        # acquisition/chunk boundaries host-side, so the per-step host
        # loop below remains the protocol-exact adaptive AL path.
        if self.options["silent"] and not (self.numerics["adaptive"]
                                           and self._route_uses_al()):
            self._tic = datetime.now()
            self._run_device_multiscale()
            if not keep_open:
                self._post_run()
            return

        if not self.options["silent"]:
            print(61 * "-")
            print(f"{'Step':6s} {'Timestep':10s} {'Time':10s} "
                  f"{'CFL':10s} {'Residual':10s}")
            print(61 * "-")
            self.write(params=False)

        self._tic = datetime.now()
        while not self.converged and self.step < self.max_it and not self._stop:
            self.update()

            if (self.step % self.options["write_freq"] == 0
                    and not self.options["silent"]):
                self.write()

            handle_signals(self._receive_signal)

        if not keep_open:
            self._post_run()

    def _run_chunked(self, keep_open=False):
        """Deterministic non-silent run: on-device chunks between writes."""
        print(61 * "-")
        print(f"{'Step':6s} {'Timestep':10s} {'Time':10s} "
              f"{'CFL':10s} {'Residual':10s}")
        print(61 * "-")
        self._refresh_det_fields()
        self.write(params=False)

        self._tic = datetime.now()
        chunk = self.options["write_freq"]
        while (not self.converged and self.step < self.max_it
               and not self._stop):
            n = min(chunk, self.max_it - self.step)
            self.run_steps(n)
            self._refresh_det_fields()
            self.write()
            handle_signals(self._receive_signal)

        if not keep_open:
            self._post_run()

    def _route_uses_al(self):
        """True when any surrogate runs active learning (the chunked-AL
        device route)."""
        if not self.has_gp_model:
            return False
        from .core.al_loop import _surrogate_specs
        return any(s.use_al for s in _surrogate_specs(self).values())

    def _run_device_multiscale(self):
        """Silent fixed-dt GP/elastic convergence run on device chunks.

        Routes each chunk onto the strongest applicable device path —
        active learning on any surrogate -> :meth:`run_steps_gp_chunked`
        (host acquisition protocol between compiled advances); frozen
        surrogates -> :meth:`run_steps_gp_fast` (elastic composes);
        deterministic elastic -> :meth:`_run_steps_ehl_pass2` — all
        host-trajectory-exact (tests/test_run_autoroute.py).  Residual
        convergence and NaN/negative-density rollback are evaluated at
        chunk granularity, mirroring :meth:`run_compiled_fast`.  The
        taken route is recorded in ``self._device_route``.
        """
        if self.has_gp_model:
            self._device_route = ("gp_chunked" if self._route_uses_al()
                                  else "gp_fast")
        else:
            self._device_route = "ehl_pass2"

        chunk = int(max(1, min(self.options["write_freq"], 512)))
        dmin = min(self.grid["dx"], self.grid["dy"])
        ekin_old = self.kinetic_energy
        q_prev = self.q.copy()

        while self.step < self.max_it and not self._stop:
            n = int(min(chunk, self.max_it - self.step))
            if self._device_route == "gp_chunked":
                self.run_steps_gp_chunked(n)
            elif self._device_route == "gp_fast":
                self.run_steps_gp_fast(n)
            else:
                self._run_steps_ehl_pass2(n)

            if not self.q_is_valid:
                print("Invalid state (NaN or negative density) detected; "
                      "stopped at the last valid chunk.")
                self.q[...] = q_prev
                self._refresh_det_fields()
                self._stop = True
                break
            q_prev = self.q.copy()

            ekin = self.kinetic_energy
            cfl = self.dt * (self.v_max + self.pressure.v_sound) / dmin
            self.residual = (abs(ekin - ekin_old)
                             / max(ekin_old, 1e-300) / cfl / n)
            self.residual_buffer.append(self.residual)
            ekin_old = ekin
            self.kinetic_energy_old = ekin

            handle_signals(self._receive_signal)
            if self.converged and len(self.residual_buffer) == 5:
                break

    def _refresh_det_fields(self):
        """Recompute pressure/stress output fields from the current q."""
        self.pressure.update(predictor=False, compute_var=True)
        self.wall_stress_xz.update(predictor=False, compute_var=True)
        self.wall_stress_yz.update(predictor=False, compute_var=True)
        self.bulk_stress.update()

    def _pre_run(self):
        self.pressure.init_database(self.grid["dim"])
        self.wall_stress_xz.init_database(self.grid["dim"])
        self.wall_stress_yz.init_database(self.grid["dim"])

        self.pressure.init()
        self.wall_stress_xz.init()
        self.wall_stress_yz.init()

        if not self.options["silent"]:
            self.pressure.write()
            self.wall_stress_xz.write()
            self.wall_stress_yz.write()

        self.step = 0
        self.simtime = 0.
        self.residual = 1.
        self._stop = False
        self.residual_buffer = deque([self.residual], 5)

        # GP-driven problems need pressure/stress fields before step 0
        if self.has_gp_model:
            self.pressure.update(predictor=False, compute_var=True)
            self.wall_stress_xz.update(predictor=False, compute_var=True)
            self.wall_stress_yz.update(predictor=False, compute_var=True)
            self.bulk_stress.update()

        if self.numerics["adaptive"]:
            self.dt = self.numerics["CFL"] * self.dt_crit
        else:
            self.dt = self.numerics["dt"]

        self.tol = self.numerics["tol"]
        self.max_it = self.numerics["max_it"]

    def _receive_signal(self, signum, frame):
        if signum in get_termination_signals():
            self._stop = True

    def _post_run(self):
        walltime = datetime.now() - self._tic

        # final unwritten frame (chunked runs may have written at a
        # non-multiple step already — track actual writes, not modulo)
        if (getattr(self, "_last_written_step", None) != self.step
                and not self.options["silent"]):
            self.write()

        if not self.options["silent"]:
            self.file.close()
            if self.prop["elastic"]["enabled"]:
                self.topofile.close()

        speed = self.step / max(walltime.total_seconds(), 1e-12)

        echo(33 * "=")
        echo("Total walltime   : ", str(walltime).split(".")[0])
        echo(f"({speed:.2f} steps/s)")

        for model, tag in ((self.pressure, "zz"), (self.wall_stress_xz, "xz"),
                           (self.wall_stress_yz, "yz")):
            if model.is_gp_model:
                echo(f" - GP train ({tag}) : ",
                     str(model.cumtime_train).split(".")[0])
                echo(f" - GP infer ({tag}) : ",
                     str(model.cumtime_infer).split(".")[0])
        echo(33 * "=")

        if not self.options["silent"]:
            history_to_csv(os.path.join(self.outdir, "history.csv"),
                           self.history)
            for model, tag in ((self.pressure, "zz"),
                               (self.wall_stress_xz, "xz"),
                               (self.wall_stress_yz, "yz")):
                if model.is_gp_model:
                    history_to_csv(os.path.join(self.outdir, f"gp_{tag}.csv"),
                                   model.history)
                    with open(os.path.join(self.outdir, f"gp_{tag}.txt"),
                              "w") as fh:
                        print(model.gp, file=fh)

    # ------------------------------------------------------------------
    # Single timestep
    # ------------------------------------------------------------------

    def update(self):
        """One MacCormack timestep (fused path or GP-driven path)."""
        if self.has_gp_model:
            self._update_gp()
        else:
            self._update_fused()

    # -- deterministic fused path --------------------------------------

    def _make_state(self):
        ftype = jnp.float64 if jnp.asarray(self.q).dtype == jnp.float64 \
            else jnp.float32
        return SimState(
            q=jnp.asarray(self.q),
            topo=jnp.asarray(self.topo.full),
            extra=jnp.asarray(self.fc.get_real_field("extra").p),
            dt=jnp.asarray(self.dt, dtype=ftype),
            step=jnp.asarray(self.step, dtype=jnp.int32),
            simtime=jnp.asarray(self.simtime, dtype=ftype),
            ekin_old=jnp.asarray(self.kinetic_energy_old, dtype=ftype),
            residual=jnp.asarray(self.residual, dtype=ftype),
            residual_buffer=jnp.asarray(
                list(self.residual_buffer)[::-1]
                + [np.inf] * (5 - len(self.residual_buffer)), dtype=ftype),
            valid=jnp.asarray(True),
        )

    def _update_fused(self):
        if self._det_step is None:
            self._det_step = make_det_step(self._solver_cfg)

        state = self._make_state()
        new_state, aux = self._det_step(state)

        p, tau_bulk, s_lo, s_up = aux
        self._sync_closure_fields(p, tau_bulk, s_lo, s_up)

        if bool(new_state.valid):
            self.q[...] = np.asarray(new_state.q)
            if self.topo.elastic:
                # elastic update uses the pass-2 pressure (reference order),
                # then ghost cells stay as filled by the step
                self.topo.update()
            self.residual = float(new_state.residual)
            self.residual_buffer.append(self.residual)
            self.kinetic_energy_old = float(new_state.ekin_old)
            self.step += 1
            self.simtime = float(new_state.simtime)
            self.dt = float(new_state.dt)
        else:
            # rollback: q reset to pre-step values by the solver
            self.q[...] = np.asarray(new_state.q)
            print("Invalid state (NaN or negative density) detected.", end=" ")
            # refresh output fields from the restored state
            self._refresh_det_fields()
            print("Writing previous step and aborting simulation.")
            self._stop = True

    def _sync_closure_fields(self, p, tau_bulk, s_lo, s_up):
        """Mirror the last-pass closure fields into the host registry."""
        self.fc.get_real_field("pressure").p[...] = np.asarray(p)
        self.fc.get_real_field("bulk_viscous_stress").p[...] = np.asarray(tau_bulk)
        s_lo = np.asarray(s_lo)
        s_up = np.asarray(s_up)
        for field, oi in ((self.fc.get_real_field("wall_stress_xz"), 4),
                          (self.fc.get_real_field("wall_stress_yz"), 3)):
            f = field.p
            f[:3] = s_lo[:3] / 2.
            f[5] = s_lo[5] / 2.
            f[oi] = s_lo[oi]
            f[3 if oi == 4 else 4] = 0.
            f[6:9] = s_up[:3] / 2.
            f[11] = s_up[5] / 2.
            f[oi + 6] = s_up[oi]
            f[9 if oi == 4 else 10] = 0.

    # -- GP-driven path -------------------------------------------------

    # -- fused GP path ----------------------------------------------------

    def _gp_models(self):
        return [m for m in (self.pressure, self.wall_stress_xz,
                            self.wall_stress_yz) if m.is_gp_model]

    def _gp_fused_eligible(self, one_step_before_output):
        """The whole GP step can run as one XLA program when no model may
        retrain/acquire this step and no variance output is due."""
        if one_step_before_output:
            return False
        models = self._gp_models()
        if not models:
            return False
        for m in models:
            # predict() decrements _pause BEFORE its AL check, so AL can
            # trigger this step whenever _pause - 1 < 0 — including the
            # initial _pause == 0 (reference models/gp.py:609-611; the
            # previous `< 0` here skipped AL on the very first step and
            # on the step a pause expires)
            if m.use_active_learning and m._pause <= 0:
                return False
            if m.last_fit_train_size < m.database.size:
                return False
            if m.params is None:
                return False
        return True

    def _gp_state(self):
        """Collect per-surrogate caches for the fused step."""
        state = {"Xscale": jnp.asarray(self.database.X_scale)}
        for key, model in (("z", self.pressure), ("x", self.wall_stress_xz),
                           ("y", self.wall_stress_yz)):
            if not model.is_gp_model:
                continue
            model._ensure_conditioned()
            state[f"params_{key}"] = model.params
            state[f"Xfit_{key}"] = model._X_at_fit
            state[f"alpha_{key}"] = model.cond_gp[1]
            state[f"Yscale_{key}"] = jnp.asarray(model.Yscale)
        return state

    def _update_gp_fused(self):
        from .core.gp_step import make_gp_step

        dims = tuple(
            tuple(m.active_dims) if m.is_gp_model else None
            for m in (self.pressure, self.wall_stress_xz,
                      self.wall_stress_yz))
        use = tuple(m.is_gp_model for m in (self.pressure,
                                            self.wall_stress_xz,
                                            self.wall_stress_yz))
        step_fn = make_gp_step(self._solver_cfg, dims,
                               self.database.num_features, use)

        q_new, p_last = step_fn(jnp.asarray(self.q),
                                jnp.asarray(self.topo.full),
                                jnp.asarray(self.fc.get_real_field("extra").p),
                                jnp.asarray(self.dt),
                                jnp.asarray(self.step, dtype=jnp.int32),
                                self._gp_state())

        q0 = self.q.copy()
        self.q[...] = np.asarray(q_new)
        self.fc.get_real_field("pressure").p[...] = np.asarray(p_last)

        # protocol bookkeeping (one predictor pass per step)
        for m in self._gp_models():
            m._step += 1
            m._pause = max(-1, m._pause - 1)

        if self.q_is_valid:
            self.topo.update()
            self._post_update()
        else:
            self._finalize(q0)

    def _update_gp(self):
        one_step_before_output = \
            (self.step + 1) % self.options["write_freq"] == 0

        if self._gp_fused_eligible(one_step_before_output):
            self._update_gp_fused()
            return

        if self._pass_fn is None:
            self._pass_fn = make_pass_fn(self._solver_cfg)

        if self.numerics["MC_order"] == 0:
            switch = (self.step % 2 == 0) * 2 - 1
        else:
            switch = self.numerics["MC_order"]
        directions = mc_directions(switch)

        dt = self.dt
        q0 = self.q.copy()

        for i, d in enumerate(directions):
            self.pressure.update(predictor=i == 0,
                                 compute_var=one_step_before_output)
            self.wall_stress_xz.update(predictor=i == 0,
                                       compute_var=one_step_before_output)
            self.wall_stress_yz.update(predictor=i == 0,
                                       compute_var=one_step_before_output)
            self.bulk_stress.update()

            q_new = self._pass_fn(
                jnp.asarray(self.q),
                jnp.asarray(self.topo.full),
                jnp.asarray(self.pressure.pressure),
                jnp.asarray(self.bulk_stress.stress),
                jnp.asarray(self.wall_stress_xz.lower
                            + self.wall_stress_yz.lower),
                jnp.asarray(self.wall_stress_xz.upper
                            + self.wall_stress_yz.upper),
                jnp.asarray(dt),
                d,
            )
            self.q[...] = np.asarray(q_new)

        self.q[...] = (self.q + q0) / 2.

        if self.q_is_valid:
            self.topo.update()
            self._post_update()
        else:
            self._finalize(q0)

    def _post_update(self):
        self._communicate_ghost_buffers()

        self.residual = (abs(self.kinetic_energy - self.kinetic_energy_old)
                         / self.kinetic_energy_old / self.cfl)
        self.residual_buffer.append(self.residual)
        self.kinetic_energy_old = self.kinetic_energy

        self.step += 1
        self.simtime += self.dt

        if self.numerics["adaptive"]:
            self.dt = self.numerics["CFL"] * self.dt_crit

    def _finalize(self, q0):
        if self.q_has_nan:
            print("NaN detected.", end=" ")
        elif self.q_has_negative_density:
            print("Negative density detected.", end=" ")

        self.q[...] = q0
        self._refresh_det_fields()

        print("Writing previous step and aborting simulation.")
        self._stop = True

    def _communicate_ghost_buffers(self):
        self.q[...] = np.asarray(apply_bcs(jnp.asarray(self.q),
                                           self._solver_cfg))

    # ------------------------------------------------------------------
    # Compiled fast path (deterministic problems)
    # ------------------------------------------------------------------

    def run_steps(self, n):
        """Advance ``n`` deterministic steps on-device; return the trajectory.

        Returns (qs, times): the solution field and physical time after each
        step, stacked along a leading axis of length n.  The Problem state
        is synced to the final step.  Much faster than n ``update()`` calls
        (one fused lax.scan, no per-step host round-trips).
        """
        if self.has_gp_model:
            raise RuntimeError("run_steps requires a deterministic problem")
        if self.topo.elastic:
            raise RuntimeError("run_steps does not cover elastic problems "
                               "(the fused step freezes the topography; "
                               "use update()/run() or core.ehl)")
        if self.step is None:
            self._pre_run()

        runner = make_trajectory(self._solver_cfg, n)
        state, (qs, times) = runner(self._make_state())
        state.q.block_until_ready()

        if not bool(state.valid):
            # the fused step rolled back to the last valid q and froze
            print("Invalid state (NaN or negative density) detected during "
                  "on-device stepping; stopping at the last valid state.")
            self._stop = True

        self.q[...] = np.asarray(state.q)
        self.step = int(state.step)
        self.simtime = float(state.simtime)
        self.dt = float(state.dt)
        self.residual = float(state.residual)
        self.kinetic_energy_old = float(state.ekin_old)
        self.residual_buffer = deque(
            [float(r) for r in np.asarray(state.residual_buffer)[::-1]
             if np.isfinite(r)], 5)
        return np.asarray(qs), np.asarray(times)

    def run_steps_fast(self, n, dtype=None, compensated=True):
        """Advance ``n`` fixed-dt steps through the fused Pallas kernel.

        Float32, periodic-BC production path (falls back to
        :meth:`run_steps` when the kernel does not cover the problem).
        Tracks no residuals; syncs q afterwards.  ``compensated`` enables
        Kahan accumulation of the per-step increments, required for small
        fixed dt in float32 (see ops.stencil.make_pallas_loop).
        """
        from .ops import make_pallas_loop, mixed_supported, pallas_supported
        import jax.numpy as _jnp

        if self.has_gp_model or self.topo.elastic:
            raise RuntimeError("run_steps_fast requires a deterministic, "
                               "non-elastic problem")
        if self.step is None:
            self._pre_run()
        if self.numerics["adaptive"]:
            # the Pallas loop hoists dt; adaptive runs take the fused
            # state scan (host-exact per-step dt refresh) instead
            self.run_steps(n)
            return

        ny = self.grid["Ny"]
        if not (pallas_supported(self._solver_cfg, ny)
                or mixed_supported(self._solver_cfg, ny, self.grid["Nx"])):
            self.run_steps(n)
            return

        loop = make_pallas_loop(self._solver_cfg, self.grid["Nx"], ny,
                                dtype=dtype or _jnp.float32,
                                compensated=compensated)
        q = loop(jnp.asarray(self.q), jnp.asarray(self.topo.full),
                 jnp.asarray(self.fc.get_real_field("extra").p),
                 jnp.asarray(self.dt), n)
        self.q[...] = np.asarray(q)
        self.step += n
        self.simtime += n * self.dt

    def run_steps_ehl(self, n, deform_every=1, dtype=None):
        """Advance ``n`` fixed-dt steps of an ELASTIC problem through the
        on-device EHL loop (core.ehl.make_ehl_loop).

        The reference protocol (``deform_every=1``) evaluates the elastic
        FFT every fluid step; larger ``deform_every`` chunks the updates
        with the compounded under-relaxation factor (same fixed point).
        On covered configurations (fully periodic, no thinning, f32) the
        fluid step runs the statics-in-kernel Pallas kernel with the
        interior Kahan carry.  Syncs q, the deformation state and the
        topography afterwards.
        """
        from .core.ehl import make_ehl_loop
        from .models.eos import eos_pressure as _eos

        if not self.topo.elastic:
            raise RuntimeError("run_steps_ehl requires an elastic problem")
        if self.has_gp_model:
            raise RuntimeError("run_steps_ehl covers deterministic "
                               "constitutive models only")
        if self.step is None:
            self._pre_run()
        if self.numerics["adaptive"]:
            # the fast end-pressure kernels are fixed-dt; adaptive runs
            # take the host-exact pass-2 device loop with the dt carry
            self._run_steps_ehl_pass2(n)
            return

        loop = make_ehl_loop(self, dtype=dtype, deform_every=deform_every)
        ed = self.topo.ElasticDeformation
        q, u = loop(jnp.asarray(self.q), jnp.asarray(ed.u_prev),
                    jnp.asarray(self.dt), n)
        q, u = np.asarray(q), np.asarray(u)

        self.q[...] = q
        ed.u_prev = jnp.asarray(u, jnp.asarray(ed.u_prev).dtype)
        shift = u[0, 0] if ed.periodicity in ("half", "none") else 0.
        self.topo.deformation = u - shift
        self.topo.h = self.topo.h_undeformed + (u - shift)
        self.fc.get_real_field("pressure").p[...] = np.asarray(
            _eos(jnp.asarray(self.q[0]), self._solver_cfg.prop))
        self.step += n
        self.simtime += n * self.dt

    def _run_steps_ehl_pass2(self, n):
        """Advance an ELASTIC deterministic problem ``n`` steps with the
        HOST-exact pass-2 deformation protocol as one fused device loop
        (adaptive numerics carry dt in the loop state and refresh it per
        step from the CFL criterion, host-exactly).

        :meth:`run_steps_ehl` deforms from the end-of-step pressure
        (fixed-point equivalent, faster kernels); this path reproduces
        the host ``update()`` sequencing exactly (pass-2 pressure, i==0
        analytic-gradient topography — reference problem.py:565-569 +
        topography.py:424-441) by driving core.ehl.make_gp_ehl_loop with
        every surrogate deterministic.  Used by the :meth:`run`
        auto-route so plain ``run()`` trajectories stay identical to the
        host loop.
        """
        from .core.ehl import make_gp_ehl_loop

        if not self.topo.elastic or self.has_gp_model:
            raise RuntimeError("_run_steps_ehl_pass2 covers deterministic "
                               "elastic problems")

        adaptive = bool(self.numerics["adaptive"])
        dtype = jnp.asarray(self.q).dtype
        n_extra = int(np.asarray(
            self.fc.get_real_field("extra").p).shape[0])
        nf = 6 + n_extra
        gp_state = {"Xscale": jnp.ones((nf,), dtype)}
        loop = make_gp_ehl_loop(self, (None, None, None), nf,
                                (False, False, False), dtype=dtype,
                                adaptive=adaptive)
        ed = self.topo.ElasticDeformation
        out = loop(jnp.asarray(self.q, dtype), jnp.asarray(ed.u_prev),
                   jnp.asarray(self.topo.full, dtype),
                   jnp.asarray(self.dt, dtype),
                   jnp.asarray(self.step, jnp.int32), n, gp_state)
        if adaptive:
            q, u, dt_new, t_inc = out
        else:
            q, u = out
        u = np.asarray(u)

        self.q[...] = np.asarray(q)
        ed.u_prev = jnp.asarray(u, jnp.asarray(ed.u_prev).dtype)
        shift = u[0, 0] if ed.periodicity in ("half", "none") else 0.
        self.topo.deformation = u - shift
        self.topo.h = self.topo.h_undeformed + (u - shift)
        self._refresh_det_fields()
        self.step += n
        if adaptive:
            self.simtime += float(t_inc)
            self.dt = float(dt_new)
        else:
            self.simtime += n * self.dt

    def run_steps_gp_device(self, n, capacity=64, refit_steps=40):
        """EXPERIMENTAL: advance ``n`` fixed-dt GP-surrogate steps fully
        on-device, INCLUDING active learning.

        The production device path is :meth:`run_steps_gp_chunked`, which
        reproduces the host protocol acquisition-for-acquisition.  This
        experiment compiles the whole run — GP predictions,
        variance-tolerance checks, argmax-variance acquisition (MD oracle
        via io_callback, database and dtool packaging unchanged), O(n^2)
        training-set growth and fixed-budget hyperparameter refits — to
        one XLA program (core/al_loop.py), at the cost of two documented
        protocol deviations (normalization frozen at loop entry;
        fixed-budget Adam refits of all surrogates per acquisition) and a
        runtime requirement the production TPU path doesn't have
        (host-callback support: CPU and directly-attached TPU only;
        tunneled/proxied PJRT backends raise UNIMPLEMENTED).

        ``capacity`` bounds the training-set size (static shapes);
        acquisition stops when full.
        """
        import warnings

        from .core.al_loop import (make_gp_al_loop, init_gp_states,
                                   sync_host)

        warnings.warn(
            "run_steps_gp_device is experimental: its active-learning "
            "semantics deviate from the host protocol (frozen "
            "normalization, fixed-budget refits). Use run_steps_gp_chunked "
            "for protocol-exact device-accelerated active learning.",
            stacklevel=2)

        if not self.has_gp_model:
            raise RuntimeError("run_steps_gp_device requires GP surrogates")
        if self.step is None:
            self._pre_run()
        if self.numerics["adaptive"]:
            raise RuntimeError("run_steps_gp_device uses a fixed dt")

        loop = make_gp_al_loop(self, refit_steps=refit_steps)
        gps, pauses = init_gp_states(self, capacity=capacity)
        q, gps, pauses, n_acq = loop(jnp.asarray(self.q), gps, pauses,
                                     jnp.asarray(self.step, jnp.int32),
                                     jnp.asarray(self.dt), n)
        sync_host(self, q, gps, pauses, n)
        return int(n_acq)

    def run_steps_gp_chunked(self, n, capacity=None, n_candidates=None,
                             sharded_mesh=None):
        """Advance ``n`` fixed-dt GP-surrogate steps with HOST-protocol
        active learning and DEVICE-compiled stepping (core/al_chunked.py).

        Between acquisitions the fluid advances inside one compiled
        program; each acquisition is a device round trip in which the
        host runs the unchanged reference protocol — MD oracle through
        ``Database.add_data`` (renormalization included) and scipy-BFGS
        retraining.  Unlike :meth:`run_steps_gp_device` this needs no
        io_callback support, so it runs on tunneled/proxied TPU runtimes,
        and its results match the host path (tests/test_al_chunked.py).

        Elastic problems compose: the compiled advance rebuilds the
        topography from the carried deformation each step and deforms
        from the pass-2 pressure after it — the host ``topo.update()``
        protocol (multiscale EHL, reference problem.py:565-569 +
        topography.py:424-441), verified step-for-step in
        tests/test_al_chunked.py.

        ``sharded_mesh``: decompose the compiled advance over a 2D
        device mesh (multi-chip chunked AL, parallel.al) — the host
        acquisition protocol is unchanged.

        Returns the number of acquisitions.
        """
        from .core.al_chunked import run_gp_al_chunked

        if not self.has_gp_model:
            raise RuntimeError("run_steps_gp_chunked requires GP surrogates")
        if self.step is None:
            self._pre_run()
        if not self._route_uses_al() and sharded_mesh is None:
            # frozen surrogates: the acquisition machinery would never
            # fire — delegate to the whole-run fused loops (the same
            # routing run() applies).  An explicit sharded_mesh keeps
            # the (sharded) chunked advance.
            self.run_steps_gp_fast(n, capacity=capacity)
            return 0
        if self.numerics["adaptive"]:
            raise RuntimeError(
                "adaptive dt with active learning runs the per-step host "
                "protocol loop (plain run() routes it there); the chunked "
                "advance carries a fixed dt between acquisitions")

        return run_gp_al_chunked(self, n, capacity=capacity,
                                 n_candidates=n_candidates,
                                 sharded_mesh=sharded_mesh)

    def run_steps_gp_fast(self, n, capacity=None, chunk=512,
                          use_vmem_loop=None, deform_every=1):
        """Advance ``n`` GP-closed steps with FROZEN surrogates
        as whole-run compiled loops — the temporal-blocked production
        path for the flagship multiscale mode.

        Semantics match the reference's predict() with active learning
        off and an unchanged database (GaPFlow/models/gp.py:435-465): the
        cached (hyperparameters, alpha) re-predict closes every step, no
        retraining occurs.  Surrogates with ``active_learning: True``
        must go through :meth:`run_steps_gp_chunked` (host-protocol
        acquisitions) instead.

        On TPU-covered configurations (fully periodic, f32, no thinning)
        the run advances in ``chunk``-step whole-run-in-VMEM Pallas
        kernels (ops.stencil_gp.make_pallas_gp_loop_fn): the state
        ping-pongs in VMEM and HBM is touched twice per chunk.  Other
        configurations scan the fused XLA GP step on-device.  Syncs q and
        the pressure field afterwards.

        ELASTIC problems compose (multiscale EHL, reference
        problem.py:565-569 + topography.py:424-441): the run takes the
        fused GP x elastic loop (core.ehl.make_gp_ehl_loop) — per step
        the topography is rebuilt from the carried deformation and the
        pass-2 pressure deforms the surface under-relaxed, exactly the
        host ``topo.update()`` sequencing (``deform_every=1``); larger
        ``deform_every`` chunks the FFT updates with the compounded
        relaxation factor (same fixed point, ~K x fewer FFTs).
        """
        from .core.gp_step import make_gp_step_core
        import jax as _jax

        if not self.has_gp_model:
            raise RuntimeError("run_steps_gp_fast requires GP surrogates")
        if self.step is None:
            self._pre_run()
        adaptive = bool(self.numerics["adaptive"])
        gp_state, dims3, use3, caps3, nf, dtype, models = \
            self._frozen_gp_state(capacity)
        cfg = self._solver_cfg
        nx, ny = self.grid["Nx"], self.grid["Ny"]

        q = jnp.asarray(self.q, dtype)
        topo = jnp.asarray(self.topo.full, dtype)
        extra = jnp.asarray(self.fc.get_real_field("extra").p, dtype)
        dt = jnp.asarray(self.dt, dtype)

        if self.topo.elastic:
            from .core.ehl import make_gp_ehl_loop
            ed = self.topo.ElasticDeformation
            loop = make_gp_ehl_loop(self, dims3, nf, use3,
                                    deform_every=(1 if adaptive
                                                  else deform_every),
                                    dtype=dtype, adaptive=adaptive)
            out = loop(q, jnp.asarray(ed.u_prev), topo, dt,
                       jnp.asarray(self.step, jnp.int32), n, gp_state)
            t_inc = None
            if adaptive:
                q, u, dt_new, t_inc = out
                self.dt = float(dt_new)
            else:
                q, u = out
            u = np.asarray(u)
            ed.u_prev = jnp.asarray(u, jnp.asarray(ed.u_prev).dtype)
            shift = u[0, 0] if ed.periodicity in ("half", "none") else 0.
            self.topo.deformation = u - shift
            # h setter refreshes the gradients (host update() sequencing);
            # q syncs below, before the constitutive-field refresh
            self.topo.h = self.topo.h_undeformed + (u - shift)
            self._sync_gp_fast_tail(q, n, models, simtime_inc=t_inc)
            return

        if adaptive:
            # dt rides the loop carry; the whole-run VMEM kernel is
            # fixed-dt by construction, so adaptive runs scan the
            # per-step path (Pallas per-step GP kernel where covered)
            from .core.gp_step import make_gp_adaptive_loop
            loop = make_gp_adaptive_loop(cfg, dims3, nf, use3, int(n))
            q, dt_new, t_inc = loop(q, topo, extra, dt,
                                    jnp.asarray(self.step, jnp.int32),
                                    gp_state)
            self.dt = float(dt_new)
            self._sync_gp_fast_tail(q, n, models,
                                    simtime_inc=float(t_inc))
            return

        kernel_ok = False
        if dtype == jnp.float32 and _jax.default_backend() != "cpu":
            from .ops.stencil_gp import gp_kernel_supported
            kernel_ok = (nx % 8 == 0
                         and gp_kernel_supported(cfg, ny, dims3, use3))
        if use_vmem_loop is None:
            from .ops.stencil_gp import gp_loop_vmem_fits
            use_vmem_loop = (kernel_ok
                             and gp_loop_vmem_fits(cfg, nx, ny, dtype,
                                                   caps3, use3))
            use_hbm_loop = kernel_ok and not use_vmem_loop
        else:
            # explicit override (test hook): True forces the VMEM loop,
            # False forces the XLA scan fallback (no HBM loop either)
            use_hbm_loop = False

        if use_vmem_loop:
            from .ops.stencil_gp import make_pallas_gp_loop_fn
            loops = {}   # one compile per distinct chunk length
            done = 0
            while done < n:
                c = min(chunk, n - done)
                if c not in loops:
                    loops[c] = _jax.jit(make_pallas_gp_loop_fn(
                        cfg, dims3, nf, use3, nx, ny, caps3, c,
                        dtype=dtype))
                q = loops[c](q, topo, extra, dt, gp_state)
                done += c
        elif use_hbm_loop and n >= 4:
            # VMEM-exceeding grids: HBM ping-pong whole-run GP kernel in
            # K_MULTI-multiples; the remainder scans the per-step kernel
            from .ops.stencil_gp import make_pallas_gp_loop_hbm
            from .ops.stencil import K_MULTI
            loops = {}
            done = 0
            nk = (n // K_MULTI) * K_MULTI
            ck = chunk // K_MULTI * K_MULTI or K_MULTI
            while done < nk:
                c = min(ck, nk - done)
                if c not in loops:
                    loops[c] = _jax.jit(make_pallas_gp_loop_hbm(
                        cfg, dims3, nf, use3, nx, ny, caps3, c,
                        dtype=dtype))
                q = loops[c](q, topo, extra, dt, gp_state)
                done += c
            if n - nk:
                step_core = make_gp_step_core(cfg, dims3, nf, use3)

                @_jax.jit
                def rem_steps(q, dt, gp_state):
                    def body(i, qq):
                        qn, _ = step_core(qq, topo, extra, dt,
                                          self.step + nk + i, gp_state)
                        return qn
                    return _jax.lax.fori_loop(0, n - nk, body, q)

                q = rem_steps(q, dt, gp_state)
        else:
            use_bc_kernel = False
            if dtype == jnp.float32 and _jax.default_backend() != "cpu":
                from .ops.stencil_gp import gp_bc_kernel_supported
                use_bc_kernel = (nx % 8 == 0
                                 and gp_bc_kernel_supported(cfg, ny,
                                                            dims3, use3))
            if use_bc_kernel:
                # uniform-D/N domains (the reference's slider GP
                # configurations): scan the q-only bc GP kernel —
                # ~3x the XLA GP step (which materializes the
                # (cap x cells) kernel matrix in HBM each pass).
                # STATIC bound: a traced one lowers to while_loop, and
                # Mosaic kernels inside while_loop wedge the TPU
                # compiler (see core.gp_step.make_gp_adaptive_loop)
                from .ops.stencil_gp import make_pallas_gp_step_bc_fn
                kstep = make_pallas_gp_step_bc_fn(cfg, dims3, nf, use3,
                                                  nx, ny, caps3)

                @_jax.jit
                def scan_steps(q, dt, gp_state):
                    def body(i, qq):
                        return kstep(qq, topo, extra, dt, gp_state)
                    return _jax.lax.fori_loop(0, n, body, q)
            else:
                step_core = make_gp_step_core(cfg, dims3, nf, use3)

                @_jax.jit
                def scan_steps(q, dt, gp_state):
                    def body(i, qq):
                        qn, _ = step_core(qq, topo, extra, dt,
                                          self.step + i, gp_state)
                        return qn
                    return _jax.lax.fori_loop(0, n, body, q)

            q = scan_steps(q, dt, gp_state)

        self._sync_gp_fast_tail(q, n, models)

    def _frozen_gp_state(self, capacity=None, dtype=None):
        """Padded frozen-surrogate device buffers (core.gp_step layout)
        plus the static dims, for whole-run GP-closed loops.

        Requires active learning off on every surrogate (the reference's
        predict() with AL off re-predicts from the cached
        (hyperparameters, alpha) every step and never retrains,
        GaPFlow/models/gp.py:435-465).  Returns
        ``(gp_state, dims3, use3, caps3, num_features, dtype, models)``.
        """
        from .core.al_chunked import _next_capacity
        from .core.al_loop import _surrogate_specs, init_gp_states
        import jax as _jax

        specs = _surrogate_specs(self)
        if any(s.use_al for s in specs.values()):
            raise RuntimeError(
                "active learning is on; run_steps_gp_chunked runs the "
                "host acquisition protocol with compiled stepping")

        db = self.database
        cap = capacity or _next_capacity(db.size)
        gps, _ = init_gp_states(self, cap)
        if dtype is None:
            dtype = jnp.float32 if not _jax.config.jax_enable_x64 \
                else jnp.asarray(self.q).dtype
        gp_state = {"Xscale": jnp.asarray(db.X_scale, dtype)}
        models = {"z": self.pressure, "x": self.wall_stress_xz,
                  "y": self.wall_stress_yz}
        for k, g in gps.items():
            gp_state[f"params_{k}"] = {kk: v.astype(dtype)
                                       for kk, v in g.params.items()}
            gp_state[f"Xfit_{k}"] = g.X.astype(dtype)
            gp_state[f"alpha_{k}"] = g.alpha.astype(dtype)
            gp_state[f"Yscale_{k}"] = jnp.asarray(models[k].Yscale, dtype)

        dims3 = tuple(tuple(m.active_dims) if m.is_gp_model else None
                      for m in (self.pressure, self.wall_stress_xz,
                                self.wall_stress_yz))
        use3 = tuple(m.is_gp_model for m in (self.pressure,
                                             self.wall_stress_xz,
                                             self.wall_stress_yz))
        caps3 = tuple(cap if u else 0 for u in use3)
        return gp_state, dims3, use3, caps3, db.num_features, dtype, models

    def _sync_gp_fast_tail(self, q, n, models, simtime_inc=None):
        """Host sync after a whole-run GP-closed loop: write q back and
        refresh the constitutive fields through the host predict path
        (cached dense conditioning) — bitwise the host trajectory's
        final write, unlike re-deriving p from the padded device alpha.

        ``simtime_inc``: device-accumulated simulated-time increment
        (adaptive-dt loops); defaults to the fixed-dt ``n * dt``."""
        self.q[...] = np.asarray(q)
        self.pressure.update(predictor=False, compute_var=False)
        self.wall_stress_xz.update(predictor=False, compute_var=False)
        self.wall_stress_yz.update(predictor=False, compute_var=False)
        self.bulk_stress.update()
        for m in models.values():
            if m.is_gp_model:
                m._step += n
        self.step += n
        self.simtime += (n * self.dt if simtime_inc is None
                         else float(simtime_inc))

    def _fast_run_eligible(self):
        """The chunked Pallas convergence run applies to float32 (x64 off)
        deterministic, non-elastic problems the fused kernel covers."""
        from .ops import mixed_supported, pallas_supported
        import jax as _jax

        return (not _jax.config.jax_enable_x64
                and _jax.default_backend() == "tpu"
                and not self.has_gp_model and not self.topo.elastic
                and (pallas_supported(self._solver_cfg, self.grid["Ny"])
                     or mixed_supported(self._solver_cfg, self.grid["Ny"],
                                        self.grid["Nx"])))

    def run_compiled_fast(self, max_steps=None, chunk=1024,
                          compensated=True):
        """Whole convergence run through the fused Pallas loop.

        Float32 production path: advances ``chunk`` steps per device call
        through :func:`gapflow_tpu.ops.make_pallas_loop` (compensated
        accumulation by default — required near steady state in f32, see
        examples/validate_f32_production.py), then checks validity and the
        kinetic-energy residual at chunk granularity; with adaptive
        numerics, dt is refreshed from the CFL criterion between chunks
        (with a 0.9 safety factor since it stays frozen within a chunk).
        Convergence = 5 consecutive chunk-averaged residuals below tol,
        mirroring the reference's 5-deep residual buffer at coarser
        granularity.
        """
        import jax
        from .ops import make_pallas_loop
        from .models.eos import eos_sound_velocity

        if self.step is None:
            self._pre_run()
        max_steps = max_steps or self.max_it

        cfg = self._solver_cfg
        loop = make_pallas_loop(cfg, self.grid["Nx"], self.grid["Ny"],
                                compensated=compensated)

        @jax.jit
        def stats(q):
            ekin = jnp.sum((q[1] ** 2 + q[2] ** 2) / q[0] / 2.)
            ok = jnp.all(jnp.isfinite(q)) & (jnp.min(q[0]) > 0.)
            # REFERENCE formula (problem.py:344-347 / core.step.v_max):
            # sqrt(j^2/rho), NOT the physical velocity sqrt(j^2/rho^2) —
            # the CFL criterion is defined with it throughout
            v_max = jnp.sqrt(jnp.max((q[1] ** 2 + q[2] ** 2) / q[0]))
            c_max = jnp.max(eos_sound_velocity(q[0], cfg.prop))
            return ekin, ok, v_max, c_max

        topo = jnp.asarray(self.topo.full)
        extra = jnp.asarray(self.fc.get_real_field("extra").p)
        q = jnp.asarray(self.q)
        q_prev = q
        ekin_old = self.kinetic_energy

        dmin = min(self.grid["dx"], self.grid["dy"])
        while self.step < max_steps and not self._stop:
            n = int(min(chunk, max_steps - self.step))
            q = loop(q, topo, extra, jnp.asarray(self.dt), n)
            ekin, ok, v_max, c_max = stats(q)
            ekin = float(ekin)

            if not bool(ok):
                print("Invalid state (NaN or negative density) detected; "
                      "stopped at the last valid chunk.")
                q = q_prev
                self._stop = True
                break
            q_prev = q

            self.step += n
            self.simtime += n * self.dt
            # CFL from the CURRENT on-device state (self.cfl would read
            # the stale host q, frozen since the loop started)
            cfl_now = self.dt * (float(v_max) + float(c_max)) / dmin
            self.residual = (abs(ekin - ekin_old)
                             / max(ekin_old, 1e-300) / cfl_now / n)
            self.residual_buffer.append(self.residual)
            ekin_old = ekin
            self.kinetic_energy_old = ekin

            if self.numerics["adaptive"]:
                self.dt = float(0.9 * self.numerics["CFL"] * dmin
                                / (float(v_max) + float(c_max)))

            handle_signals(self._receive_signal)
            if self.converged and len(self.residual_buffer) == 5:
                break

        self.q[...] = np.asarray(q)
        self._refresh_det_fields()

    def run_steps_sharded(self, n, mesh=None, use_pallas=None,
                          deform_every=1, capacity=None):
        """Advance ``n`` fixed-dt steps sharded over a 2D device mesh.

        The single multi-chip driver entry (mirroring the reference's
        one ``Problem.run()``, GaPFlow/problem.py:368-410): the state is
        decomposed spatially over the mesh with ppermute halo exchange
        (ICI on TPU pods) and the problem family auto-routes —

        - deterministic: the fused-kernel / XLA halo trajectory;
        - frozen-GP surrogates: training set replicated, test points
          sharded (parallel.gp; fused GP shard kernel on covered f32
          configurations).  Surrogates with active learning take
          :meth:`run_steps_gp_chunked` (``sharded_mesh=mesh``) instead;
        - elastic (EHL): sharded fluid + replicated FFT deformation
          every ``deform_every`` steps (parallel.ehl);
        - GP x elastic: both composed (make_sharded_gp_ehl_loop).

        Requires the interior grid to divide the mesh shape.  Syncs q
        (and the deformation/constitutive state) back to the host
        afterwards.  On covered f32 configurations the per-shard
        stepping runs the FUSED Pallas kernels (parallel.pallas_halo).
        ``use_pallas=None`` auto-routes; False forces the XLA local
        step.  ``capacity`` pads the GP training buffers.
        """
        import jax as _jax
        from .parallel import grid_mesh, make_sharded_trajectory
        from .parallel.halo import shard_problem_arrays

        if self.step is None:
            self._pre_run()
        if (self.numerics["adaptive"] and self.has_gp_model
                and self._route_uses_al()):
            raise RuntimeError(
                "adaptive dt with active learning runs the per-step host "
                "protocol loop; the sharded chunked advance carries a "
                "fixed dt between acquisitions")
        if mesh is None:
            mesh = grid_mesh()

        if self.has_gp_model:
            return self._run_steps_sharded_gp(n, mesh, use_pallas,
                                              deform_every, capacity)
        if self.topo.elastic:
            return self._run_steps_sharded_ehl(n, mesh, use_pallas,
                                               deform_every)

        cfg = self._solver_cfg
        nx, ny = self.grid["Nx"], self.grid["Ny"]
        px, py = mesh.shape["x"], mesh.shape["y"]

        if self.numerics["adaptive"]:
            # deterministic adaptive: the full SimState step with the
            # global CFL reduction per step (ownership-weighted pmax) —
            # the fixed-dt kernel loops would silently freeze dt
            from .parallel import (make_sharded_state_trajectory,
                                   shard_problem_state)
            state = shard_problem_state(self, mesh)
            out = make_sharded_state_trajectory(cfg, mesh, n)(state)
            self.q[:, 1:-1, 1:-1] = np.asarray(out.q)
            self._communicate_ghost_buffers()
            self.step = int(out.step)
            self.simtime = float(out.simtime)
            self.dt = float(out.dt)
            self.residual = float(out.residual)
            self.kinetic_energy_old = float(out.ekin_old)
            return out.q

        if use_pallas is None:
            from .ops.stencil import _edges_uniform
            use_pallas = (not _jax.config.jax_enable_x64
                          and _jax.default_backend() != "cpu"
                          and cfg.thinning is None
                          and cfg.MC_order != 0
                          and _edges_uniform(cfg)
                          and nx % px == 0 and ny % py == 0
                          and (nx // px) % 8 == 0 and (ny // py) % 8 == 0)

        q, topo, extra = shard_problem_arrays(self, mesh)
        if use_pallas:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from .ops.stencil import _fully_periodic
            from .parallel.pallas_halo import (
                make_sharded_pallas_loop, make_sharded_bc_pallas_loop,
                pad_blocks2, pad_blocks2_bc)
            per_x = all(cfg.bc_edge(0)["P"])
            per_y = all(cfg.bc_edge(2)["P"])
            topo_f = np.asarray(self.topo.full, np.float32)
            extra_f = np.asarray(self.fc.get_real_field("extra").p,
                                 np.float32)
            if _fully_periodic(cfg):
                loop = make_sharded_pallas_loop(cfg, mesh, nx, ny)
                t2 = pad_blocks2(topo_f, px, py)
                e2 = pad_blocks2(extra_f, px, py)
            else:
                loop = make_sharded_bc_pallas_loop(cfg, mesh, nx, ny)
                t2 = pad_blocks2_bc(topo_f, px, py, per_x, per_y)
                e2 = pad_blocks2_bc(extra_f, px, py, per_x, per_y)
            spec = NamedSharding(mesh, P(None, "x", "y"))
            q = loop(q.astype(jnp.float32),
                     _jax.device_put(t2, spec), _jax.device_put(e2, spec),
                     jnp.float32(self.dt), n)
        else:
            runner = make_sharded_trajectory(cfg, mesh, n)
            q = runner(q, topo, extra, self.dt)

        self.q[:, 1:-1, 1:-1] = np.asarray(q)
        self._communicate_ghost_buffers()
        self.step += n
        self.simtime += n * self.dt
        return q

    def _run_steps_sharded_gp(self, n, mesh, use_pallas, deform_every,
                              capacity):
        """Frozen-GP (and GP x elastic) family of :meth:`run_steps_sharded`:
        training set replicated, test points sharded."""
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .core.al_loop import _surrogate_specs
        from .parallel.gp import make_sharded_gp_trajectory
        from .parallel.halo import shard_problem_arrays

        if any(s.use_al for s in _surrogate_specs(self).values()):
            # active learning: the host acquisition protocol with the
            # SHARDED compiled advance (multi-chip chunked AL; elastic
            # problems compose — parallel.al._build_sharded_advance)
            return self.run_steps_gp_chunked(n, capacity=capacity,
                                             sharded_mesh=mesh)

        gp_state, dims3, use3, caps3, nf, dtype, models = \
            self._frozen_gp_state(capacity)
        cfg = self._solver_cfg
        nx, ny = self.grid["Nx"], self.grid["Ny"]
        px, py = mesh.shape["x"], mesh.shape["y"]
        if nx % px or ny % py:
            raise RuntimeError("interior grid must divide the mesh shape")

        adaptive = bool(self.numerics["adaptive"])
        t_inc = None
        if self.topo.elastic:
            from .parallel.ehl import make_sharded_gp_ehl_loop
            loop = make_sharded_gp_ehl_loop(
                self, mesh, dims3, nf, use3, caps3,
                deform_every=(1 if adaptive else deform_every),
                use_pallas=use_pallas, adaptive=adaptive)
            ed = self.topo.ElasticDeformation
            q, _, _ = shard_problem_arrays(self, mesh)
            out = loop(q.astype(dtype), jnp.asarray(ed.u_prev),
                       jnp.asarray(self.topo.full, dtype),
                       jnp.asarray(self.dt, dtype), n, gp_state)
            if adaptive:
                q, u, dt_new, t_inc = out
                self.dt = float(dt_new)
            else:
                q, u = out
            u = np.asarray(u)
            ed.u_prev = jnp.asarray(u, jnp.asarray(ed.u_prev).dtype)
            shift = u[0, 0] if ed.periodicity in ("half", "none") else 0.
            self.topo.deformation = u - shift
            self.topo.h = self.topo.h_undeformed + (u - shift)
        elif adaptive:
            # frozen-GP adaptive over the mesh: scanned sharded GP step
            # with the dt carry and the pmax CFL refresh (parallel.gp)
            from .parallel.gp import make_sharded_gp_adaptive_trajectory
            q, topo_b, extra_b = shard_problem_arrays(self, mesh)
            traj = make_sharded_gp_adaptive_trajectory(cfg, dims3, nf,
                                                       use3, mesh, n)
            q, dt_new, t_inc = traj(q.astype(dtype), topo_b.astype(dtype),
                                    extra_b.astype(dtype),
                                    jnp.asarray(self.dt, dtype),
                                    jnp.asarray(self.step, jnp.int32),
                                    gp_state)
            self.dt = float(dt_new)
        else:
            if use_pallas is None:
                from .ops.stencil_gp import gp_kernel_supported
                use_pallas = (not _jax.config.jax_enable_x64
                              and _jax.default_backend() != "cpu"
                              and cfg.MC_order != 0
                              and (nx // px) % 8 == 0
                              and (ny // py) % 8 == 0
                              and gp_kernel_supported(cfg, ny // py,
                                                      dims3, use3))
            q, topo_b, extra_b = shard_problem_arrays(self, mesh)
            if use_pallas:
                from .parallel.pallas_halo import (
                    make_sharded_gp_pallas_loop, pad_blocks2)
                loop = make_sharded_gp_pallas_loop(cfg, mesh, nx, ny,
                                                   dims3, nf, use3, caps3)
                spec = NamedSharding(mesh, P(None, "x", "y"))
                t2 = _jax.device_put(pad_blocks2(
                    np.asarray(self.topo.full, np.float32), px, py), spec)
                e2 = _jax.device_put(pad_blocks2(
                    np.asarray(self.fc.get_real_field("extra").p,
                               np.float32), px, py), spec)
                q = loop(q.astype(jnp.float32), t2, e2,
                         jnp.float32(self.dt), n, gp_state)
            else:
                traj = make_sharded_gp_trajectory(cfg, dims3, nf, use3,
                                                  mesh, n)
                q = traj(q.astype(dtype), topo_b.astype(dtype),
                         extra_b.astype(dtype),
                         jnp.asarray(self.dt, dtype), gp_state)

        self.q[:, 1:-1, 1:-1] = np.asarray(q)
        self._communicate_ghost_buffers()
        # refresh the constitutive fields through the host predict path
        # (cached dense conditioning), as the serial fast paths do
        self.pressure.update(predictor=False, compute_var=False)
        self.wall_stress_xz.update(predictor=False, compute_var=False)
        self.wall_stress_yz.update(predictor=False, compute_var=False)
        self.bulk_stress.update()
        for m in models.values():
            if m.is_gp_model:
                m._step += n
        self.step += n
        self.simtime += (n * self.dt if t_inc is None else float(t_inc))
        return q

    def _run_steps_sharded_ehl(self, n, mesh, use_pallas, deform_every):
        """Deterministic-EHL family of :meth:`run_steps_sharded`:
        sharded fluid + replicated FFT deformation (parallel.ehl)."""
        from .models.eos import eos_pressure as _eos
        from .parallel.ehl import (make_sharded_ehl_loop,
                                   make_sharded_gp_ehl_loop)
        from .parallel.halo import shard_problem_arrays

        ed = self.topo.ElasticDeformation
        adaptive = bool(self.numerics["adaptive"])
        t_inc = None
        if adaptive:
            # deterministic surrogates through the GP-EHL adaptive loop
            # (same end-of-step deformation convention; dt carried with
            # the pmax CFL refresh)
            dtype = jnp.asarray(self.q).dtype
            n_extra = int(np.asarray(
                self.fc.get_real_field("extra").p).shape[0])
            nf = 6 + n_extra
            gp_state = {"Xscale": jnp.ones((nf,), dtype)}
            loop = make_sharded_gp_ehl_loop(
                self, mesh, (None, None, None), nf,
                (False, False, False), (0, 0, 0),
                use_pallas=False, adaptive=True)
            q, _, _ = shard_problem_arrays(self, mesh)
            q, u, dt_new, t_inc = loop(q.astype(dtype),
                                       jnp.asarray(ed.u_prev),
                                       jnp.asarray(self.topo.full, dtype),
                                       jnp.asarray(self.dt, dtype), n,
                                       gp_state)
            self.dt = float(dt_new)
        else:
            loop = make_sharded_ehl_loop(self, mesh,
                                         deform_every=deform_every,
                                         use_pallas=use_pallas)
            q, _, _ = shard_problem_arrays(self, mesh)
            q, u = loop(q, jnp.asarray(ed.u_prev), jnp.asarray(self.dt), n)
        u = np.asarray(u)

        ed.u_prev = jnp.asarray(u, jnp.asarray(ed.u_prev).dtype)
        shift = u[0, 0] if ed.periodicity in ("half", "none") else 0.
        self.topo.deformation = u - shift
        self.topo.h = self.topo.h_undeformed + (u - shift)
        self.q[:, 1:-1, 1:-1] = np.asarray(q)
        self._communicate_ghost_buffers()
        self.fc.get_real_field("pressure").p[...] = np.asarray(
            _eos(jnp.asarray(self.q[0]), self._solver_cfg.prop))
        self.step += n
        self.simtime += (n * self.dt if t_inc is None else float(t_inc))
        return q

    def run_compiled(self, max_steps=None):
        """Run the whole convergence loop on-device (no GP, no elastic).

        Uses ``lax.while_loop`` over the fused step; orders of magnitude
        faster than the host loop for small steps.  Output files get only
        the final frame.
        """
        if self.has_gp_model:
            raise RuntimeError("run_compiled requires a deterministic problem")
        if self.topo.elastic:
            raise RuntimeError("run_compiled does not cover elastic "
                               "problems (the fused loop freezes the "
                               "topography; use update()/run() or core.ehl)")
        if self.step is None:
            self._pre_run()

        runner = make_run_loop(self._solver_cfg, self.tol,
                               max_steps or self.max_it)
        state = self._make_state()
        state = runner(state)
        state.q.block_until_ready()

        if not bool(state.valid):
            print("Invalid state (NaN or negative density) detected; "
                  "stopped at the last valid state.")
            self._stop = True

        self.q[...] = np.asarray(state.q)
        self.step = int(state.step)
        self.simtime = float(state.simtime)
        self.dt = float(state.dt)
        self.residual = float(state.residual)
        self.residual_buffer = deque(
            [float(r) for r in np.asarray(state.residual_buffer)[::-1]
             if np.isfinite(r)], 5)
        self.kinetic_energy_old = float(state.ekin_old)

        self._refresh_det_fields()
        return state

    # ------------------------------------------------------------------
    # I/O
    # ------------------------------------------------------------------

    def write(self, scalars=True, fields=True, params=True):
        if scalars:
            print(f"{self.step:<6d} {self.dt:.4e} {self.simtime:.4e} "
                  f"{self.cfl:.4e} {self.residual:.4e}")
            self.history["step"].append(self.step)
            self.history["time"].append(self.simtime)
            self.history["ekin"].append(self.kinetic_energy)
            self.history["residual"].append(self.residual)
            self.history["vsound"].append(float(self.pressure.v_sound))

        if fields:
            self.file.append_frame().write()
            self._last_written_step = self.step

        if params:
            self.pressure.write()
            self.wall_stress_xz.write()
            self.wall_stress_yz.write()

        if self.prop["elastic"]["enabled"]:
            self.topofile.append_frame().write()

    # ------------------------------------------------------------------
    # Checkpoint / resume
    # ------------------------------------------------------------------

    def save_checkpoint(self, path):
        """Serialize the full solver state for exact resume."""
        from .checkpoint import save_checkpoint
        save_checkpoint(self, path)

    @classmethod
    def from_checkpoint(cls, path):
        """Rebuild a Problem from a checkpoint and continue from its step."""
        from .checkpoint import load_checkpoint
        return load_checkpoint(path, problem_cls=cls)

    # ------------------------------------------------------------------
    # Helpers
    # ------------------------------------------------------------------

    def _select_gp_config(self, gp):
        if gp is None:
            return None, None, None
        if self.grid["dim"] == 1:
            return gp.get("shear"), None, gp.get("press")
        return gp.get("shear"), gp.get("shear"), gp.get("press")

    def _initialize(self, rho0, U, V):
        self.__field.p[0] = rho0
        self.__field.p[1] = rho0 * U / 2.
        self.__field.p[2] = rho0 * V / 2.
        self.kinetic_energy_old = self.kinetic_energy

    # ------------------------------------------------------------------
    # Plotting / animation hooks (delegate to viz)
    # ------------------------------------------------------------------

    def plot(self, ax=None):
        """Plot a snapshot of the current solution and stress state."""
        from .viz.plotting import (_plot_sol_from_field_1d,
                                   _plot_sol_from_field_2d)
        if self.grid["dim"] == 1:
            if ax is not None and getattr(ax, "shape", None) != (2, 3):
                ax = None
            _plot_sol_from_field_1d(
                self.q, self.pressure.pressure,
                self.wall_stress_xz.lower[4], self.wall_stress_xz.upper[4],
                var_press=self.pressure.variance
                if self.pressure.is_gp_model else None,
                var_shear=self.wall_stress_xz.variance
                if self.wall_stress_xz.is_gp_model else None,
                var_tol_press=self.pressure.variance_tol
                if (self.pressure.is_gp_model
                    and self.pressure.use_active_learning) else None,
                var_tol_shear=self.wall_stress_xz.variance_tol
                if (self.wall_stress_xz.is_gp_model
                    and self.wall_stress_xz.use_active_learning) else None,
                ax=ax)
        else:
            if ax is not None and getattr(ax, "shape", None) != (3, 3):
                ax = None
            _plot_sol_from_field_2d(
                self.q, self.pressure.pressure,
                self.wall_stress_xz.lower[4], self.wall_stress_xz.upper[4],
                self.wall_stress_yz.lower[3], self.wall_stress_yz.upper[3],
                var_press=None, var_shear_xz=None, var_shear_yz=None, ax=ax)

    def plot_topo(self, show_defo=False, show_pressure=False):
        """Plot the gap topography (optionally deformed, with pressure)."""
        from .viz.plotting import (_plot_height_1d_from_field,
                                   _plot_height_2d_from_field)
        if self.grid["dim"] == 1:
            _plot_height_1d_from_field(self.topo.full, self.pressure.pressure,
                                       show_defo=show_defo,
                                       show_pressure=show_pressure)
        else:
            _plot_height_2d_from_field(self.topo.full)

    def animate(self, save=False, seconds=10.0):
        """Animate the stored solution time series."""
        from .viz.animations import animate_1d, animate_1d_gp, animate_2d
        if not getattr(self, "step", 0) > 0:
            raise RuntimeError("Cannot animate before running the simulation.")
        if self.options["silent"]:
            raise RuntimeError("Cannot animate in silent mode.")

        filename_sol = os.path.join(self.outdir, "sol.nc")
        filename_topo = os.path.join(self.outdir, "topo.nc")

        if self.grid["Ny"] == 1:
            if self.has_gp_model:
                return animate_1d_gp(filename_sol, seconds=seconds, save=save)
            return animate_1d(filename_sol, filename_topo,
                              seconds=seconds, save=save)
        return animate_2d(filename_sol, seconds=seconds, save=save)
