"""Checkpoint / resume for simulation state.

The reference has no solver restart capability (reference SURVEY:
data-level resume only, via re-loading MD datasets).  Here the full solver
state — one pytree — serializes to a single .npz plus a YAML of the
sanitized configuration, so a run can resume exactly where it stopped:

    problem.save_checkpoint("run.ckpt")
    ...
    problem = Problem.from_checkpoint("run.ckpt")

GP-mode runs additionally persist the training arrays; the on-disk MD
datasets are re-adopted through the Database as usual.
"""


import numpy as np
import yaml

from .utils import make_dumpable


def _paths(path):
    """(npz_path, yml_path) from either the base path or the .npz file."""
    base = str(path)
    if base.endswith(".npz"):
        base = base[:-4]
    return base + ".npz", base + ".yml"


_SCALARS = ("step", "simtime", "dt", "residual", "kinetic_energy_old",
            "tol", "max_it")


def save_checkpoint(problem, path):
    """Write the problem state to ``path`` (.npz) + ``path.yml`` (config)."""
    if problem.step is None:
        raise RuntimeError("run _pre_run() (or run()) before checkpointing")

    arrays = {
        "q": np.asarray(problem.q),
        "topo": np.asarray(problem.topo.full),
        "extra": np.asarray(problem.fc.get_real_field("extra").p),
        "pressure": np.asarray(problem.pressure.pressure),
        "residual_buffer": np.asarray(list(problem.residual_buffer)),
    }
    for name in _SCALARS:
        arrays[name] = np.asarray(getattr(problem, name))

    db = getattr(problem.pressure, "_database", None)
    if db is not None:
        arrays["db_Xtrain"] = np.asarray(db._Xtrain)
        arrays["db_Ytrain"] = np.asarray(db._Ytrain)
        arrays["db_Yerr"] = np.asarray(db._Ytrain_err)

    npz_path, yml_path = _paths(path)
    np.savez_compressed(npz_path, **arrays)

    config = {
        "options": problem.options,
        "grid": problem.grid,
        "numerics": problem.numerics,
        "geometry": problem.geo,
        "properties": problem.prop,
    }
    if problem.has_gp_model:
        config["gp"] = problem.gp_config
        config["db"] = problem.database.config
        # mock runs rebuild the Mock oracle from properties/geometry
        config["md"] = None if problem.database.has_mock_md \
            else problem.database._md.params
    with open(yml_path, "w") as fh:
        yaml.safe_dump(make_dumpable(config), fh)


def load_checkpoint(path, problem_cls=None):
    """Rebuild a Problem from a checkpoint written by :func:`save_checkpoint`.

    The restored problem is ready for ``run(keep_open=...)`` /
    ``update()`` and continues exactly from the stored step.
    """
    if problem_cls is None:
        from .problem import Problem as problem_cls

    npz_path, yml_path = _paths(path)
    with open(yml_path) as fh:
        config = yaml.safe_load(fh)

    # silence output on restore: the caller decides where new output goes
    options = dict(config["options"])
    options["silent"] = True

    if config.get("gp") is not None:
        # GP-mode restore: rebuild the database/MD stack from the stored
        # sections; the training datasets re-load from the dtool path
        input_dict = {
            "options": options,
            "grid": config["grid"],
            "numerics": config["numerics"],
            "properties": config["properties"],
            "geometry": config["geometry"],
            "gp": config["gp"],
            "db": config["db"],
            "md": config.get("md"),
        }
        problem = problem_cls._from_dict(input_dict)
    else:
        problem = problem_cls(options, config["grid"], config["numerics"],
                              config["properties"], config["geometry"])

    data = np.load(npz_path)

    problem.q[...] = data["q"]
    problem.topo.full[...] = data["topo"]
    problem.fc.get_real_field("extra").p[...] = data["extra"]
    problem.fc.get_real_field("pressure").p[...] = data["pressure"]

    if problem.topo.elastic:
        # exact elastic resume: h = h_undeformed + u, with u in topo
        # channel 3; the under-relaxation state continues from the saved
        # deformation (a fresh Topography would restart it from zero —
        # and asperity geometries would re-draw random heights)
        import jax.numpy as jnp
        problem.topo.h_undeformed = np.asarray(data["topo"][0]
                                               - data["topo"][3])
        problem.topo.ElasticDeformation.u_prev = jnp.asarray(data["topo"][3])

    if problem.has_gp_model and "db_Xtrain" in data:
        # authoritative training set: the dtool datasets may have been
        # moved/cleaned since the checkpoint; restore the exact arrays
        import jax.numpy as jnp
        db = problem.database
        if len(data["db_Xtrain"]) > db.size:
            db._Xtrain = jnp.asarray(data["db_Xtrain"])
            db._Ytrain = jnp.asarray(data["db_Ytrain"])
            db._Ytrain_err = jnp.asarray(data["db_Yerr"])
            db._X_scale = db._normalizer(db._Xtrain)
            db._Y_scale = db._normalizer(db._Ytrain)

    from collections import deque
    problem.step = int(data["step"])
    problem.simtime = float(data["simtime"])
    problem.dt = float(data["dt"])
    problem.residual = float(data["residual"])
    problem.kinetic_energy_old = float(data["kinetic_energy_old"])
    problem.tol = float(data["tol"])
    problem.max_it = int(data["max_it"])
    problem.residual_buffer = deque(
        [float(r) for r in data["residual_buffer"]], 5)

    if problem.has_gp_model:
        # re-fit the surrogates on the restored training set (run() skips
        # _pre_run since step is set, so init must happen here)
        for m in (problem.pressure, problem.wall_stress_xz,
                  problem.wall_stress_yz):
            if m.is_gp_model:
                m.init()
    return problem
