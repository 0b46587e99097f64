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

    np.savez_compressed(path, **arrays)

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
    with open(str(path) + ".yml", "w") as fh:
        yaml.safe_dump(make_dumpable(config), fh)


def load_checkpoint(path, problem_cls=None):
    """Rebuild a Problem from a checkpoint written by :func:`save_checkpoint`.

    The restored problem is ready for ``run(keep_open=...)`` /
    ``update()`` and continues exactly from the stored step.
    """
    if problem_cls is None:
        from .problem import Problem as problem_cls

    with open(str(path) + ".yml") as fh:
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

    data = np.load(str(path) if str(path).endswith(".npz")
                   else str(path) + ".npz")

    problem.q[...] = data["q"]
    problem.topo.full[...] = data["topo"]
    problem.fc.get_real_field("extra").p[...] = data["extra"]
    problem.fc.get_real_field("pressure").p[...] = data["pressure"]

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
    return problem
