"""Lennard-Jones confined-fluid MD system.

Writes the state-point variables file (gap height, density, target fluxes)
plus all user MD parameters, and ships the user's run deck and wall
geometry into the run dataset.

Parity: reference GaPFlow/md/lj.py:30-73 (same in.param format and dataset
layout; the deck is executed by the bundled native engine).
"""

import os

from .base import MolecularDynamics
from .utils import read_output_files


class LennardJones(MolecularDynamics):
    """Confined LJ fluid between solid walls."""

    name = "lj"

    def __init__(self, params):
        self.is_mock = False
        self.main_file = "in.run"
        self.num_worker = params["ncpu"]
        self.params = params

    def build_input_files(self, dataset, location, X):
        variables = [
            f"variable\tinput_gap equal {X[3]}",
            f"variable\tinput_dens equal {X[0]}",
            f"variable\tinput_fluxX equal {X[1]}",
            f"variable\tinput_fluxY equal {X[2]}",
        ]

        excluded = ("infile", "wallfile", "ncpu", "system")
        for k, v in self.params.items():
            if k not in excluded:
                variables.append(f"variable\t{k} equal {v}")
        variables.append("variable\tslabfile index in.wall")

        with open(os.path.join(location, "data", "in.param"), "w") as fh:
            fh.write("\n".join(variables) + "\n")

        dataset.put_item(self.params["wallfile"], "in.wall")
        dataset.put_item(self.params["infile"], "in.run")

    def read_output(self):
        return read_output_files()
