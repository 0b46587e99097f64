"""Parsers for MD engine output files (log thermo tables, ave/chunk files).

Parity: the LogFile / AvgChunkFile parsers of the reference's vendored
LAMMPS wrapper (reference GaPFlow/_vendor/lammps/formats.py:35-238),
reimplemented for the same file formats, which the bundled nanomd engine
emits as well.
"""

import numpy as np


class LogFile:
    """Thermo tables from an engine log file.

    Collects every table that starts with a header line whose first token
    is 'Step' and ends at the first non-numeric line.  Columns are exposed
    as ``runs`` — a list of dicts mapping column name -> list of values.
    """

    def __init__(self, filename):
        self.filename = filename
        self.runs = []
        self._parse()

    def _parse(self):
        with open(self.filename) as fh:
            lines = fh.readlines()

        current = None
        keys = []
        for line in lines:
            tokens = line.split()
            if not tokens:
                continue
            if tokens[0] == "Step":
                keys = tokens
                current = {k: [] for k in keys}
                self.runs.append(current)
                continue
            if current is not None:
                try:
                    values = [float(t) for t in tokens]
                except ValueError:
                    current = None
                    continue
                if len(values) != len(keys):
                    current = None
                    continue
                for k, v in zip(keys, values):
                    current[k].append(v)


class AvgChunkFile:
    """LAMMPS fix ave/chunk output (e.g. density / velocity z-profiles).

    Header:  three comment lines (fix info, per-frame columns, per-chunk
    columns), then frames of the form::

        <timestep> <n_chunks> <total_count>
          <chunk> <coord1> <ncount> <value...>

    Attributes: ``timesteps``, ``coordinates`` (per frame), ``counts``,
    and ``data`` — dict mapping value-column name to per-frame arrays.
    """

    def __init__(self, filename):
        self.filename = filename
        self.timesteps = []
        self.coordinates = []
        self.counts = []
        self.data = {}
        self._parse()

    def _parse(self):
        with open(self.filename) as fh:
            lines = fh.readlines()

        # third comment line names the per-chunk columns
        value_names = []
        body_start = 0
        ncomments = 0
        for i, line in enumerate(lines):
            if line.startswith("#"):
                ncomments += 1
                if ncomments == 3:
                    cols = line[1:].split()
                    # Chunk Coord1 Ncount <values...>
                    value_names = cols[3:]
                body_start = i + 1
            else:
                break

        self.data = {name: [] for name in value_names}

        i = body_start
        while i < len(lines):
            tokens = lines[i].split()
            if len(tokens) < 3:
                i += 1
                continue
            step, n_chunks = int(float(tokens[0])), int(float(tokens[1]))
            total = float(tokens[2])
            coords = np.zeros(n_chunks)
            counts = np.zeros(n_chunks)
            values = np.zeros((n_chunks, len(value_names)))
            for j in range(n_chunks):
                t = lines[i + 1 + j].split()
                coords[j] = float(t[1])
                counts[j] = float(t[2])
                values[j] = [float(x) for x in t[3:3 + len(value_names)]]

            self.timesteps.append(step)
            self.coordinates.append(coords)
            self.counts.append(counts)
            for k, name in enumerate(value_names):
                self.data[name].append(values[:, k])
            del total
            i += 1 + n_chunks
