"""Native builder for confined gold/alkane systems.

Assembles the complete molecular system that the reference builds through
the external ``moltemplate.sh`` tool (reference GaPFlow/md/moltemplate.py:
607-727): FCC(111) gold slabs, TraPPE-UA alkane chains replicated on a
grid inside an inflated gap, Lorentz-Berthelot mixed pair coefficients and
the bond/angle/dihedral topology — written directly as a LAMMPS
'full'-style data file plus a nanomd run deck.  No external tools: the
data file is integrated by the bundled native engine
(gapflow_tpu/native/nanomd.cpp, workload confined_mol), which squeezes the
gap to its target height during equilibration exactly like the reference's
in.run.equil.lmp protocol.

Force field (reference examples/lmp/mol/moltemplate_files/trappe1998.lt):

- TraPPE-UA united atoms CH2/CH3/CH4 (Martin & Siepmann 1998)
- harmonic bonds K=120 kcal/mol/A^2, r0=1.54 A
- harmonic angles K=62.0022 kcal/mol/rad^2, theta0=114 deg
- OPLS dihedrals (1.411036, -0.271016, 3.145034, 0)
- special_bonds lj 0 0 0 (1-2/1-3/1-4 exclusions, engine-side)
- gold walls as LJ sites (the reference's pair_style=lj/cut wall option;
  eps=5.29 kcal/mol, sigma=2.629 A), cross terms Lorentz-Berthelot
"""

import os

import numpy as np

from .moltemplate import (_create_fcc_wall, _read_coords_from_lt,
                          config_fluid)

# TraPPE-UA parameters (kcal/mol, Angstrom)
TRAPPE_EPS = {"CH2": 0.091411522, "CH3": 0.194746286, "CH4": 0.294106636}
TRAPPE_SIG = {"CH2": 3.95, "CH3": 3.75, "CH4": 3.73}
TRAPPE_MASS = {"CH2": 14.1707, "CH3": 15.2507, "CH4": 16.3307}
AU_EPS, AU_SIG, AU_MASS = 5.29, 2.629, 196.97

BOND_COEFF = (120.0, 1.54)
ANGLE_COEFF = (62.0022, 114.0)
DIHEDRAL_COEFF = (1.411036, -0.271016, 3.145034, 0.0)

TYPES = ("au", "CH2", "CH3", "CH4")   # data-file types 1..4


def parse_molecule_lt(path):
    """Atom type names, coordinates and bond list of one molecule."""
    names, coords, bonds = [], [], []
    index = {}
    with open(path) as fh:
        for raw in fh:
            parts = raw.split()
            if len(parts) >= 7 and parts[0].startswith("$atom:"):
                index[parts[0][6:]] = len(names)
                names.append(parts[2].split(":")[-1])
                coords.append([float(v) for v in parts[4:7]])
            elif len(parts) == 3 and parts[0].startswith("$bond:"):
                bonds.append((index[parts[1][6:]], index[parts[2][6:]]))
    return names, np.asarray(coords), bonds


def enumerate_topology(bonds, n):
    """Angles (paths of 2 bonds) and dihedrals (paths of 3) from the graph."""
    adj = [[] for _ in range(n)]
    for a, b in bonds:
        adj[a].append(b)
        adj[b].append(a)

    angles = []
    for j in range(n):
        nb = sorted(adj[j])
        for ii in range(len(nb)):
            for kk in range(ii + 1, len(nb)):
                angles.append((nb[ii], j, nb[kk]))

    dihedrals = set()
    for b, c in bonds:
        for a in adj[b]:
            if a == c:
                continue
            for d in adj[c]:
                if d == b or d == a:
                    continue
                key = (a, b, c, d) if (a, b, c, d) <= (d, c, b, a) \
                    else (d, c, b, a)
                dihedrals.add(key)
    return angles, sorted(dihedrals)


def _mixed_pairs():
    """PairIJ table with Lorentz-Berthelot mixing (sqrt eps, mean sigma)."""
    eps = {"au": AU_EPS, **TRAPPE_EPS}
    sig = {"au": AU_SIG, **TRAPPE_SIG}
    rows = []
    for i, ti in enumerate(TYPES):
        for j, tj in enumerate(TYPES):
            if j < i:
                continue
            rows.append((i + 1, j + 1,
                         np.sqrt(eps[ti] * eps[tj]),
                         0.5 * (sig[ti] + sig[tj])))
    return rows


def build_system_data(args, out="system.data",
                      template_dir="moltemplate_files"):
    """Write the LAMMPS data file; returns info needed by the deck writer."""
    target_gap = float(args["gap_height"])
    density = float(args["density"])
    rotation = float(args.get("rotation", 0.))

    nx = args.get("nx", 12)
    slab_top, nx = _create_fcc_wall(nx=nx, ny=args.get("ny"),
                                    nz=args.get("nz", 4),
                                    rotation=rotation)
    slab_bot, _ = _create_fcc_wall(nx=nx, ny=args.get("ny"),
                                   nz=args.get("nz", 4), rotation=0.)
    lx, ly, lz = slab_bot.get_cell_lengths()

    name = args.get("molecule", "pentane")
    molfile = os.path.join(template_dir, f"{name}.lt")
    buffer = 0.1 * lz
    fluid_grid, n_mol, n_fluid_atoms, gap0 = config_fluid(
        molfile, lx, ly, target_gap, density, buffer=buffer)
    mnames, mcoords, mbonds = parse_molecule_lt(molfile)
    mangles, mdihedrals = enumerate_topology(mbonds, len(mnames))
    mcoords = mcoords - mcoords.min(axis=0)

    # assemble atoms: lower slab, upper slab (wall prefix), then fluid
    type_of = {t: k + 1 for k, t in enumerate(TYPES)}
    atoms = []       # (mol_id, type, x, y, z)
    pos_b = slab_bot.get_positions()
    pos_b = pos_b - [0., 0., pos_b[:, 2].min()]
    for p in pos_b:
        atoms.append((1, 1, *p))
    pos_t = slab_top.get_positions()
    pos_t = pos_t - [0., 0., pos_t[:, 2].min()]
    for p in pos_t:
        atoms.append((2, 1, *(p + [0., 0., lz + gap0])))
    n_wall = len(atoms)

    nxf, nyf, nzf = fluid_grid
    ax, ay = lx / nxf, ly / nyf
    az = (gap0 - 2 * buffer) / nzf
    bonds, angles, dihedrals = [], [], []
    placed = 0
    for k in range(nzf):
        for j in range(nyf):
            for i in range(nxf):
                if placed >= n_mol:
                    break
                base = len(atoms)
                off = np.array([i * ax, j * ay,
                                lz + buffer + (k + 0.5) * az])
                for nm, c in zip(mnames, mcoords):
                    atoms.append((3 + placed, type_of[nm], *(c + off)))
                bonds += [(base + a, base + b) for a, b in mbonds]
                angles += [(base + a, base + b, base + c)
                           for a, b, c in mangles]
                dihedrals += [(base + a, base + b, base + c, base + d)
                              for a, b, c, d in mdihedrals]
                placed += 1

    assert placed == n_mol, f"placed {placed} of {n_mol} molecules"
    lzbox = 2 * lz + gap0 + 10.

    with open(out, "w") as fh:
        w = fh.write
        w("confined gold/alkane system (gapflow_tpu.md.molbuild)\n\n")
        w(f"{len(atoms)} atoms\n{len(bonds)} bonds\n"
          f"{len(angles)} angles\n{len(dihedrals)} dihedrals\n\n")
        w(f"{len(TYPES)} atom types\n1 bond types\n"
          "1 angle types\n1 dihedral types\n\n")
        w(f"0.0 {lx:.8f} xlo xhi\n0.0 {ly:.8f} ylo yhi\n"
          f"0.0 {lzbox:.8f} zlo zhi\n\n")

        w("Masses\n\n")
        for k, t in enumerate(TYPES):
            m = AU_MASS if t == "au" else TRAPPE_MASS[t]
            w(f"{k + 1} {m}\n")

        w("\nPairIJ Coeffs\n\n")
        for i, j, e, s in _mixed_pairs():
            w(f"{i} {j} {e:.9f} {s:.6f}\n")

        w("\nBond Coeffs\n\n")
        w(f"1 {BOND_COEFF[0]} {BOND_COEFF[1]}\n")
        w("\nAngle Coeffs\n\n")
        w(f"1 {ANGLE_COEFF[0]} {ANGLE_COEFF[1]}\n")
        w("\nDihedral Coeffs\n\n")
        w("1 " + " ".join(str(v) for v in DIHEDRAL_COEFF) + "\n")

        w("\nAtoms\n\n")
        for aid, (mol, ty, px, py, pz) in enumerate(atoms, 1):
            w(f"{aid} {mol} {ty} 0.0 {px:.6f} {py:.6f} {pz:.6f}\n")

        w("\nBonds\n\n")
        for bid, (a, b) in enumerate(bonds, 1):
            w(f"{bid} 1 {a + 1} {b + 1}\n")
        w("\nAngles\n\n")
        for bid, (a, b, c) in enumerate(angles, 1):
            w(f"{bid} 1 {a + 1} {b + 1} {c + 1}\n")
        w("\nDihedrals\n\n")
        for bid, (a, b, c, d) in enumerate(dihedrals, 1):
            w(f"{bid} 1 {a + 1} {b + 1} {c + 1} {d + 1}\n")

    return {"n_atoms": len(atoms), "n_wall": n_wall, "n_mol": n_mol,
            "gap0": gap0, "box": (lx, ly, lzbox)}


def write_native_deck(args, out="run.in.all"):
    """nanomd deck for the confined molecular workload."""
    # effective wall-fluid offset as in the reference settings writer
    offset = (3.75 + AU_SIG) / 2.
    vwall = float(args.get("vWall", 0.)) * 1e-5  # m/s -> A/fs

    lines = [
        "log log.nanomd",
        "units real",
        f"variable input_gap equal {float(args['gap_height']) + offset}",
        f"variable input_dens equal {float(args['density'])}",
        f"variable input_fluxX equal {float(args.get('fluxX', 0.))}",
        f"variable input_fluxY equal {float(args.get('fluxY', 0.))}",
        f"variable input_temp equal {float(args.get('temperature', 300.))}",
        f"variable vWall equal {vwall}",
        f"variable dt equal {float(args.get('timestep', 1.))}",
        f"variable cutoff equal {float(args.get('cutoff', 11.))}",
        f"variable tinit equal {int(args.get('tinit', args.get('Ninit', 20000)))}",
        f"variable ttherm equal {int(args.get('ttherm', args.get('Nsteady', 20000)))}",
        f"variable tsample equal {int(args.get('tsample', args.get('Nsample', 50000)))}",
        "variable wall_layer equal 2.36",   # half (111) spacing, a=4.08
        f"variable nbinz equal {int(args.get('nbinz', 100))}",
        f"variable Nevery equal {int(args.get('Nevery', 10))}",
        f"variable Nrepeat equal {int(args.get('Nrepeat', 100))}",
        # flux-preserving Berendsen through equilibration (peculiar
        # velocities only), squeeze speed in A/fs (5e-4 = 50 m/s)
        f"variable equil_berendsen equal {int(args.get('equil_berendsen', 1))}",
        f"variable squeeze_speed equal {float(args.get('squeeze_speed', 5e-4))}",
        "variable datafile index system.data",
    ]
    # EAM gold walls (reference default, md/moltemplate.py:134-136): the
    # engine replaces the au-au LJ interaction with the funcfl table
    if str(args.get("wall", "lj/cut")).startswith("eam"):
        eam_file = args.get("eam_file")
        if not eam_file:
            raise ValueError("wall: eam requires an eam_file (funcfl table)")
        lines += [f"variable eamfile index {eam_file}"]
    lines += [
        "workload confined_mol",
        "run_all",
    ]
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
