"""MD post-processing: wall-stress parsing and autocorrelation error bars.

Parity: reference GaPFlow/md/utils.py:27-218 (same stress_wall.dat layout:
5 columns = 1D [step, pL, tauxzL, pU, tauxzU], 7 columns = 2D adds
[tauyzL, tauyzU]; variance-of-mean via statistical inefficiency,
Chodera et al. JCTC 3 (2007)).
"""

import numpy as np


def _get_MPI_grid(Natoms, size, max_cpu, atoms_per_core=1000):
    """Heuristic Cartesian processor grid for a slab geometry."""
    ncpus = min(max_cpu, Natoms // atoms_per_core)

    ny = size // 2 + size % 2
    if max_cpu < ny ** 2:
        nx = ny = 1
    else:
        nx = ny

    nz = max(ncpus // (nx * ny), 1)
    return (nx, ny, nz)


def read_output_files(fname="stress_wall.dat", sf=1.):
    """Parse a wall-stress time series into the 13-entry (Y, Yerr) vectors."""
    md_data = np.loadtxt(fname) * sf

    Y = np.zeros((13,))
    Yerr = np.zeros((13,))

    cols = md_data.shape[1]
    pressL_t, tauxzL_t = md_data[:, 1], md_data[:, 2]
    pressU_t, tauxzU_t = md_data[:, 3], md_data[:, 4]

    Y[0] = (pressL_t.mean() + pressU_t.mean()) / 2.
    Y[5] = tauxzL_t.mean()
    Y[11] = tauxzU_t.mean()
    Yerr[0] = np.sqrt((variance_of_mean(pressL_t)
                       + variance_of_mean(pressU_t)) / 2.)
    Yerr[5] = np.sqrt(variance_of_mean(tauxzL_t))
    Yerr[11] = np.sqrt(variance_of_mean(tauxzU_t))

    if cols == 7:
        tauyzL_t, tauyzU_t = md_data[:, 5], md_data[:, 6]
        Y[4] = tauyzL_t.mean()
        Y[10] = tauyzU_t.mean()
        Yerr[4] = np.sqrt(variance_of_mean(tauyzL_t))
        Yerr[10] = np.sqrt(variance_of_mean(tauyzU_t))

    return Y, Yerr


def autocorr_func_1d(x):
    """Normalized autocorrelation function via FFT."""
    x = np.array(x, dtype=float)
    n = len(x)
    x -= x.mean()

    fsize = 2 ** int(np.ceil(np.log2(2 * n - 1)))
    x_f = np.fft.fft(x, fsize)
    C = np.fft.ifft(x_f * x_f.conjugate())[:n] / (n - np.arange(n))
    return C.real / C.real[0]


def statistical_inefficiency(timeseries, mintime):
    """g-factor: effective decorrelation length of the series.

    Chodera et al., J. Chem. Theory Comput. 3 (2007).
    """
    N = len(timeseries)
    C_t = autocorr_func_1d(timeseries)
    t_grid = np.arange(N).astype(float)
    g_t = 2.0 * C_t * (1.0 - t_grid / float(N))
    ind = np.where((C_t <= 0) & (t_grid > mintime))[0][0]
    g = 1.0 + g_t[1:ind].sum()
    return max(1.0, g)


def variance_of_mean(timeseries, mintime=1):
    """Variance of the mean of a correlated time series."""
    g = statistical_inefficiency(timeseries, mintime)
    return np.var(timeseries) / len(timeseries) * g
