// nanomd: a minimal molecular-dynamics engine for confined fluids
// between solid walls.
//
// Purpose-built native oracle for the gapflow-tpu multiscale loop,
// replacing the vendored LAMMPS build of the reference
// (reference CMakeLists.txt:11-30, GaPFlow/md/runner.py:68-74) for the
// feature subset the framework exercises (examples/lmp/lj/in.lmp and
// examples/lmp/mol/static/*):
//
//   - LJ pair potential, shifted at cutoff, per-type-pair coefficients
//   - molecular systems (TraPPE-UA alkanes between gold walls): LAMMPS
//     'full'-style data files with harmonic bonds/angles, OPLS dihedrals,
//     1-2/1-3/1-4 pair exclusions (special_bonds lj 0 0 0), real units
//   - wall slabs read from a LAMMPS-style data file, frozen outer
//     layers, Langevin-thermostatted inner layers; gap squeezing to the
//     target height during equilibration (reference in.run.equil.lmp)
//   - fluid created at a target density inside the gap
//   - Gaussian-dynamics flux control (LAMMPS fix flow/gauss equivalent):
//     the net force on the fluid group is zeroed each step so the center-
//     of-mass flux set at initialization is an invariant of the motion
//   - staged runs (limited equilibration -> thermalization -> sampling)
//   - wall pressure/shear sampling with ave/time semantics, written to
//     stress_wall.dat in the reference column layout
//
// Interface: a C API (nanomd_create/command/file/...) driven through
// ctypes, with a LAMMPS-ish text deck (variable/include/run_all).
//
// Implementation: cell-list neighbor search with Verlet skin, velocity
// Verlet integration, xorshift RNG, OpenMP-parallel force loop.

#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <random>
#include <sstream>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace nanomd {

static const char* VERSION = "nanomd 1.0 (gapflow-tpu native MD engine)";

struct Vec3 {
    double x = 0, y = 0, z = 0;
};

enum Group : uint8_t {
    FLUID = 0,
    WALL_LO_FROZEN = 1,
    WALL_LO_THERM = 2,
    WALL_HI_FROZEN = 3,
    WALL_HI_THERM = 4,
    WALL_LO_CORE = 5,
    WALL_HI_CORE = 6,
};

static inline bool is_lower_wall(uint8_t g) {
    return g == WALL_LO_FROZEN || g == WALL_LO_THERM || g == WALL_LO_CORE;
}
static inline bool is_upper_wall(uint8_t g) {
    return g == WALL_HI_FROZEN || g == WALL_HI_THERM || g == WALL_HI_CORE;
}
static inline bool is_frozen(uint8_t g) {
    return g == WALL_LO_FROZEN || g == WALL_HI_FROZEN;
}

class Engine {
public:
    explicit Engine(int nthreads) : nthreads_(nthreads), rng_(9377) {
#ifdef _OPENMP
        if (nthreads_ > 0) omp_set_num_threads(nthreads_);
#endif
        set_defaults();
    }

    // ------------------------------------------------------------------
    // Deck interpreter
    // ------------------------------------------------------------------

    int run_file(const std::string& path) {
        std::ifstream in(path);
        if (!in) {
            error_ = "cannot open deck: " + path;
            return 1;
        }
        std::string line;
        while (std::getline(in, line)) {
            if (int rc = command(line)) return rc;
        }
        return 0;
    }

    int command(const std::string& raw) {
        std::string line = strip_comment(raw);
        std::istringstream ss(line);
        std::string word;
        if (!(ss >> word)) return 0;

        try {
            if (word == "variable") {
                std::string name, kw, rest;
                ss >> name >> kw;  // 'equal' or 'index'
                std::getline(ss, rest);
                if (kw == "index") {
                    strings_[name] = trim(rest);
                } else {
                    vars_[name] = eval(trim(rest));
                }
            } else if (word == "include") {
                std::string f;
                ss >> f;
                return run_file(f);
            } else if (word == "log") {
                ss >> logfile_;
            } else if (word == "units") {
                std::string sys;
                ss >> sys;
                set_units(sys);
            } else if (word == "dimension" ||
                       word == "boundary" || word == "pair_style" ||
                       word == "pair_modify" || word == "thermo" ||
                       word == "thermo_style" || word == "thermo_modify" ||
                       word == "processors" || word == "neigh_modify") {
                // accepted for deck compatibility; configuration comes from
                // variables + the workload builder
            } else if (word == "workload") {
                std::string kind;
                ss >> kind;
                if (kind == "confined_lj") {
                    build_confined_lj();
                } else if (kind == "confined_mol") {
                    build_confined_mol();
                } else if (kind == "selftest_bonded") {
                    selftest_bonded();
                } else if (kind == "selftest_eam") {
                    selftest_eam();
                } else {
                    error_ = "unknown workload: " + kind;
                    return 1;
                }
            } else if (word == "run_all") {
                run_all();
            } else if (word == "run") {
                std::string n;
                ss >> n;
                integrate((long)eval(n), /*limit=*/-1., /*berendsen=*/false,
                          /*sample=*/false);
            } else if (word == "print") {
                std::string rest;
                std::getline(ss, rest);
                logmsg(trim(rest));
            } else {
                // unknown commands are ignored (deck compatibility)
            }
        } catch (const std::exception& e) {
            error_ = e.what();
            return 1;
        }
        return 0;
    }

    const char* last_error() const { return error_.c_str(); }

    // ------------------------------------------------------------------
    // System construction
    // ------------------------------------------------------------------

    void build_confined_lj() {
        set_units("lj");
        set_ntypes(2);
        eam_active_ = false;
        bonds_.clear(); angles_.clear(); dihedrals_.clear(); excl_.clear();
        cutoff_ = getvar("cutoff", 2.5);
        temp_ = getvar("temp", 1.0);
        dt_ = getvar("dt", 0.005);

        const double gap = getvar("input_gap", 20.);
        const double dens = getvar("input_dens", 0.8);

        // wall LJ parameters (defaults: gold-argon, reduced; cf. the
        // reference LJ deck's sigAu/epsAu derivation)
        const double mAr = 39.948, sigAr = 3.4, epsAr = 0.238;
        const double mAu = 196.97, epsAu = 5.29;
        const double sigAu = 2.951 * std::pow(2., -1. / 6.);
        const double mW = getvar("mW", mAu / mAr);
        sigWW_ = getvar("sigWW", sigAu / sigAr);
        epsWW_ = getvar("epsWW", epsAu / epsAr);
        sigFW_ = getvar("sigFW", (1. + sigWW_) / 2.);
        epsFW_ = getvar("epsFW", std::sqrt(epsWW_));

        // read lower wall
        std::string wallfile = getstr("slabfile", "in.wall");
        std::vector<Vec3> wall;
        double wall_lx, wall_ly, wzlo, wzhi;
        read_data_file(wallfile, wall, wall_lx, wall_ly, wzlo, wzhi);
        const double thickness = wzhi - wzlo;

        Lx_ = wall_lx;
        Ly_ = wall_ly;
        const double z_top_base = thickness + gap + sigFW_;
        Lz_ = z_top_base + thickness + 1.0;

        // classify wall layers: frozen outermost, thermalized middle band
        const double layer = 1.2 / std::sqrt(3.0);
        const double thermal = (thickness - layer) / 2.;

        x_.clear(); v_.clear(); f_.clear(); group_.clear();
        mass_.clear(); type_.clear();

        auto add_wall_atom = [&](const Vec3& p, bool upper) {
            Vec3 q = p;
            q.z -= wzlo;
            double zl = q.z;  // height within the slab
            if (upper) q.z = z_top_base + q.z;
            uint8_t g;
            if (!upper) {
                if (zl < layer) g = WALL_LO_FROZEN;
                else if (zl < layer + thermal) g = WALL_LO_THERM;
                else g = WALL_LO_CORE;
            } else {
                // mirror: frozen at the outermost (top) layer
                if (zl > thickness - layer) g = WALL_HI_FROZEN;
                else if (zl > thickness - layer - thermal) g = WALL_HI_THERM;
                else g = WALL_HI_CORE;
            }
            x_.push_back(q);
            v_.push_back({});
            f_.push_back({});
            group_.push_back(g);
            mass_.push_back(mW);
            type_.push_back(0);
        };

        for (const auto& p : wall) add_wall_atom(p, false);
        for (const auto& p : wall) add_wall_atom(p, true);
        n_wall_ = x_.size();

        // fluid creation
        const double Vfluid = (gap + sigFW_) * Lx_ * Ly_;
        const long Nf = std::lround(dens * Vfluid);
        const double zlo_f = thickness + sigFW_;
        const double zhi_f = z_top_base - sigFW_;

        // lattice insertion: fill the gap with a simple-cubic grid (plus a
        // small jitter) so no initial pair overlaps -- avoids the force
        // blow-up of random insertion and equilibrates quickly
        {
            const double hz = zhi_f - zlo_f;
            long nx = std::max(1L, std::lround(std::cbrt((double)Nf * Lx_ * Lx_ / (Ly_ * hz))));
            long ny = std::max(1L, std::lround((double)nx * Ly_ / Lx_));
            long nz = (Nf + nx * ny - 1) / (nx * ny);
            double ax = Lx_ / nx, ay = Ly_ / ny, az = hz / nz;
            std::uniform_real_distribution<double> jit(-0.05, 0.05);
            long placed = 0;
            for (long k = 0; k < nz && placed < Nf; ++k)
                for (long j = 0; j < ny && placed < Nf; ++j)
                    for (long i = 0; i < nx && placed < Nf; ++i) {
                        x_.push_back({(i + 0.5) * ax + jit(rng_),
                                      (j + 0.5) * ay + jit(rng_),
                                      zlo_f + (k + 0.5) * az});
                        v_.push_back({});
                        f_.push_back({});
                        group_.push_back(FLUID);
                        mass_.push_back(1.0);
                        type_.push_back(1);
                        ++placed;
                    }
        }
        n_ = x_.size();
        n_fluid_ = n_ - n_wall_;

        // pair table (0=wall, 1=fluid)
        set_pair(0, 0, epsWW_, sigWW_);
        set_pair(1, 1, 1.0, 1.0);
        set_pair(0, 1, epsFW_, sigFW_);

        // Maxwell-Boltzmann fluid velocities at temp, zero net momentum
        std::normal_distribution<double> nd(0., 1.);
        Vec3 psum{};
        double msum = 0.;
        for (size_t i = n_wall_; i < n_; ++i) {
            double s = std::sqrt(temp_ / mass_[i]);
            v_[i] = {s * nd(rng_), s * nd(rng_), s * nd(rng_)};
            psum.x += mass_[i] * v_[i].x;
            psum.y += mass_[i] * v_[i].y;
            psum.z += mass_[i] * v_[i].z;
            msum += mass_[i];
        }
        for (size_t i = n_wall_; i < n_; ++i) {
            v_[i].x -= psum.x / msum;
            v_[i].y -= psum.y / msum;
            v_[i].z -= psum.z / msum;
        }

        gap_ = gap;
        bin_z0_ = thickness;
        bin_dz_ = (gap + sigFW_) / std::max((long)getvar("nbinz", 50), 1L);
        fluid_mass_ = msum;
        built_ = true;
        neigh_valid_ = false;

        logmsg("nanomd: built confined LJ system: " + std::to_string(n_) +
               " atoms (" + std::to_string(n_fluid_) + " fluid), box " +
               std::to_string(Lx_) + " x " + std::to_string(Ly_) + " x " +
               std::to_string(Lz_));
    }

    void build_confined_mol() {
        // Confined molecular system (gold walls + TraPPE-UA alkanes) from a
        // LAMMPS 'full'-style data file written by gapflow_tpu.md.molbuild.
        // Reference protocol: examples/lmp/mol/static/in.settings.lmp +
        // in.run.*.lmp (frozen outer layers, thermalized bands, gap squeeze
        // to the target height during equilibration).
        set_units("real");
        cutoff_ = getvar("cutoff", 11.);
        temp_ = getvar("input_temp", 300.);
        dt_ = getvar("dt", 1.0);

        const double target_gap = getvar("input_gap", 50.);

        std::string datafile = getstr("datafile", "system.data");
        eam_active_ = false;
        read_molecular_data(datafile);

        // EAM gold walls (reference default) when a funcfl table is given;
        // replaces the au-au LJ interaction entirely
        std::string eamfile = getstr("eamfile", "");
        if (!eamfile.empty()) {
            read_funcfl(eamfile);
            set_pair(0, 0, 0., 1.);
        }

        // classify: type 0 (au) = wall, everything else = fluid
        // (the builder writes wall atoms first: lower slab, upper slab)
        double wall_mid = 0.5 * Lz_;
        double lo_zmin = 1e30, lo_zmax = -1e30;
        double hi_zmin = 1e30, hi_zmax = -1e30;
        n_wall_ = 0;
        for (size_t i = 0; i < n_; ++i) {
            if (type_[i] != 0) break;  // contiguous wall prefix
            ++n_wall_;
            if (x_[i].z < wall_mid) {
                lo_zmin = std::min(lo_zmin, x_[i].z);
                lo_zmax = std::max(lo_zmax, x_[i].z);
            } else {
                hi_zmin = std::min(hi_zmin, x_[i].z);
                hi_zmax = std::max(hi_zmax, x_[i].z);
            }
        }
        n_fluid_ = n_ - n_wall_;
        if (n_wall_ == 0 || n_fluid_ == 0)
            throw std::runtime_error("confined_mol: missing wall or fluid");

        const double layer = getvar("wall_layer", 2.4);
        const double lo_thermal = (lo_zmax - lo_zmin - layer) / 2.;
        group_.assign(n_, FLUID);
        for (size_t i = 0; i < n_wall_; ++i) {
            if (x_[i].z < wall_mid) {
                double zl = x_[i].z - lo_zmin;
                if (zl < layer) group_[i] = WALL_LO_FROZEN;
                else if (zl < layer + lo_thermal) group_[i] = WALL_LO_THERM;
                else group_[i] = WALL_LO_CORE;
            } else {
                double zl = hi_zmax - x_[i].z;
                if (zl < layer) group_[i] = WALL_HI_FROZEN;
                else if (zl < layer + lo_thermal) group_[i] = WALL_HI_THERM;
                else group_[i] = WALL_HI_CORE;
            }
        }

        // gap squeeze: move the upper slab down from its inflated build
        // position to the target gap during equilibration
        const double gap0 = hi_zmin - lo_zmax;
        // squeeze speed default 5e-4 A/fs (= 50 m/s): slow enough that the
        // wall thermostats carry the compression heat away
        const double vsq = getvar("squeeze_speed", 5e-4);
        double tsq = getvar("tsqueeze", 0.);
        if (tsq <= 0.)
            tsq = std::ceil(std::max(gap0 - target_gap, 0.) / (vsq * dt_));
        squeeze_steps_ = (long)tsq;
        squeeze_vz_ = squeeze_steps_ > 0
                          ? (gap0 - target_gap) / (squeeze_steps_ * dt_)
                          : 0.;
        equil_extra_ = squeeze_steps_;

        // Maxwell-Boltzmann fluid velocities, zero net momentum
        std::normal_distribution<double> nd(0., 1.);
        Vec3 psum{};
        double msum = 0.;
        for (size_t i = n_wall_; i < n_; ++i) {
            double s = std::sqrt(kB_ * temp_ / (mass_[i] * mvv2e_));
            v_[i] = {s * nd(rng_), s * nd(rng_), s * nd(rng_)};
            psum.x += mass_[i] * v_[i].x;
            psum.y += mass_[i] * v_[i].y;
            psum.z += mass_[i] * v_[i].z;
            msum += mass_[i];
        }
        for (size_t i = n_wall_; i < n_; ++i) {
            v_[i].x -= psum.x / msum;
            v_[i].y -= psum.y / msum;
            v_[i].z -= psum.z / msum;
        }

        gap_ = target_gap;
        bin_z0_ = lo_zmax;
        bin_dz_ = target_gap / std::max((long)getvar("nbinz", 50), 1L);
        lo_face_ = lo_zmax + 1.5;
        hi_face_ = hi_zmin - 1.5;
        reflect_faces_ = true;
        fluid_mass_ = msum;
        built_ = true;
        neigh_valid_ = false;

        logmsg("nanomd: built confined molecular system: " +
               std::to_string(n_) + " atoms (" + std::to_string(n_fluid_) +
               " fluid), " + std::to_string(bonds_.size()) + " bonds, " +
               std::to_string(angles_.size()) + " angles, " +
               std::to_string(dihedrals_.size()) + " dihedrals, gap " +
               std::to_string(gap0) + " -> " + std::to_string(target_gap));
    }

    // finite-difference validation of the bonded forces (workload
    // selftest_bonded): builds a random 6-site chain, compares analytic
    // forces with the numerical gradient of pe_, stores the max error in
    // the 'selftest_err' variable
    void selftest_bonded() {
        set_units("real");
        cutoff_ = 11.;
        set_ntypes(2);
        set_pair(0, 0, 0.1, 3.9);
        set_pair(1, 1, 0.2, 3.7);
        set_pair(0, 1, 0.15, 3.8);

        Lx_ = Ly_ = Lz_ = 200.;
        const int nsite = 6;
        x_.clear(); v_.clear(); f_.clear();
        mass_.clear(); type_.clear(); group_.clear();
        std::uniform_real_distribution<double> u(-0.4, 0.4);
        for (int i = 0; i < nsite; ++i) {
            x_.push_back({100. + 1.25 * i + u(rng_), 100. + u(rng_),
                          100. + 0.8 * (i % 2) + u(rng_)});
            v_.push_back({});
            f_.push_back({});
            mass_.push_back(14.);
            type_.push_back(i % 2);
            group_.push_back(FLUID);
        }
        n_ = nsite; n_wall_ = 0; n_fluid_ = nsite;

        bonds_.clear(); angles_.clear(); dihedrals_.clear();
        bond_coeff_ = {{120., 1.54}};
        angle_coeff_ = {{62.0022, 114. * M_PI / 180.}};
        dihedral_coeff_ = {{1.411036, -0.271016, 3.145034, 0.}};
        if (getvar("st_bonds", 1.) != 0.)
            for (int i = 0; i + 1 < nsite; ++i) bonds_.push_back({i, i + 1, 0});
        if (getvar("st_angles", 1.) != 0.)
            for (int i = 0; i + 2 < nsite; ++i)
                angles_.push_back({i, i + 1, i + 2, 0});
        if (getvar("st_dihedrals", 1.) != 0.)
            for (int i = 0; i + 3 < nsite; ++i)
                dihedrals_.push_back({i, i + 1, i + 2, i + 3, 0});
        if (getvar("st_pairs", 1.) == 0.)
            pairs_.assign(pairs_.size(), {});
        {   // exclusions always from the full chain topology
            std::vector<Bond> all_bonds;
            for (int i = 0; i + 1 < nsite; ++i) all_bonds.push_back({i, i + 1, 0});
            std::swap(bonds_, all_bonds);
            build_exclusions();
            std::swap(bonds_, all_bonds);
        }

        built_ = true;
        neigh_valid_ = false;
        compute_forces();
        std::vector<Vec3> f0 = f_;

        const double h = 1e-6;
        double maxerr = 0.;
        for (int i = 0; i < nsite; ++i) {
            double* comps[3] = {&x_[i].x, &x_[i].y, &x_[i].z};
            double fan[3] = {f0[i].x, f0[i].y, f0[i].z};
            for (int c = 0; c < 3; ++c) {
                double orig = *comps[c];
                *comps[c] = orig + h;
                neigh_valid_ = false;
                compute_forces();
                double ep = pe_;
                *comps[c] = orig - h;
                neigh_valid_ = false;
                compute_forces();
                double em = pe_;
                *comps[c] = orig;
                double fnum = -(ep - em) / (2. * h);
                maxerr = std::max(maxerr, std::fabs(fnum - fan[c]));
            }
        }
        neigh_valid_ = false;
        compute_forces();
        vars_["selftest_err"] = maxerr;
        logmsg("nanomd: bonded selftest max |F_fd - F_analytic| = " +
               std::to_string(maxerr));
        built_ = false;  // selftest system is not runnable
    }

    // finite-difference validation of the EAM forces on a random gold
    // cluster (needs an 'eamfile' variable); max error -> 'selftest_err'
    void selftest_eam() {
        set_units("real");
        cutoff_ = 6.;
        set_ntypes(1);
        set_pair(0, 0, 0., 1.);
        read_funcfl(getstr("eamfile", ""));

        Lx_ = Ly_ = Lz_ = 200.;
        const int nsite = 8;
        x_.clear(); v_.clear(); f_.clear();
        mass_.clear(); type_.clear(); group_.clear();
        std::uniform_real_distribution<double> u(-0.25, 0.25);
        // distorted FCC-ish cluster at first-neighbor distances
        const double d = 2.88;
        for (int i = 0; i < nsite; ++i) {
            x_.push_back({100. + d * (i % 2) + u(rng_),
                          100. + d * ((i / 2) % 2) + u(rng_),
                          100. + d * (i / 4) + u(rng_)});
            v_.push_back({});
            f_.push_back({});
            mass_.push_back(196.97);
            type_.push_back(0);
            group_.push_back(WALL_LO_CORE);
        }
        n_ = nsite; n_wall_ = nsite; n_fluid_ = 0;
        bonds_.clear(); angles_.clear(); dihedrals_.clear(); excl_.clear();

        built_ = true;
        neigh_valid_ = false;
        compute_forces();
        std::vector<Vec3> f0 = f_;

        const double h = 1e-6;
        double maxerr = 0.;
        for (int i = 0; i < nsite; ++i) {
            double* comps[3] = {&x_[i].x, &x_[i].y, &x_[i].z};
            double fan[3] = {f0[i].x, f0[i].y, f0[i].z};
            for (int c = 0; c < 3; ++c) {
                double orig = *comps[c];
                *comps[c] = orig + h;
                neigh_valid_ = false;
                compute_forces();
                double ep = pe_;
                *comps[c] = orig - h;
                neigh_valid_ = false;
                compute_forces();
                double em = pe_;
                *comps[c] = orig;
                double fnum = -(ep - em) / (2. * h);
                maxerr = std::max(maxerr, std::fabs(fnum - fan[c]));
            }
        }
        vars_["selftest_err"] = maxerr;
        logmsg("nanomd: EAM selftest max |F_fd - F_analytic| = " +
               std::to_string(maxerr));
        built_ = false;
        eam_active_ = false;
    }

    // ------------------------------------------------------------------
    // Staged execution
    // ------------------------------------------------------------------

    void status(const std::string& tag) {
        double zmin = 1e30, zmax = -1e30, ke = 0.;
        for (size_t i = n_wall_; i < n_; ++i) {
            zmin = std::min(zmin, x_[i].z);
            zmax = std::max(zmax, x_[i].z);
            ke += 0.5 * mass_[i] *
                  (v_[i].x * v_[i].x + v_[i].y * v_[i].y + v_[i].z * v_[i].z);
        }
        double t = n_fluid_ ? 2. * ke * mvv2e_ / (3. * n_fluid_ * kB_) : 0.;
        char buf[256];
        snprintf(buf, sizeof buf,
                 "%s: step=%ld T=%.3f fluid z=[%.2f, %.2f] "
                 "Fwall_lo=(%.3g, %.3g, %.3g)",
                 tag.c_str(), step_, t, zmin, zmax, wall_force_lo_.x,
                 wall_force_lo_.y, wall_force_lo_.z);
        logmsg(buf);
    }

    void run_all() {
        if (!built_) build_confined_lj();
        // mol systems: keep squeezing through stage 1 (set by the builder)

        const long tinit = (long)getvar("tinit", 5000) + equil_extra_;
        const long ttherm = (long)getvar("ttherm", 5000);
        const long tsample = (long)getvar("tsample", 20000);

        // stage 1: limited-displacement equilibration with Berendsen
        // (extended to cover the gap squeeze for molecular systems)
        status("pre-equil");
        integrate(tinit, /*limit=*/0.1, /*berendsen=*/true, /*sample=*/false);
        status("post-equil");

        // stage 2: impose wall sliding + fluid COM flux, thermalize
        const double vwall = getvar("vWall", 0.);
        for (size_t i = 0; i < n_wall_; ++i)
            if (group_[i] == WALL_LO_FROZEN) v_[i] = {vwall, 0., 0.};

        const double fluxX = getvar("input_fluxX", 0.);
        const double fluxY = getvar("input_fluxY", 0.);
        const double uCOM = fluxX * (Lx_ * Ly_ * gap_) / fluid_mass_;
        const double vCOM = fluxY * (Lx_ * Ly_ * gap_) / fluid_mass_;

        Vec3 mean{};
        for (size_t i = n_wall_; i < n_; ++i) {
            mean.x += v_[i].x;
            mean.y += v_[i].y;
        }
        mean.x /= n_fluid_;
        mean.y /= n_fluid_;
        for (size_t i = n_wall_; i < n_; ++i) {
            v_[i].x += uCOM - mean.x;
            v_[i].y += vCOM - mean.y;
        }

        flux_control_ = true;
        integrate(ttherm, -1., getvar("equil_berendsen", 0.) != 0., false);
        status("post-therm");

        // stage 3: sampling (no scaffolding -- pure LJ wall forces)
        reflect_faces_ = false;
        step_ = 0;
        open_sample_file();
        open_thermo();
        nbinz_ = (long)getvar("nbinz", 50);
        dens_hist_.assign(nbinz_, 0.);
        dens_samples_ = 0;
        integrate(tsample, -1., false, true);
        status("post-sample");
        close_sample_file();
        close_thermo();
        write_density_profile();
    }

    // ------------------------------------------------------------------
    // Introspection (lammps-shim surface)
    // ------------------------------------------------------------------

    static bool has_package(const std::string& p) {
        // genuinely implemented capability groups
        return p == "LJ" || p == "EXTRA-FIX" || p == "WALLS" ||
               p == "MOLECULE";
    }

    long natoms() const { return (long)n_; }
    long nfluid() const { return (long)n_fluid_; }

    void box(double* out) const {  // xlo xhi ylo yhi zlo zhi
        out[0] = 0.; out[1] = Lx_;
        out[2] = 0.; out[3] = Ly_;
        out[4] = 0.; out[5] = Lz_;
    }

    // copy per-atom data (name: x | v | f) into out[3*natoms]
    int gather(const std::string& name, double* out) const {
        const std::vector<Vec3>* src = nullptr;
        if (name == "x") src = &x_;
        else if (name == "v") src = &v_;
        else if (name == "f") src = &f_;
        else return 1;
        for (size_t i = 0; i < n_; ++i) {
            out[3 * i] = (*src)[i].x;
            out[3 * i + 1] = (*src)[i].y;
            out[3 * i + 2] = (*src)[i].z;
        }
        return 0;
    }

    double global(const std::string& name) const {
        if (name == "dt") return dt_;
        if (name == "natoms") return (double)n_;
        if (name == "step") return (double)step_;
        if (name == "temp") return temp_;
        if (name == "cutoff") return cutoff_;
        if (name == "pe") return pe_;
        return getvar(name, 0.);
    }

private:
    // -- deck helpers -------------------------------------------------------
    static std::string strip_comment(const std::string& s) {
        auto pos = s.find('#');
        return pos == std::string::npos ? s : s.substr(0, pos);
    }

    static std::string trim(const std::string& s) {
        size_t a = s.find_first_not_of(" \t\r\n");
        if (a == std::string::npos) return "";
        size_t b = s.find_last_not_of(" \t\r\n");
        return s.substr(a, b - a + 1);
    }

    double getvar(const std::string& name, double dflt) const {
        auto it = vars_.find(name);
        return it == vars_.end() ? dflt : it->second;
    }

    std::string getstr(const std::string& name, const std::string& dflt) const {
        auto it = strings_.find(name);
        return it == strings_.end() ? dflt : it->second;
    }

    // Tiny expression evaluator: numbers, ${name}, v_name, + - * / ( ) ^
    double eval(const std::string& expr) const {
        std::string s = substitute(expr);
        size_t pos = 0;
        double val = parse_sum(s, pos);
        return val;
    }

    std::string substitute(const std::string& in) const {
        std::string out;
        for (size_t i = 0; i < in.size();) {
            if (in[i] == '$' && i + 1 < in.size() && in[i + 1] == '{') {
                size_t e = in.find('}', i);
                std::string name = in.substr(i + 2, e - i - 2);
                out += std::to_string(getvar(name, 0.));
                i = e + 1;
            } else if (in.compare(i, 2, "v_") == 0) {
                size_t e = i + 2;
                while (e < in.size() && (isalnum(in[e]) || in[e] == '_')) ++e;
                out += std::to_string(getvar(in.substr(i + 2, e - i - 2), 0.));
                i = e;
            } else {
                out += in[i++];
            }
        }
        return out;
    }

    static void skip_ws(const std::string& s, size_t& p) {
        while (p < s.size() && isspace((unsigned char)s[p])) ++p;
    }

    static double parse_sum(const std::string& s, size_t& p) {
        double v = parse_prod(s, p);
        for (;;) {
            skip_ws(s, p);
            if (p < s.size() && (s[p] == '+' || s[p] == '-')) {
                char op = s[p++];
                double r = parse_prod(s, p);
                v = op == '+' ? v + r : v - r;
            } else {
                return v;
            }
        }
    }

    static double parse_prod(const std::string& s, size_t& p) {
        double v = parse_pow(s, p);
        for (;;) {
            skip_ws(s, p);
            if (p < s.size() && (s[p] == '*' || s[p] == '/')) {
                char op = s[p++];
                double r = parse_pow(s, p);
                v = op == '*' ? v * r : v / r;
            } else {
                return v;
            }
        }
    }

    static double parse_pow(const std::string& s, size_t& p) {
        double v = parse_atom(s, p);
        skip_ws(s, p);
        if (p < s.size() && s[p] == '^') {
            ++p;
            double e = parse_pow(s, p);
            return std::pow(v, e);
        }
        return v;
    }

    static double parse_atom(const std::string& s, size_t& p) {
        skip_ws(s, p);
        if (p < s.size() && s[p] == '(') {
            ++p;
            double v = parse_sum(s, p);
            skip_ws(s, p);
            if (p < s.size() && s[p] == ')') ++p;
            return v;
        }
        if (p < s.size() && (s[p] == '-' || s[p] == '+')) {
            char sign = s[p++];
            double v = parse_atom(s, p);
            return sign == '-' ? -v : v;
        }
        // sqrt( handled as function
        if (s.compare(p, 5, "sqrt(") == 0) {
            p += 5;
            double v = parse_sum(s, p);
            if (p < s.size() && s[p] == ')') ++p;
            return std::sqrt(v);
        }
        size_t e = p;
        while (e < s.size() && (isdigit((unsigned char)s[e]) || s[e] == '.' ||
                                s[e] == 'e' || s[e] == 'E' ||
                                ((s[e] == '-' || s[e] == '+') && e > p &&
                                 (s[e - 1] == 'e' || s[e - 1] == 'E'))))
            ++e;
        double v = std::stod(s.substr(p, e - p));
        p = e;
        return v;
    }

    // -- data file reader ---------------------------------------------------
    void read_data_file(const std::string& path, std::vector<Vec3>& atoms,
                        double& lx, double& ly, double& zlo, double& zhi) {
        std::ifstream in(path);
        if (!in) throw std::runtime_error("cannot open wall file: " + path);

        std::string line;
        long natoms = 0;
        double xlo = 0, xhi = 0, ylo = 0, yhi = 0;
        zlo = 0;
        zhi = 0;
        bool in_atoms = false;

        while (std::getline(in, line)) {
            std::string t = trim(strip_comment(line));
            if (t.empty()) continue;
            std::istringstream ss(t);

            if (t.find("atoms") != std::string::npos &&
                t.find("types") == std::string::npos) {
                ss >> natoms;
            } else if (t.find("xlo xhi") != std::string::npos) {
                ss >> xlo >> xhi;
            } else if (t.find("ylo yhi") != std::string::npos) {
                ss >> ylo >> yhi;
            } else if (t.find("zlo zhi") != std::string::npos) {
                ss >> zlo >> zhi;
            } else if (t.rfind("Atoms", 0) == 0) {
                in_atoms = true;
            } else if (in_atoms) {
                long id, type;
                double px, py, pz;
                if (ss >> id >> type >> px >> py >> pz)
                    atoms.push_back({px, py, pz});
                if ((long)atoms.size() == natoms) in_atoms = false;
            }
        }
        lx = xhi - xlo;
        ly = yhi - ylo;

        // actual slab extent
        if (!atoms.empty()) {
            zlo = atoms[0].z;
            zhi = atoms[0].z;
            for (const auto& a : atoms) {
                zlo = std::min(zlo, a.z);
                zhi = std::max(zhi, a.z);
            }
        }
    }

    // -- molecular data file (atom_style full) -------------------------------
    void read_molecular_data(const std::string& path) {
        std::ifstream in(path);
        if (!in) throw std::runtime_error("cannot open data file: " + path);

        long natoms = 0, nbonds = 0, nangles = 0, ndihedrals = 0;
        int ntypes = 0, nbt = 0, nat = 0, ndt = 0;
        double xlo = 0, xhi = 0, ylo = 0, yhi = 0, zlo = 0, zhi = 0;
        std::vector<double> type_mass;

        x_.clear(); v_.clear(); f_.clear();
        mass_.clear(); type_.clear(); group_.clear();
        bonds_.clear(); angles_.clear(); dihedrals_.clear();

        enum Section { NONE, MASSES, PAIRIJ, BONDC, ANGLEC, DIHEDC,
                       ATOMS, BONDS, ANGLES, DIHEDRALS } sec = NONE;
        std::string line;
        std::getline(in, line);  // header comment
        std::vector<std::array<double, 7>> atom_rows;

        while (std::getline(in, line)) {
            std::string t = trim(strip_comment(line));
            if (t.empty()) continue;

            if (t.rfind("Masses", 0) == 0) { sec = MASSES; continue; }
            if (t.rfind("PairIJ Coeffs", 0) == 0) { sec = PAIRIJ; continue; }
            if (t.rfind("Bond Coeffs", 0) == 0) { sec = BONDC; continue; }
            if (t.rfind("Angle Coeffs", 0) == 0) { sec = ANGLEC; continue; }
            if (t.rfind("Dihedral Coeffs", 0) == 0) { sec = DIHEDC; continue; }
            if (t.rfind("Atoms", 0) == 0) { sec = ATOMS; continue; }
            if (t.rfind("Bonds", 0) == 0) { sec = BONDS; continue; }
            if (t.rfind("Angles", 0) == 0) { sec = ANGLES; continue; }
            if (t.rfind("Dihedrals", 0) == 0) { sec = DIHEDRALS; continue; }

            std::istringstream ss(t);
            if (sec == NONE) {
                if (t.find("atoms") != std::string::npos) ss >> natoms;
                else if (t.find("bond types") != std::string::npos) ss >> nbt;
                else if (t.find("angle types") != std::string::npos) ss >> nat;
                else if (t.find("dihedral types") != std::string::npos) ss >> ndt;
                else if (t.find("atom types") != std::string::npos) ss >> ntypes;
                else if (t.find("bonds") != std::string::npos) ss >> nbonds;
                else if (t.find("angles") != std::string::npos) ss >> nangles;
                else if (t.find("dihedrals") != std::string::npos) ss >> ndihedrals;
                else if (t.find("xlo xhi") != std::string::npos) ss >> xlo >> xhi;
                else if (t.find("ylo yhi") != std::string::npos) ss >> ylo >> yhi;
                else if (t.find("zlo zhi") != std::string::npos) ss >> zlo >> zhi;
                if (ntypes && pairs_.size() != (size_t)ntypes * ntypes) {
                    set_ntypes(ntypes);
                    type_mass.assign(ntypes, 1.);
                    bond_coeff_.assign(std::max(nbt, 1), {});
                    angle_coeff_.assign(std::max(nat, 1), {});
                    dihedral_coeff_.assign(std::max(ndt, 1), {});
                }
            } else if (sec == MASSES) {
                int ty; double m;
                ss >> ty >> m;
                type_mass[ty - 1] = m;
            } else if (sec == PAIRIJ) {
                int ti, tj; double eps, sig;
                ss >> ti >> tj >> eps >> sig;
                set_pair(ti - 1, tj - 1, eps, sig);
            } else if (sec == BONDC) {
                int ty; double K, r0;
                ss >> ty >> K >> r0;
                bond_coeff_[ty - 1] = {K, r0};
            } else if (sec == ANGLEC) {
                int ty; double K, th0;
                ss >> ty >> K >> th0;
                angle_coeff_[ty - 1] = {K, th0 * M_PI / 180.};
            } else if (sec == DIHEDC) {
                int ty; double k1, k2, k3, k4;
                ss >> ty >> k1 >> k2 >> k3 >> k4;
                dihedral_coeff_[ty - 1] = {k1, k2, k3, k4};
            } else if (sec == ATOMS) {
                // id mol type q x y z  (ids 1..N, written in order)
                double id, mol, ty, q, px, py, pz;
                ss >> id >> mol >> ty >> q >> px >> py >> pz;
                atom_rows.push_back({id, mol, ty, q, px, py, pz});
            } else if (sec == BONDS) {
                long id; int ty, a, b;
                ss >> id >> ty >> a >> b;
                bonds_.push_back({a - 1, b - 1, ty - 1});
            } else if (sec == ANGLES) {
                long id; int ty, a, b, c;
                ss >> id >> ty >> a >> b >> c;
                angles_.push_back({a - 1, b - 1, c - 1, ty - 1});
            } else if (sec == DIHEDRALS) {
                long id; int ty, a, b, c, d;
                ss >> id >> ty >> a >> b >> c >> d;
                dihedrals_.push_back({a - 1, b - 1, c - 1, d - 1, ty - 1});
            }
        }

        if ((long)atom_rows.size() != natoms)
            throw std::runtime_error("data file: atom count mismatch");

        // place atoms at their id position (ids are 1..N)
        x_.assign(natoms, {});
        v_.assign(natoms, {});
        f_.assign(natoms, {});
        type_.assign(natoms, 0);
        mass_.assign(natoms, 1.);
        for (const auto& r : atom_rows) {
            long i = (long)r[0] - 1;
            type_[i] = (int)r[2] - 1;
            mass_[i] = type_mass[type_[i]];
            x_[i] = {r[4] - xlo, r[5] - ylo, r[6] - zlo};
        }
        n_ = natoms;
        Lx_ = xhi - xlo;
        Ly_ = yhi - ylo;
        Lz_ = zhi - zlo;

        build_exclusions();
    }

    void build_exclusions() {
        // 1-2, 1-3 and 1-4 neighbors along the bond graph
        // (special_bonds lj 0.0 0.0 0.0 in the reference init)
        std::vector<std::vector<int>> adj(n_);
        for (const Bond& b : bonds_) {
            adj[b.a].push_back(b.b);
            adj[b.b].push_back(b.a);
        }
        excl_.assign(n_, {});
        for (size_t i = 0; i < n_; ++i) {
            std::vector<int> seen = {(int)i};
            std::vector<int> frontier = {(int)i};
            for (int depth = 0; depth < 3; ++depth) {
                std::vector<int> nxt;
                for (int a : frontier)
                    for (int b : adj[a]) {
                        bool have = false;
                        for (int s : seen)
                            if (s == b) { have = true; break; }
                        if (!have) {
                            seen.push_back(b);
                            nxt.push_back(b);
                            excl_[i].push_back(b);
                        }
                    }
                frontier.swap(nxt);
            }
        }
        bool any = false;
        for (const auto& e : excl_)
            if (!e.empty()) { any = true; break; }
        if (!any) excl_.clear();
    }

    // -- EAM (gold walls; funcfl single-element tables) -----------------
    //
    // The reference's default wall potential is pair_style eam with the
    // Foiles Au universal-3 funcfl table (reference md/moltemplate.py:
    // 134-136).  funcfl files are in metal units (eV, A); energies are
    // converted to kcal/mol on read.  phi(r) = 27.2*0.529*Z(r)^2/r.

    struct Table {
        std::vector<double> y, yp;
        double dx = 1.;
        int n = 0;

        void build(const std::vector<double>& v, double dx_) {
            y = v;
            dx = dx_;
            n = (int)v.size();
            yp.assign(n, 0.);
            for (int i = 1; i + 1 < n; ++i)
                yp[i] = (y[i + 1] - y[i - 1]) / (2. * dx);
            if (n > 1) {
                yp[0] = (y[1] - y[0]) / dx;
                yp[n - 1] = (y[n - 1] - y[n - 2]) / dx;
            }
        }

        // cubic Hermite value + derivative
        inline void eval(double x, double& val, double& der) const {
            double s = x / dx;
            int i = (int)s;
            if (i < 0) i = 0;
            if (i > n - 2) i = n - 2;
            double t = s - i;
            double h00 = (1. + 2. * t) * (1. - t) * (1. - t);
            double h10 = t * (1. - t) * (1. - t);
            double h01 = t * t * (3. - 2. * t);
            double h11 = t * t * (t - 1.);
            val = h00 * y[i] + h10 * dx * yp[i] + h01 * y[i + 1] +
                  h11 * dx * yp[i + 1];
            double d00 = 6. * t * (t - 1.);
            double d10 = (1. - t) * (1. - 3. * t);
            double d01 = -d00;
            double d11 = t * (3. * t - 2.);
            der = (d00 * y[i] + d01 * y[i + 1]) / dx + d10 * yp[i] +
                  d11 * yp[i + 1];
        }
    };

    void read_funcfl(const std::string& path) {
        std::ifstream in(path);
        if (!in) throw std::runtime_error("cannot open EAM table: " + path);
        const double EV2KCAL = 23.060549;

        std::string line;
        std::getline(in, line);  // comment
        std::getline(in, line);  // Z, mass, a0, structure
        double Zat = 79.;
        { std::istringstream ss(line); ss >> Zat; }
        std::getline(in, line);
        long nrho, nr;
        double drho, dr;
        {
            std::istringstream ss(line);
            ss >> nrho >> drho >> nr >> dr >> eam_rc_;
        }
        auto read_vals = [&](long count) {
            std::vector<double> v;
            v.reserve(count);
            double x;
            while ((long)v.size() < count && in >> x) v.push_back(x);
            if ((long)v.size() != count)
                throw std::runtime_error("truncated EAM table: " + path);
            return v;
        };
        std::vector<double> F = read_vals(nrho);   // eV
        std::vector<double> Zr = read_vals(nr);    // effective charge
        std::vector<double> rho = read_vals(nr);   // density

        for (double& v : F) v *= EV2KCAL;
        // phi(r) = 27.2*0.529*Z(r)^2/r  [eV]; store r*phi (finite at r=0)
        std::vector<double> rphi(nr);
        for (long i = 0; i < nr; ++i)
            rphi[i] = 27.2 * 0.529 * Zr[i] * Zr[i] * EV2KCAL;

        eam_F_.build(F, drho);
        eam_rho_.build(rho, dr);
        eam_rphi_.build(rphi, dr);
        eam_rc2_ = eam_rc_ * eam_rc_;
        eam_active_ = true;
        logmsg("nanomd: EAM table loaded: " + path);
    }

    // density + embedding pre-pass over the wall atoms (au-au only)
    void eam_prepass() {
        eam_fp_.assign(n_wall_, 0.);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 16)
#endif
        for (long i = 0; i < (long)n_wall_; ++i) {
            if (type_[i] != 0) continue;
            int c = cell_of_[i];
            int cz = c / (nbx_ * nby_);
            int cy = (c / nbx_) % nby_;
            int cx = c % nbx_;
            double rho_i = 0.;
            for (int dz = -1; dz <= 1; ++dz) {
                int zz = cz + dz;
                if (zz < 0 || zz >= nbz_) continue;
                for (int dy = -1; dy <= 1; ++dy) {
                    int yy = (cy + dy + nby_) % nby_;
                    for (int dx = -1; dx <= 1; ++dx) {
                        int xx = (cx + dx + nbx_) % nbx_;
                        int cc = (zz * nby_ + yy) * nbx_ + xx;
                        if (visited_nb(cx, cy, cz, cc, dx, dy, dz)) continue;
                        for (long j = head_[cc]; j >= 0; j = next_[j]) {
                            if (j == i || type_[j] != 0) continue;
                            double ddx = mix(x_[i].x - x_[j].x, Lx_);
                            double ddy = mix(x_[i].y - x_[j].y, Ly_);
                            double ddz = x_[i].z - x_[j].z;
                            double r2 = ddx * ddx + ddy * ddy + ddz * ddz;
                            if (r2 >= eam_rc2_ || r2 < 1e-12) continue;
                            double val, der;
                            eam_rho_.eval(std::sqrt(r2), val, der);
                            rho_i += val;
                        }
                    }
                }
            }
            double Fv, Fp;
            eam_F_.eval(rho_i, Fv, Fp);
            eam_fp_[i] = Fp;
#ifdef _OPENMP
#pragma omp atomic
#endif
            pe_ += Fv;
        }
    }

    // guard against double-visiting periodic-folded neighbor cells
    // (same dedup rule as the force loop, expressed per offset)
    inline bool visited_nb(int cx, int cy, int cz, int cc,
                           int dx, int dy, int dz) const {
        // visit each distinct cell once: accept only the first offset
        // triple that maps to cc by scanning offsets in order
        for (int z2 = -1; z2 <= dz; ++z2) {
            int zz = cz + z2;
            if (zz < 0 || zz >= nbz_) continue;
            int ylim = (z2 == dz) ? dy : 1;
            for (int y2 = -1; y2 <= ylim; ++y2) {
                int yy = (cy + y2 + nby_) % nby_;
                int xlim = (z2 == dz && y2 == dy) ? dx - 1 : 1;
                for (int x2 = -1; x2 <= xlim; ++x2) {
                    int xx = (cx + x2 + nbx_) % nbx_;
                    if ((zz * nby_ + yy) * nbx_ + xx == cc) return true;
                }
            }
        }
        return false;
    }

    // -- pair interactions --------------------------------------------------
    void set_ntypes(int n) {
        ntypes_ = n;
        pairs_.assign((size_t)n * n, {});
    }

    void set_pair(int ti, int tj, double eps, double sig) {
        // reference uses one global cutoff (2.5 sigma LJ / 11 A real) for
        // all pairs
        double s6 = std::pow(sig, 6);
        double rc = cutoff_;
        double rc6 = std::pow(rc, 6);
        double shift = 4. * eps * (s6 * s6 / (rc6 * rc6) - s6 / rc6);
        pairs_[(size_t)ti * ntypes_ + tj] =
            pairs_[(size_t)tj * ntypes_ + ti] =
                {4. * eps * s6 * s6, 4. * eps * s6, rc * rc, shift};
    }

    struct PairCoeff {
        double c12 = 0, c6 = 0, rc2 = 0, shift = 0;
    };

    void set_units(const std::string& sys) {
        if (sys == "real") {
            // LAMMPS 'real' constants: kcal/mol, g/mol, Angstrom, fs, K
            mvv2e_ = 48.88821291 * 48.88821291;
            ftm2v_ = 1. / mvv2e_;
            kB_ = 0.0019872067;
        } else {  // lj
            mvv2e_ = 1.;
            ftm2v_ = 1.;
            kB_ = 1.;
        }
    }

    // -- neighbor lists -----------------------------------------------------
    void build_cells() {
        const double skin = 0.3;
        bin_ = cutoff_ + skin;
        nbx_ = std::max(1, (int)(Lx_ / bin_));
        nby_ = std::max(1, (int)(Ly_ / bin_));
        nbz_ = std::max(1, (int)(Lz_ / bin_));
        bx_ = Lx_ / nbx_;
        by_ = Ly_ / nby_;
        bz_ = Lz_ / nbz_;

        cell_of_.assign(n_, 0);
        head_.assign((size_t)nbx_ * nby_ * nbz_, -1);
        next_.assign(n_, -1);

        for (size_t i = 0; i < n_; ++i) {
            int cx = (int)(pbcx(x_[i].x) / bx_) % nbx_;
            int cy = (int)(pbcy(x_[i].y) / by_) % nby_;
            int cz = std::min((int)(x_[i].z / bz_), nbz_ - 1);
            if (cz < 0) cz = 0;
            int c = (cz * nby_ + cy) * nbx_ + cx;
            cell_of_[i] = c;
            next_[i] = head_[c];
            head_[c] = (long)i;
        }

        x_ref_ = x_;
        neigh_valid_ = true;
    }

    bool need_rebuild() const {
        if (!neigh_valid_) return true;
        const double lim = 0.15 * 0.15;  // (skin/2)^2
        for (size_t i = 0; i < n_; ++i) {
            double dx = x_[i].x - x_ref_[i].x;
            double dy = x_[i].y - x_ref_[i].y;
            double dz = x_[i].z - x_ref_[i].z;
            if (dx * dx + dy * dy + dz * dz > lim) return true;
        }
        return false;
    }

    inline double pbcx(double v) const {
        v = std::fmod(v, Lx_);
        return v < 0 ? v + Lx_ : v;
    }
    inline double pbcy(double v) const {
        v = std::fmod(v, Ly_);
        return v < 0 ? v + Ly_ : v;
    }
    inline double mix(double d, double L) const {
        if (d > 0.5 * L) return d - L;
        if (d < -0.5 * L) return d + L;
        return d;
    }

    // -- force computation --------------------------------------------------
    // -- bonded interactions (TraPPE-UA alkanes) ------------------------
    inline Vec3 delta(int i, int j) const {
        // r_i - r_j with x/y minimum image (z is non-periodic)
        return {mix(x_[i].x - x_[j].x, Lx_), mix(x_[i].y - x_[j].y, Ly_),
                x_[i].z - x_[j].z};
    }

    void compute_bonded() {
        if (bonds_.empty() && angles_.empty() && dihedrals_.empty()) return;

        // harmonic bonds: E = K (r - r0)^2
        for (const Bond& b : bonds_) {
            const auto& c = bond_coeff_[b.t];
            Vec3 d = delta(b.a, b.b);
            double r = std::sqrt(d.x * d.x + d.y * d.y + d.z * d.z);
            double dr = r - c[1];
            pe_ += c[0] * dr * dr;
            double fb = r > 1e-12 ? -2. * c[0] * dr / r : 0.;
            f_[b.a].x += fb * d.x; f_[b.a].y += fb * d.y; f_[b.a].z += fb * d.z;
            f_[b.b].x -= fb * d.x; f_[b.b].y -= fb * d.y; f_[b.b].z -= fb * d.z;
        }

        // harmonic angles: E = K (theta - theta0)^2
        for (const Angle& an : angles_) {
            const auto& c = angle_coeff_[an.t];
            Vec3 d1 = delta(an.a, an.b);  // 1-2
            Vec3 d2 = delta(an.c, an.b);  // 3-2
            double r1sq = d1.x * d1.x + d1.y * d1.y + d1.z * d1.z;
            double r2sq = d2.x * d2.x + d2.y * d2.y + d2.z * d2.z;
            double r1 = std::sqrt(r1sq), r2 = std::sqrt(r2sq);
            double cs = (d1.x * d2.x + d1.y * d2.y + d1.z * d2.z) / (r1 * r2);
            cs = std::max(-1., std::min(1., cs));
            double sn = std::sqrt(1. - cs * cs);
            if (sn < 1e-8) sn = 1e-8;
            double dtheta = std::acos(cs) - c[1];
            pe_ += c[0] * dtheta * dtheta;
            double a = -2. * c[0] * dtheta / sn;
            double a11 = a * cs / r1sq;
            double a12 = -a / (r1 * r2);
            double a22 = a * cs / r2sq;
            Vec3 f1 = {a11 * d1.x + a12 * d2.x, a11 * d1.y + a12 * d2.y,
                       a11 * d1.z + a12 * d2.z};
            Vec3 f3 = {a22 * d2.x + a12 * d1.x, a22 * d2.y + a12 * d1.y,
                       a22 * d2.z + a12 * d1.z};
            f_[an.a].x += f1.x; f_[an.a].y += f1.y; f_[an.a].z += f1.z;
            f_[an.c].x += f3.x; f_[an.c].y += f3.y; f_[an.c].z += f3.z;
            f_[an.b].x -= f1.x + f3.x;
            f_[an.b].y -= f1.y + f3.y;
            f_[an.b].z -= f1.z + f3.z;
        }

        // OPLS dihedrals:
        // E = 1/2 [K1 (1+cos p) + K2 (1-cos 2p) + K3 (1+cos 3p) + K4 (1-cos 4p)]
        for (const Dihedral& dh : dihedrals_) {
            const auto& c = dihedral_coeff_[dh.t];
            Vec3 b1 = delta(dh.b, dh.a);
            Vec3 b2 = delta(dh.c, dh.b);
            Vec3 b3 = delta(dh.d, dh.c);
            Vec3 n1 = cross(b1, b2);
            Vec3 n2 = cross(b2, b3);
            double n1sq = dot(n1, n1), n2sq = dot(n2, n2);
            double b2n = std::sqrt(dot(b2, b2));
            if (n1sq < 1e-12 || n2sq < 1e-12 || b2n < 1e-12) continue;
            double phi = std::atan2(dot(cross(n1, n2), b2) / b2n,
                                    dot(n1, n2));
            pe_ += 0.5 * (c[0] * (1. + std::cos(phi)) +
                          c[1] * (1. - std::cos(2. * phi)) +
                          c[2] * (1. + std::cos(3. * phi)) +
                          c[3] * (1. - std::cos(4. * phi)));
            double dEdphi = 0.5 * (-c[0] * std::sin(phi) +
                                   2. * c[1] * std::sin(2. * phi) -
                                   3. * c[2] * std::sin(3. * phi) +
                                   4. * c[3] * std::sin(4. * phi));
            // Blondel & Karplus force distribution (FD-verified):
            // dphi/dr1 = -(|b2|/|n1|^2) n1, dphi/dr4 = +(|b2|/|n2|^2) n2,
            // dphi/dr2 = -(1+t12) dphi/dr1 + t32 dphi/dr4,
            // dphi/dr3 = -(1+t32) dphi/dr4 + t12 dphi/dr1,
            // F = -dE/dphi * dphi/dr
            Vec3 f1 = scale(n1, dEdphi * b2n / n1sq);
            Vec3 f4 = scale(n2, -dEdphi * b2n / n2sq);
            double t12 = dot(b1, b2) / (b2n * b2n);
            double t32 = dot(b3, b2) / (b2n * b2n);
            Vec3 f2 = {-(1. + t12) * f1.x + t32 * f4.x,
                       -(1. + t12) * f1.y + t32 * f4.y,
                       -(1. + t12) * f1.z + t32 * f4.z};
            Vec3 f3 = {-(1. + t32) * f4.x + t12 * f1.x,
                       -(1. + t32) * f4.y + t12 * f1.y,
                       -(1. + t32) * f4.z + t12 * f1.z};
            f_[dh.a].x += f1.x; f_[dh.a].y += f1.y; f_[dh.a].z += f1.z;
            f_[dh.b].x += f2.x; f_[dh.b].y += f2.y; f_[dh.b].z += f2.z;
            f_[dh.c].x += f3.x; f_[dh.c].y += f3.y; f_[dh.c].z += f3.z;
            f_[dh.d].x += f4.x; f_[dh.d].y += f4.y; f_[dh.d].z += f4.z;
        }
    }

    static inline Vec3 cross(const Vec3& a, const Vec3& b) {
        return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
                a.x * b.y - a.y * b.x};
    }
    static inline double dot(const Vec3& a, const Vec3& b) {
        return a.x * b.x + a.y * b.y + a.z * b.z;
    }
    static inline Vec3 scale(const Vec3& a, double s) {
        return {a.x * s, a.y * s, a.z * s};
    }

    bool is_excluded(long i, long j) const {
        const std::vector<int>& e = excl_[i];
        for (int k : e)
            if (k == (int)j) return true;
        return false;
    }

    void compute_forces() {
        if (need_rebuild()) build_cells();

        for (size_t i = 0; i < n_; ++i) f_[i] = {};
        wall_force_lo_ = {};
        wall_force_hi_ = {};
        pe_ = 0.;
        if (eam_active_) eam_prepass();

        const int ncell = nbx_ * nby_ * nbz_;

#ifdef _OPENMP
#pragma omp parallel
#endif
        {
            Vec3 wlo{}, whi{};
            double pe_acc = 0.;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 8)
#endif
            for (int c = 0; c < ncell; ++c) {
                int cz = c / (nbx_ * nby_);
                int cy = (c / nbx_) % nby_;
                int cx = c % nbx_;

                // unique neighbor cells (guards against double-visiting
                // when an axis has fewer than 3 cells and the periodic
                // wrap folds offsets onto the same cell)
                int ncells_nb = 0;
                int nb_cells[27];
                for (int dz = -1; dz <= 1; ++dz) {
                    int zz = cz + dz;
                    if (zz < 0 || zz >= nbz_) continue;
                    for (int dy = -1; dy <= 1; ++dy) {
                        int yy = (cy + dy + nby_) % nby_;
                        for (int dx = -1; dx <= 1; ++dx) {
                            int xx = (cx + dx + nbx_) % nbx_;
                            int cc = (zz * nby_ + yy) * nbx_ + xx;
                            bool seen = false;
                            for (int k = 0; k < ncells_nb; ++k)
                                if (nb_cells[k] == cc) { seen = true; break; }
                            if (!seen) nb_cells[ncells_nb++] = cc;
                        }
                    }
                }

                for (long i = head_[c]; i >= 0; i = next_[i]) {
                    const uint8_t gi = group_[i];
                    const bool i_wall = gi != FLUID;
                    Vec3 fi{};

                    for (int k = 0; k < ncells_nb; ++k) {
                        {
                            {
                                int cc = nb_cells[k];

                                for (long j = head_[cc]; j >= 0; j = next_[j]) {
                                    if (j == i) continue;
                                    const uint8_t gj = group_[j];
                                    // skip wall-wall interactions between
                                    // atoms of the same rigid wall and
                                    // frozen-frozen pairs (excluded in the
                                    // reference deck)
                                    if (i_wall && gj != FLUID) {
                                        bool same_side =
                                            is_lower_wall(gi) == is_lower_wall(gj);
                                        if (same_side &&
                                            (is_frozen(gi) && is_frozen(gj)))
                                            continue;
                                    }
                                    // bonded 1-2/1-3/1-4 exclusions
                                    // (special_bonds lj 0 0 0)
                                    if (!excl_.empty() && is_excluded(i, j))
                                        continue;

                                    double ddx = mix(x_[i].x - x_[j].x, Lx_);
                                    double ddy = mix(x_[i].y - x_[j].y, Ly_);
                                    double ddz = x_[i].z - x_[j].z;
                                    double r2 = ddx * ddx + ddy * ddy + ddz * ddz;
                                    if (r2 < 1e-12) continue;

                                    const PairCoeff& pc =
                                        pairs_[(size_t)type_[i] * ntypes_ +
                                               type_[j]];
                                    double fpair = 0.;
                                    if (r2 < pc.rc2) {
                                        double inv2 = 1. / r2;
                                        double inv6 = inv2 * inv2 * inv2;
                                        // F = (12 c12 r^-13 - 6 c6 r^-7) r_hat
                                        fpair = (12. * pc.c12 * inv6 -
                                                 6. * pc.c6) * inv6 * inv2;
                                        if ((long)i < j)
                                            pe_acc += pc.c12 * inv6 * inv6 -
                                                      pc.c6 * inv6 - pc.shift;
                                    }
                                    if (eam_active_ && type_[i] == 0 &&
                                        type_[j] == 0 && r2 < eam_rc2_) {
                                        double r = std::sqrt(r2);
                                        double rphi, rphip, rhov, rhop;
                                        eam_rphi_.eval(r, rphi, rphip);
                                        eam_rho_.eval(r, rhov, rhop);
                                        double phi = rphi / r;
                                        double phip = rphip / r - phi / r;
                                        double fps = eam_fp_[i] + eam_fp_[j];
                                        fpair += -(fps * rhop + phip) / r;
                                        if ((long)i < j) pe_acc += phi;
                                    }
                                    if (fpair == 0.) continue;

                                    fi.x += fpair * ddx;
                                    fi.y += fpair * ddy;
                                    fi.z += fpair * ddz;

                                    // wall force bookkeeping: force exerted
                                    // by the fluid on each wall
                                    if (i_wall && gj == FLUID) {
                                        if (is_lower_wall(gi)) {
                                            wlo.x += fpair * ddx;
                                            wlo.y += fpair * ddy;
                                            wlo.z += fpair * ddz;
                                        } else {
                                            whi.x += fpair * ddx;
                                            whi.y += fpair * ddy;
                                            whi.z += fpair * ddz;
                                        }
                                    }
                                }
                            }
                        }
                    }
                    f_[i].x += fi.x;
                    f_[i].y += fi.y;
                    f_[i].z += fi.z;
                }
            }
#ifdef _OPENMP
#pragma omp critical
#endif
            {
                wall_force_lo_.x += wlo.x;
                wall_force_lo_.y += wlo.y;
                wall_force_lo_.z += wlo.z;
                wall_force_hi_.x += whi.x;
                wall_force_hi_.y += whi.y;
                wall_force_hi_.z += whi.z;
                pe_ += pe_acc;
            }
        }

        compute_bonded();

        // Gaussian flux control: zero the net lateral force on the fluid
        // (keeps the COM momentum imposed at stage 2 exactly constant)
        if (flux_control_) {
            Vec3 fsum{};
            for (size_t i = n_wall_; i < n_; ++i) {
                fsum.x += f_[i].x;
                fsum.y += f_[i].y;
            }
            fsum.x /= n_fluid_;
            fsum.y /= n_fluid_;
            for (size_t i = n_wall_; i < n_; ++i) {
                f_[i].x -= fsum.x;
                f_[i].y -= fsum.y;
            }
        }
    }

    // -- thermostats --------------------------------------------------------
    void langevin_walls() {
        // Langevin on the thermal wall layers, gamma = 1/(100 dt), with the
        // wall COM drift excluded from thermostatting
        const double gamma = 1. / (100. * dt_);
        std::normal_distribution<double> nd(0., 1.);
        for (size_t i = 0; i < n_wall_; ++i) {
            uint8_t g = group_[i];
            if (is_frozen(g)) continue;  // all mobile wall atoms thermostatted
            if (squeeze_steps_ > 0 && is_upper_wall(g)) continue;
            double m = mass_[i];
            double sigma =
                std::sqrt(2. * m * gamma * kB_ * temp_ / (dt_ * ftm2v_));
            double vx = v_[i].x - (is_lower_wall(g) ? wall_drift_lo_ : 0.);
            f_[i].x += (-m * gamma * vx) / ftm2v_ + sigma * nd(rng_);
            f_[i].y += (-m * gamma * v_[i].y) / ftm2v_ + sigma * nd(rng_);
            f_[i].z += (-m * gamma * v_[i].z) / ftm2v_ + sigma * nd(rng_);
        }
    }

    void berendsen_fluid(double tau) {
        // equilibration thermostat: Berendsen drift toward the target with a
        // hard isokinetic clamp when far off (robust against bad starts).
        // Acts on the PECULIAR velocities so the imposed COM flux survives.
        Vec3 vcom{};
        double msum = 0.;
        for (size_t i = n_wall_; i < n_; ++i) {
            vcom.x += mass_[i] * v_[i].x;
            vcom.y += mass_[i] * v_[i].y;
            vcom.z += mass_[i] * v_[i].z;
            msum += mass_[i];
        }
        vcom.x /= msum; vcom.y /= msum; vcom.z /= msum;

        double ke = 0.;
        for (size_t i = n_wall_; i < n_; ++i) {
            double px = v_[i].x - vcom.x, py = v_[i].y - vcom.y,
                   pz = v_[i].z - vcom.z;
            ke += 0.5 * mass_[i] * (px * px + py * py + pz * pz);
        }
        double tcur = 2. * ke * mvv2e_ / (3. * n_fluid_ * kB_);
        if (tcur < 1e-12) return;
        double lam;
        if (tcur > 4. * temp_ || tcur < 0.25 * temp_)
            lam = std::sqrt(temp_ / tcur);
        else
            lam = std::sqrt(std::max(0.1, 1. + dt_ / tau * (temp_ / tcur - 1.)));
        for (size_t i = n_wall_; i < n_; ++i) {
            v_[i].x = vcom.x + lam * (v_[i].x - vcom.x);
            v_[i].y = vcom.y + lam * (v_[i].y - vcom.y);
            v_[i].z = vcom.z + lam * (v_[i].z - vcom.z);
        }
    }

    // -- integration --------------------------------------------------------
    void integrate(long nsteps, double limit, bool berendsen, bool sample) {
        if (!built_) throw std::runtime_error("system not built");
        compute_forces();

        const long Nevery = (long)getvar("Nevery", 10);
        const long Nrepeat = (long)getvar("Nrepeat", 1);
        const long Nfreq = Nevery * Nrepeat;

        const double area = Lx_ * Ly_;

        for (long s = 0; s < nsteps; ++s) {
            // velocity Verlet, half kick + drift
            for (size_t i = 0; i < n_; ++i) {
                if (squeeze_steps_ > 0 && is_upper_wall(group_[i])) {
                    // rigid squeeze of the whole upper slab toward the
                    // target gap (reference in.run.equil.lmp fix move)
                    x_[i].z -= dt_ * squeeze_vz_;
                    continue;
                }
                if (is_frozen(group_[i])) {
                    // frozen atoms move rigidly with their set velocity
                    x_[i].x += dt_ * v_[i].x;
                    continue;
                }
                double hdtm = 0.5 * dt_ * ftm2v_ / mass_[i];
                v_[i].x += hdtm * f_[i].x;
                v_[i].y += hdtm * f_[i].y;
                v_[i].z += hdtm * f_[i].z;

                double ddx = dt_ * v_[i].x, ddy = dt_ * v_[i].y,
                       ddz = dt_ * v_[i].z;
                if (limit > 0.) {
                    double d = std::sqrt(ddx * ddx + ddy * ddy + ddz * ddz);
                    if (d > limit) {
                        double sc = limit / d;
                        ddx *= sc;
                        ddy *= sc;
                        ddz *= sc;
                        v_[i].x *= sc;
                        v_[i].y *= sc;
                        v_[i].z *= sc;
                    }
                }
                x_[i].x += ddx;
                x_[i].y += ddy;
                x_[i].z += ddz;
            }

            if (squeeze_steps_ > 0) hi_face_ -= dt_ * squeeze_vz_;

            // reflecting z boundaries (safety net: hot atoms cannot leave
            // the simulation box through the finite-thickness walls), and
            // the scaffolding planes at the wall faces while equilibrating
            const double rlo = reflect_faces_ ? lo_face_ : 0.;
            const double rhi = reflect_faces_ ? hi_face_ : Lz_;
            for (size_t i = n_wall_; i < n_; ++i) {
                if (x_[i].z < rlo) {
                    x_[i].z = 2. * rlo - x_[i].z;
                    if (v_[i].z < 0.) v_[i].z = -v_[i].z;
                } else if (x_[i].z > rhi) {
                    x_[i].z = 2. * rhi - x_[i].z;
                    if (v_[i].z > 0.) v_[i].z = -v_[i].z;
                }
            }

            compute_forces();
            langevin_walls();

            // second half kick
            for (size_t i = 0; i < n_; ++i) {
                if (is_frozen(group_[i])) continue;
                if (squeeze_steps_ > 0 && is_upper_wall(group_[i])) continue;
                double hdtm = 0.5 * dt_ * ftm2v_ / mass_[i];
                v_[i].x += hdtm * f_[i].x;
                v_[i].y += hdtm * f_[i].y;
                v_[i].z += hdtm * f_[i].z;
            }

            if (berendsen) berendsen_fluid(500. * dt_);

            if (squeeze_steps_ > 0) --squeeze_steps_;
            ++step_;

            if (sample && step_ % Nevery == 0) {
                // z-density histogram of the fluid (ave/chunk output)
                if (nbinz_ > 0) {
                    const double z0 = bin_z0_, dz = bin_dz_;
                    for (size_t ii = n_wall_; ii < n_; ++ii) {
                        long b = (long)((x_[ii].z - z0) / dz);
                        if (b >= 0 && b < nbinz_) dens_hist_[b] += 1.;
                    }
                    ++dens_samples_;
                }
                // thermo line
                if (thermo_file_.is_open() && step_ % (10 * Nevery) == 0) {
                    double ke = 0.;
                    for (size_t ii = n_wall_; ii < n_; ++ii)
                        ke += 0.5 * mass_[ii] *
                              (v_[ii].x * v_[ii].x + v_[ii].y * v_[ii].y +
                               v_[ii].z * v_[ii].z);
                    double t = 2. * ke * mvv2e_ / (3. * n_fluid_ * kB_);
                    thermo_file_ << step_ << " " << t << " " << ke << "\n";
                }
                // force exerted BY the fluid ON the walls is the negative of
                // the accumulated wall<-fluid force... bookkeeping above
                // accumulates force on wall atoms from fluid: F_wall.
                acc_pressL_ += -wall_force_lo_.z / area;   // compressive > 0
                acc_tauxzL_ += wall_force_lo_.x / area;
                acc_tauyzL_ += wall_force_lo_.y / area;
                acc_pressU_ += wall_force_hi_.z / area;
                acc_tauxzU_ += -wall_force_hi_.x / area;
                acc_tauyzU_ += -wall_force_hi_.y / area;
                ++acc_count_;

                if (step_ % Nfreq == 0 && sample_file_.is_open()) {
                    double inv = 1. / acc_count_;
                    sample_file_ << step_ << " " << acc_pressL_ * inv << " "
                                 << acc_tauxzL_ * inv << " "
                                 << acc_pressU_ * inv << " "
                                 << acc_tauxzU_ * inv << " "
                                 << acc_tauyzL_ * inv << " "
                                 << acc_tauyzU_ * inv << "\n";
                    acc_pressL_ = acc_tauxzL_ = acc_tauyzL_ = 0.;
                    acc_pressU_ = acc_tauxzU_ = acc_tauyzU_ = 0.;
                    acc_count_ = 0;
                }
            }
        }
    }

    void open_thermo() {
        if (logfile_ == "none") return;
        thermo_file_.open(logfile_, std::ios::app);
        thermo_file_ << "Step Temp KinEng\n";
    }

    void close_thermo() {
        if (thermo_file_.is_open()) {
            thermo_file_ << "Loop time of sampling stage\n";
            thermo_file_.close();
        }
    }

    void write_density_profile() {
        if (nbinz_ <= 0 || dens_samples_ == 0) return;
        std::ofstream out("dens_profile.dat");
        out << "# Chunk-averaged data for fix avedens and group fluid\n";
        out << "# Timestep Number-of-chunks Total-count\n";
        out << "# Chunk Coord1 Ncount density/number\n";
        const double vol_bin = Lx_ * Ly_ * bin_dz_;
        out << step_ << " " << nbinz_ << " " << n_fluid_ << "\n";
        for (long b = 0; b < nbinz_; ++b) {
            double count = dens_hist_[b] / dens_samples_;
            out << "  " << (b + 1) << " " << bin_z0_ + (b + 0.5) * bin_dz_
                << " " << count << " " << count / vol_bin << "\n";
        }
    }

    void open_sample_file() {
        sample_file_.open("stress_wall.dat");
        sample_file_ << "# step pressL tauxzL pressU tauxzU tauyzL tauyzU\n";
        acc_pressL_ = acc_tauxzL_ = acc_tauyzL_ = 0.;
        acc_pressU_ = acc_tauxzU_ = acc_tauyzU_ = 0.;
        acc_count_ = 0;
    }

    void close_sample_file() {
        if (sample_file_.is_open()) sample_file_.close();
    }

    void logmsg(const std::string& msg) {
        if (logfile_ == "none") return;
        std::ofstream out(logfile_, std::ios::app);
        out << msg << "\n";
    }

    void set_defaults() {
        logfile_ = "log.nanomd";
    }

    // -- state --------------------------------------------------------------
    int nthreads_;
    std::mt19937_64 rng_;
    std::map<std::string, double> vars_;
    std::map<std::string, std::string> strings_;
    std::string error_;
    std::string logfile_;

    bool built_ = false;
    bool flux_control_ = false;
    bool neigh_valid_ = false;

    double Lx_ = 0, Ly_ = 0, Lz_ = 0, gap_ = 0;
    double cutoff_ = 2.5, temp_ = 1.0, dt_ = 0.005;
    double sigWW_ = 1., epsWW_ = 1., sigFW_ = 1., epsFW_ = 1.;
    double fluid_mass_ = 0.;
    double wall_drift_lo_ = 0.;

    size_t n_ = 0, n_wall_ = 0, n_fluid_ = 0;
    std::vector<Vec3> x_, v_, f_, x_ref_;
    std::vector<double> mass_;
    std::vector<uint8_t> group_;
    std::vector<int> type_;

    // unit system (LJ: all 1; real: kcal/mol, g/mol, Angstrom, fs, K)
    double ftm2v_ = 1.;   // force/mass -> velocity/time
    double mvv2e_ = 1.;   // mass*velocity^2 -> energy
    double kB_ = 1.;      // Boltzmann constant in energy/K

    int ntypes_ = 2;
    std::vector<PairCoeff> pairs_ = std::vector<PairCoeff>(4);

    // molecular topology (empty for the atomic LJ workload)
    struct Bond { int a, b, t; };
    struct Angle { int a, b, c, t; };
    struct Dihedral { int a, b, c, d, t; };
    std::vector<Bond> bonds_;
    std::vector<Angle> angles_;
    std::vector<Dihedral> dihedrals_;
    std::vector<std::array<double, 2>> bond_coeff_;      // K, r0
    std::vector<std::array<double, 2>> angle_coeff_;     // K, theta0 (rad)
    std::vector<std::array<double, 4>> dihedral_coeff_;  // K1..K4 (opls)
    std::vector<std::vector<int>> excl_;  // 1-2/1-3/1-4 pair exclusions
    double pe_ = 0.;  // potential energy of the last force evaluation

    // gap squeeze (confined_mol equilibration)
    double squeeze_vz_ = 0.;
    long squeeze_steps_ = 0;
    long equil_extra_ = 0;
    // reflective scaffolding planes just inside the wall faces: keep
    // rammed molecules out of the walls during equilibration/squeeze
    // (disabled during sampling -- wall stresses stay pure LJ)
    double lo_face_ = -1e30, hi_face_ = 1e30;
    bool reflect_faces_ = false;

    // EAM gold (funcfl)
    bool eam_active_ = false;
    double eam_rc_ = 0., eam_rc2_ = 0.;
    Table eam_F_, eam_rho_, eam_rphi_;
    std::vector<double> eam_fp_;

    double bin_ = 0, bx_ = 0, by_ = 0, bz_ = 0;
    int nbx_ = 0, nby_ = 0, nbz_ = 0;
    std::vector<long> head_, next_;
    std::vector<int> cell_of_;

    long step_ = 0;
    Vec3 wall_force_lo_{}, wall_force_hi_{};
    std::ofstream sample_file_;
    std::ofstream thermo_file_;
    long nbinz_ = 0;
    long dens_samples_ = 0;
    double bin_z0_ = 0., bin_dz_ = 1.;
    std::vector<double> dens_hist_;
    double acc_pressL_ = 0, acc_tauxzL_ = 0, acc_tauyzL_ = 0;
    double acc_pressU_ = 0, acc_tauxzU_ = 0, acc_tauyzU_ = 0;
    long acc_count_ = 0;
};

}  // namespace nanomd

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

void* nanomd_create(int nthreads) { return new nanomd::Engine(nthreads); }

void nanomd_destroy(void* h) { delete static_cast<nanomd::Engine*>(h); }

int nanomd_command(void* h, const char* line) {
    return static_cast<nanomd::Engine*>(h)->command(line);
}

int nanomd_file(void* h, const char* path) {
    return static_cast<nanomd::Engine*>(h)->run_file(path);
}

const char* nanomd_version() { return nanomd::VERSION; }

int nanomd_has_package(const char* name) {
    return nanomd::Engine::has_package(name) ? 1 : 0;
}

const char* nanomd_last_error(void* h) {
    return static_cast<nanomd::Engine*>(h)->last_error();
}

long nanomd_natoms(void* h) {
    return static_cast<nanomd::Engine*>(h)->natoms();
}

void nanomd_box(void* h, double* out) {
    static_cast<nanomd::Engine*>(h)->box(out);
}

double nanomd_global(void* h, const char* name) {
    return static_cast<nanomd::Engine*>(h)->global(name);
}

int nanomd_gather(void* h, const char* name, double* out) {
    return static_cast<nanomd::Engine*>(h)->gather(name, out);
}

}  // extern "C"
