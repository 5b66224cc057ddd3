// baseline_proxy.cpp — measured single-core stand-in for the Fortran
// reference's hot path (keb721/mc_water_ls_mw).
//
// No Fortran compiler exists in this image (libgfortran5 runtime only,
// no frontend), so the reference build itself cannot be benchmarked.
// This program re-implements the reference's per-move cost model — the
// algorithm, data structures and arithmetic of its inner loop — in
// C++ and measures aggregate MC moves/s on one core, anchoring the
// `vs_baseline` denominator in BASELINE.md with a measurement instead
// of an estimate.  Structure mirrored (not copied — the reference is
// Fortran) from:
//
//   - Verlet neighbour list with image indices: nn/jn/vn arrays,
//     skin rn = 1.18*a*sigma, maxneigh=50, rebuilt every
//     list_update_int cycles   (molint.F90:79-81,501-559;
//     mc_moves.F90:218-222)
//   - explicit periodic image vector list, entry 0 = null vector
//     (compute_ivects, molint.F90:174-217)
//   - single-molecule local energy: unhalved pair terms + BOTH
//     orientations of affected three-body terms (i-centred j-i-k and
//     j-centred i-j-k via translated neighbour images), cutoff +
//     cos(theta)<0.99 screen, sum of pref*exp terms
//     (compute_local_real_energy, molint.F90:220-404)
//   - full-cell energy for init/audit (compute_model_energy,
//     molint.F90:407-499)
//   - translation move: 4 local-energy evaluations (2 lattices x
//     old/new), same FRACTIONAL displacement applied to the partner
//     lattice, mu update, eta lookup on the geometric-progression bin
//     grid (log-based analytic bin index), Metropolis accept/reject
//     with rollback (mc_water_translation, mc_moves.F90:966-1213;
//     mu_to_bin mc_moves.F90:2187-2215)
//   - lattice-switch attempt after every move (mc_always_switch,
//     mc_cycle mc_moves.F90:243-249)
//
// Omitted: volume moves (probability 1/768 per move in the example
// configs; each is an O(N) full recompute, so omitting them FLATTERS
// the baseline slightly) and MPI sync (tiny O(nbins) payloads every
// 250 cycles).  Build (the reference's GNU path, Makefile:28-30):
//
//   g++ -O3 -march=native -ffast-math -funroll-loops \
//       -o /tmp/baseline_proxy scripts/baseline_proxy.cpp
//
// Input (text, written by scripts/run_baseline_proxy.py):
//   line 1: N  sigma_A  eps_eV  lambda  bigA  bigB  gamma  a  cos0
//   then per lattice (2 lattices): 9 numbers (h-matrix, cell vectors
//   as consecutive triplets, Angstrom) + N lines "x y z".

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <random>
#include <vector>

struct V3 { double x, y, z; };
static inline V3 operator-(V3 a, V3 b) { return {a.x-b.x, a.y-b.y, a.z-b.z}; }
static inline V3 operator+(V3 a, V3 b) { return {a.x+b.x, a.y+b.y, a.z+b.z}; }
static inline double dot(V3 a, V3 b) { return a.x*b.x + a.y*b.y + a.z*b.z; }

static int N;
static double SIG, EPS, LAM, BA, BB, GAM, ACUT, COS0;
static double RC, RC2, RN, RN2;   // cutoff a*sigma, skin rn=1.18*rc

struct Lattice {
    double h[3][3];               // h[v] = cell vector v (rows)
    double hinv[3][3];
    std::vector<V3> r;
    // Verlet list (molint.F90:79-81): counts, partner, image index
    std::vector<int> nn;
    std::vector<int> jn;          // [N*MAXN]
    std::vector<int> vn;
    double energy;                // incrementally tracked model_energy
    std::vector<V3> ivect;        // per-lattice image vectors, [0]=null
};

static const int MAXN = 50;       // maxneigh (molint.F90:79)

static void inv3(const double m[3][3], double o[3][3]) {
    double d = m[0][0]*(m[1][1]*m[2][2]-m[1][2]*m[2][1])
             - m[0][1]*(m[1][0]*m[2][2]-m[1][2]*m[2][0])
             + m[0][2]*(m[1][0]*m[2][1]-m[1][1]*m[2][0]);
    double id = 1.0/d;
    o[0][0] =  (m[1][1]*m[2][2]-m[1][2]*m[2][1])*id;
    o[0][1] = -(m[0][1]*m[2][2]-m[0][2]*m[2][1])*id;
    o[0][2] =  (m[0][1]*m[1][2]-m[0][2]*m[1][1])*id;
    o[1][0] = -(m[1][0]*m[2][2]-m[1][2]*m[2][0])*id;
    o[1][1] =  (m[0][0]*m[2][2]-m[0][2]*m[2][0])*id;
    o[1][2] = -(m[0][0]*m[1][2]-m[0][2]*m[1][0])*id;
    o[2][0] =  (m[1][0]*m[2][1]-m[1][1]*m[2][0])*id;
    o[2][1] = -(m[0][0]*m[2][1]-m[0][1]*m[2][0])*id;
    o[2][2] =  (m[0][0]*m[1][1]-m[0][1]*m[1][0])*id;
}

// image-vector list over integer shifts reaching within the skin of
// the cell (compute_ivects, molint.F90:174-217); entry 0 is the null
// vector, flagged non-self-interacting at the search site
static void build_ivect(Lattice& L) {
    auto& ivect = L.ivect;
    ivect.clear();
    ivect.push_back({0, 0, 0});
    int rng[3];
    for (int a = 0; a < 3; a++) {
        // perpendicular plane spacing along axis a (skewed cells):
        // d_a = 1/|column a of H^-1|  (r = f H row convention)
        double g = std::sqrt(L.hinv[0][a]*L.hinv[0][a]
                           + L.hinv[1][a]*L.hinv[1][a]
                           + L.hinv[2][a]*L.hinv[2][a]);
        rng[a] = (int)std::ceil(RN*g) + 1;
    }
    double sp[3];
    for (int a = 0; a < 3; a++) {
        double g = std::sqrt(L.hinv[0][a]*L.hinv[0][a]
                           + L.hinv[1][a]*L.hinv[1][a]
                           + L.hinv[2][a]*L.hinv[2][a]);
        sp[a] = 1.0/g;            // plane spacing along axis a
    }
    for (int n1 = -rng[0]; n1 <= rng[0]; n1++)
    for (int n2 = -rng[1]; n2 <= rng[1]; n2++)
    for (int n3 = -rng[2]; n3 <= rng[2]; n3++) {
        if (!n1 && !n2 && !n3) continue;
        // prune shifts whose image cell cannot come within the skin:
        // lower bound on the cell-to-cell distance from plane spacings
        double lb2 = 0.0;
        int nn_[3] = {n1, n2, n3};
        for (int a = 0; a < 3; a++) {
            double e = (std::abs(nn_[a]) > 1)
                     ? (std::abs(nn_[a]) - 1)*sp[a] : 0.0;
            lb2 += e*e;
        }
        if (lb2 >= RN2) continue;
        V3 v = {n1*L.h[0][0] + n2*L.h[1][0] + n3*L.h[2][0],
                n1*L.h[0][1] + n2*L.h[1][1] + n3*L.h[2][1],
                n1*L.h[0][2] + n2*L.h[1][2] + n3*L.h[2][2]};
        ivect.push_back(v);
    }
}

// brute-force O(N^2 * n_ivect) Verlet build (compute_neighbours,
// molint.F90:501-559)
static void build_neighbours(Lattice& L) {
    const auto& ivect = L.ivect;
    L.nn.assign(N, 0);
    L.jn.assign((size_t)N*MAXN, 0);
    L.vn.assign((size_t)N*MAXN, 0);
    for (int i = 0; i < N; i++) {
        int cnt = 0;
        for (int j = 0; j < N; j++) {
            for (size_t v = 0; v < ivect.size(); v++) {
                if (j == i && v == 0) continue;   // null-vector self
                V3 d = L.r[j] + ivect[v] - L.r[i];
                if (dot(d, d) < RN2) {
                    L.jn[(size_t)i*MAXN + cnt] = j;
                    L.vn[(size_t)i*MAXN + cnt] = (int)v;
                    cnt++;
                }
            }
        }
        L.nn[i] = cnt;
    }
}

static inline double pair_e(double rij) {
    double sr = SIG/rij;
    double sr2 = sr*sr;
    return BA*EPS*(BB*sr2*sr2 - 1.0)*std::exp(SIG/(rij - RC));
}

// one exp per term, as the reference's batched sum of pref*exp(vexp)
// reduction does (molint.F90:382-387): ga/gb = gamma*sigma/(r - rc)
static inline double three_e(double ga, double gb, double costh) {
    double dc = costh - COS0;
    return LAM*EPS*dc*dc*std::exp(ga + gb);
}

// full-cell energy (compute_model_energy, molint.F90:407-499):
// half pair terms (each pair visited twice), i-centred 3-body k>j
static double full_energy(const Lattice& L) {
    const auto& ivect = L.ivect;
    double E = 0.0;
    for (int i = 0; i < N; i++) {
        const int ni = L.nn[i];
        V3 dj[MAXN]; double rj[MAXN], gj[MAXN]; int nw = 0;
        for (int a = 0; a < ni; a++) {
            int j = L.jn[(size_t)i*MAXN + a];
            V3 d = L.r[j] + ivect[L.vn[(size_t)i*MAXN + a]] - L.r[i];
            double r2 = dot(d, d);
            if (r2 < RC2) {
                double r = std::sqrt(r2);
                E += 0.5*pair_e(r);
                dj[nw] = d; rj[nw] = r;
                gj[nw] = GAM*SIG/(r - RC); nw++;
            }
        }
        for (int a = 0; a < nw; a++)
            for (int b = a + 1; b < nw; b++) {
                double c = dot(dj[a], dj[b])/(rj[a]*rj[b]);
                E += three_e(gj[a], gj[b], c);
            }
    }
    return E;
}

// single-molecule local energy (compute_local_real_energy,
// molint.F90:220-404): unhalved pairs; i-centred angles j-i-k; plus
// j-centred angles i-j-k gathered through translated images
// ivect(ji)+ivect(ki) (molint.F90:324-343); cos<0.99 screen
// (molint.F90:367-371)
static double local_energy(const Lattice& L, int i, const V3 ri) {
    const auto& ivect = L.ivect;
    double E = 0.0;
    const int ni = L.nn[i];
    V3 dj[MAXN]; double rj[MAXN], gj[MAXN]; int idx[MAXN]; int nw = 0;
    for (int a = 0; a < ni; a++) {
        int j = L.jn[(size_t)i*MAXN + a];
        V3 d = L.r[j] + ivect[L.vn[(size_t)i*MAXN + a]] - ri;
        double r2 = dot(d, d);
        if (r2 < RC2) {
            double r = std::sqrt(r2);
            E += pair_e(r);
            dj[nw] = d; rj[nw] = r;
            gj[nw] = GAM*SIG/(r - RC); idx[nw] = a; nw++;
        }
    }
    // gather-then-reduce, the reference's structure
    // (molint.F90:344-387): flat candidate arrays filled under the
    // cutoff + cos<0.99 screens, then ONE branch-free vectorisable
    // reduction of pref*exp(vexp)
    static thread_local std::vector<double> pref, vexp;
    pref.clear(); vexp.clear();
    // i-centred three-body, each angle once (k > j)
    for (int a = 0; a < nw; a++)
        for (int b = a + 1; b < nw; b++) {
            double c = dot(dj[a], dj[b])/(rj[a]*rj[b]);
            if (c < 0.99) {
                double dc = c - COS0;
                pref.push_back(LAM*EPS*dc*dc);
                vexp.push_back(gj[a] + gj[b]);
            }
        }
    // j-centred: angles i-j-k for each in-cutoff neighbour j of i
    for (int a = 0; a < nw; a++) {
        int aj = idx[a];
        int j  = L.jn[(size_t)i*MAXN + aj];
        V3 vj  = ivect[L.vn[(size_t)i*MAXN + aj]];
        V3 rjpos = L.r[j] + vj;                 // j in i's image frame
        V3 dji = ri - rjpos;                    // j -> i
        double rji = rj[a], gji = gj[a];
        const int njn = L.nn[j];
        for (int b = 0; b < njn; b++) {
            int k = L.jn[(size_t)j*MAXN + b];
            // k in j's frame translated into i's image of j
            V3 dk = L.r[k] + ivect[L.vn[(size_t)j*MAXN + b]] + vj - rjpos;
            // skip the i slot itself (same molecule, same image)
            V3 diff = dk - dji;
            if (k == i && dot(diff, diff) < 1e-18) continue;
            double rk2 = dot(dk, dk);
            if (rk2 < RC2) {
                double rk = std::sqrt(rk2);
                double c = dot(dji, dk)/(rji*rk);
                if (c < 0.99) {
                    double dc = c - COS0;
                    pref.push_back(LAM*EPS*dc*dc);
                    vexp.push_back(gji + GAM*SIG/(rk - RC));
                }
            }
        }
    }
    const int nt = (int)pref.size();
    const double* pp = pref.data();
    const double* vv = vexp.data();
    #pragma omp simd reduction(+:E)
    for (int t = 0; t < nt; t++)
        E += pp[t]*std::exp(vv[t]);
    return E;
}

// geometric-progression bin grid: analytic log-based mu->bin
// (mc_moves.F90:2187-2215) — included for its per-move cost (two
// logs + interpolation arithmetic on the eta lookup path)
static double MU_MAX = 400.0, BIN_RATIO = 1.12, LOG_RATIO, HALF_BINS = 50;
static inline int mu_to_bin(double mu) {
    double am = std::fabs(mu);
    if (am <= 0.5) return 0;
    int k = (int)(std::log1p((am - 0.5)*(BIN_RATIO - 1.0))/LOG_RATIO) + 1;
    return mu > 0 ? k : -k;
}

int main(int argc, char** argv) {
    const char* path = argc > 1 ? argv[1] : "/tmp/baseline_cells.txt";
    long ncycles = argc > 2 ? atol(argv[2]) : 2000;
    FILE* f = fopen(path, "r");
    if (!f) { fprintf(stderr, "no input %s\n", path); return 1; }
    if (fscanf(f, "%d %lf %lf %lf %lf %lf %lf %lf %lf", &N, &SIG, &EPS,
               &LAM, &BA, &BB, &GAM, &ACUT, &COS0) != 9) return 1;
    RC = ACUT*SIG; RC2 = RC*RC; RN = 1.18*RC; RN2 = RN*RN;
    LOG_RATIO = std::log(BIN_RATIO);
    Lattice lat[2];
    for (int l = 0; l < 2; l++) {
        for (int a = 0; a < 3; a++)
            for (int b = 0; b < 3; b++)
                if (fscanf(f, "%lf", &lat[l].h[a][b]) != 1) return 1;
        inv3(lat[l].h, lat[l].hinv);
        lat[l].r.resize(N);
        for (int i = 0; i < N; i++)
            if (fscanf(f, "%lf %lf %lf", &lat[l].r[i].x, &lat[l].r[i].y,
                       &lat[l].r[i].z) != 3) return 1;
    }
    fclose(f);

    for (int l = 0; l < 2; l++) {
        build_ivect(lat[l]);      // per-lattice image vectors
        build_neighbours(lat[l]);
        lat[l].energy = full_energy(lat[l]);
        printf("# lattice %d: E = %.6f eV (%.6f eV/mol), nn[0]=%d\n",
               l, lat[l].energy, lat[l].energy/N, lat[l].nn[0]);
    }

    const double kB = 8.617333262e-5;          // eV/K
    const double beta = 1.0/(kB*200.0);
    const double max_trans = 0.35;             // ~tuned step at 200 K
    std::mt19937_64 rng(12345);
    std::uniform_real_distribution<double> U(0.0, 1.0);

    double mu = beta*(lat[0].energy - lat[1].energy);
    int ls = 0;
    long naccept = 0, nswacc = 0;
    auto t0 = std::chrono::steady_clock::now();
    for (long cyc = 0; cyc < ncycles; cyc++) {
        if (cyc % 10 == 0)                      // list_update_int=10
            for (int l = 0; l < 2; l++) build_neighbours(lat[l]);
        for (int m = 0; m < N; m++) {
            int i = (int)(U(rng)*N); if (i >= N) i = N - 1;
            double eo[2], en[2];
            V3 old[2] = {lat[0].r[i], lat[1].r[i]};
            for (int l = 0; l < 2; l++)
                eo[l] = local_energy(lat[l], i, lat[l].r[i]);
            // displacement in the ACTIVE lattice; same fractional
            // displacement in the partner (mc_moves.F90:1042-1067)
            V3 dr = {(2*U(rng)-1)*max_trans, (2*U(rng)-1)*max_trans,
                     (2*U(rng)-1)*max_trans};
            const Lattice& A = lat[ls];
            double df[3] = {
                dr.x*A.hinv[0][0] + dr.y*A.hinv[1][0] + dr.z*A.hinv[2][0],
                dr.x*A.hinv[0][1] + dr.y*A.hinv[1][1] + dr.z*A.hinv[2][1],
                dr.x*A.hinv[0][2] + dr.y*A.hinv[1][2] + dr.z*A.hinv[2][2]};
            for (int l = 0; l < 2; l++) {
                const double (*h)[3] = lat[l].h;
                V3 drl = {df[0]*h[0][0] + df[1]*h[1][0] + df[2]*h[2][0],
                          df[0]*h[0][1] + df[1]*h[1][1] + df[2]*h[2][1],
                          df[0]*h[0][2] + df[1]*h[1][2] + df[2]*h[2][2]};
                lat[l].r[i] = old[l] + drl;
                en[l] = local_energy(lat[l], i, lat[l].r[i]);
            }
            double de0 = en[0] - eo[0], de1 = en[1] - eo[1];
            double mun = mu + beta*(de0 - de1);
            // eta lookup cost: bin index (logs) + flat-weight interp
            volatile int kb_ = mu_to_bin(mu) - mu_to_bin(mun);
            (void)kb_;
            double dls = ls == 0 ? de0 : de1;
            if (U(rng) < std::exp(-beta*dls)) {
                lat[0].energy += de0; lat[1].energy += de1;
                mu = mun; naccept++;
            } else {
                lat[0].r[i] = old[0]; lat[1].r[i] = old[1];
            }
            // always-switch attempt (mc_cycle, mc_moves.F90:243-249)
            double dsw = beta*(lat[1-ls].energy - lat[ls].energy);
            if (U(rng) < std::exp(-dsw)) { ls = 1 - ls; nswacc++; }
        }
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    long moves = ncycles*(long)N;
    double drift0 = lat[0].energy - full_energy(lat[0]);
    printf("# acc=%.3f swacc/move=%.3f drift0=%.2e eV mu=%.2f\n",
           (double)naccept/moves, (double)nswacc/moves, drift0, mu);
    printf("{\"N\": %d, \"moves\": %ld, \"seconds\": %.3f, "
           "\"moves_per_s\": %.0f}\n", N, moves, secs, moves/secs);
    return 0;
}
