// circkit: native circuit-runtime kernels for adaptaqc_tpu.
//
// The reference offloads its performance-critical simulation to Aer's C++;
// in this framework the simulation is XLA, and the remaining native-worthy
// hot path is the host-side circuit runtime: peephole simplification
// (reverse-scan 1q Euler merges + 2q pair cancellation, O(G^2) in Python),
// gate-range bookkeeping and depth computation over flat gate arrays.
// Mirrors the semantics of adaptaqc_tpu/circuits/peephole.py (which mirrors
// /root/reference/adaptaqc/utils/circuit_operations/
// circuit_operations_optimisation.py).
//
// ABI: flat arrays over gates:
//   kinds: int32 (gate kind ids from circuits/gates.py; CXR = 15)
//   q0, q1: int32 (q1 = -1 for 1-qubit gates)
//   angles: float64
//   flags:  uint8 bit0 = trainable supported-1q rotation (label rx/ry/rz)
// Build: make -C native   (produces libcirckit.so)

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <vector>

using cplx = std::complex<double>;

namespace {

constexpr int K_NOP = 0, K_RX = 1, K_RY = 2, K_RZ = 3, K_CX = 4, K_CZ = 5,
              K_H = 6, K_X = 7, K_Y = 8, K_Z = 9, K_S = 10, K_SDG = 11,
              K_T = 12, K_TDG = 13, K_SWAP = 14, K_CXR = 15;

struct Mat2 {
    cplx a, b, c, d;  // [[a, b], [c, d]]
    Mat2 operator*(const Mat2 &o) const {
        return {a * o.a + b * o.c, a * o.b + b * o.d,
                c * o.a + d * o.c, c * o.b + d * o.d};
    }
};

Mat2 gate_matrix(int kind, double angle) {
    const double h = angle / 2.0;
    const cplx i(0.0, 1.0);
    switch (kind) {
        case K_RX: return {std::cos(h), -i * std::sin(h), -i * std::sin(h), std::cos(h)};
        case K_RY: return {std::cos(h), -std::sin(h), std::sin(h), std::cos(h)};
        case K_RZ: return {std::exp(-i * h), 0.0, 0.0, std::exp(i * h)};
        case K_H:  { double s = 1.0 / std::sqrt(2.0); return {s, s, s, -s}; }
        case K_X:  return {0.0, 1.0, 1.0, 0.0};
        case K_Y:  return {0.0, -i, i, 0.0};
        case K_Z:  return {1.0, 0.0, 0.0, -1.0};
        case K_S:  return {1.0, 0.0, 0.0, i};
        case K_SDG:return {1.0, 0.0, 0.0, -i};
        case K_T:  return {1.0, 0.0, 0.0, std::exp(i * (M_PI / 4))};
        case K_TDG:return {1.0, 0.0, 0.0, std::exp(-i * (M_PI / 4))};
        default:   return {1.0, 0.0, 0.0, 1.0};
    }
}

// ZYZ decomposition: U ~ e^{i p} Rz(phi) Ry(theta) Rz(lam)
void euler_angles(const Mat2 &m, double &theta, double &phi, double &lam) {
    cplx det = m.a * m.d - m.b * m.c;
    cplx sq = std::sqrt(det);
    Mat2 u{m.a / sq, m.b / sq, m.c / sq, m.d / sq};
    theta = 2.0 * std::atan2(std::abs(u.c), std::abs(u.a));
    double ppl = 2.0 * std::arg(u.d);
    double pml = 2.0 * std::arg(u.c);
    phi = (ppl + pml) / 2.0;
    lam = (ppl - pml) / 2.0;
}

struct Gates {
    int n;
    int32_t *kinds, *q0, *q1;
    double *angles;
    uint8_t *flags;

    bool is_supported_1q(int i) const { return flags[i] & 1; }
    bool is_2q(int i) const { return q1[i] >= 0; }
    bool touches(int i, int q) const { return q0[i] == q || q1[i] == q; }
    int prev_on_qubits(int i) const {
        for (int j = i - 1; j >= 0; --j)
            if (touches(j, q0[i]) || (is_2q(i) && touches(j, q1[i]))) return j;
        return -1;
    }
};

int compact(Gates &g, const std::vector<uint8_t> &remove) {
    int w = 0;
    for (int r = 0; r < g.n; ++r) {
        if (remove[r]) continue;
        g.kinds[w] = g.kinds[r]; g.q0[w] = g.q0[r]; g.q1[w] = g.q1[r];
        g.angles[w] = g.angles[r]; g.flags[w] = g.flags[r];
        ++w;
    }
    return w;
}

void set_rot(Gates &g, int i, int kind, double angle) {
    g.kinds[i] = kind;
    g.angles[i] = angle;
    g.flags[i] |= 1;
}

// 1q merge pass (optimisation.py:76-164)
int pass_1q(Gates &g, int lo, int hi, bool rm_zero, bool rm_small, double min_angle) {
    std::vector<uint8_t> remove(g.n, 0), dealt(g.n, 0);
    for (int idx = hi - 1; idx >= lo; --idx) {
        if (remove[idx] || dealt[idx] || !g.is_supported_1q(idx)) continue;
        double a = g.angles[idx];
        if ((rm_zero && a == 0.0) || (rm_small && std::fabs(a) < min_angle)) {
            remove[idx] = 1;
            continue;
        }
        Mat2 m = gate_matrix(g.kinds[idx], a);
        std::vector<int> chain{idx};
        int q = g.q0[idx];
        int j = idx;
        while (true) {
            int p = -1;
            for (int k = j - 1; k >= 0; --k)
                if (g.touches(k, q)) { p = k; break; }
            if (p < 0 || !g.is_supported_1q(p) || p < lo) break;
            double pa = g.angles[p];
            if ((rm_zero && pa == 0.0) || (rm_small && std::fabs(pa) < min_angle)) {
                remove[p] = 1;
            } else {
                chain.push_back(p);
                m = m * gate_matrix(g.kinds[p], pa);
            }
            j = p;
        }
        if ((int)chain.size() > 3) {
            double theta, phi, lam;
            euler_angles(m, theta, phi, lam);
            set_rot(g, chain[0], K_RZ, phi);
            set_rot(g, chain[1], K_RY, theta);
            set_rot(g, chain[2], K_RZ, lam);
            dealt[chain[1]] = dealt[chain[2]] = 1;
            for (size_t k = 3; k < chain.size(); ++k) remove[chain[k]] = 1;
        } else {
            for (int c : chain) dealt[c] = 1;
        }
    }
    return compact(g, remove);
}

// 2q pair cancellation (optimisation.py:167-204)
int pass_2q(Gates &g, int lo, int hi) {
    std::vector<uint8_t> remove(g.n, 0), dealt(g.n, 0);
    for (int idx = hi - 1; idx >= lo; --idx) {
        int kind = g.kinds[idx];
        if (kind != K_CX && kind != K_CZ && kind != K_CXR) continue;
        if (remove[idx] || dealt[idx]) continue;
        int p = g.prev_on_qubits(idx);
        if (p < 0 || g.kinds[p] != kind || p < lo) continue;
        if (remove[p] || dealt[p]) continue;
        if (g.q0[p] == g.q0[idx] && g.q1[p] == g.q1[idx]) {
            remove[idx] = remove[p] = 1;
        }
    }
    return compact(g, remove);
}

}  // namespace

extern "C" {

// Iterate 1q merge + 2q cancel to fixpoint (optimisation.py:31-73).
// Returns the new gate count; arrays are compacted in place.
// range_hi < 0 means "end of circuit"; the range tracks shrinkage.
int ck_peephole(int n_gates, int32_t *kinds, int32_t *q0, int32_t *q1,
                double *angles, uint8_t *flags, int range_lo, int range_hi,
                int remove_zero, int remove_small, double min_angle) {
    Gates g{n_gates, kinds, q0, q1, angles, flags};
    int lo = range_lo;
    int hi = (range_hi < 0) ? n_gates : range_hi;
    int last_len = g.n;
    int phase = 0;
    while (true) {
        int new_n;
        if (phase == 0) {
            new_n = pass_1q(g, lo, hi, remove_zero != 0, remove_small != 0, min_angle);
            phase = 1;
        } else {
            new_n = pass_2q(g, lo, hi);
            phase = 0;
        }
        if (new_n != last_len) {
            hi -= last_len - new_n;
            g.n = new_n;
            last_len = new_n;
        } else if (phase == 0) {
            return g.n;
        }
    }
}

// Depth restricted to multi-qubit gates (utilityfunctions.py:281-288).
int ck_multi_qubit_gate_depth(int n_gates, const int32_t *q0,
                              const int32_t *q1, int num_qubits) {
    std::vector<int> levels(num_qubits, 0);
    int depth = 0;
    for (int i = 0; i < n_gates; ++i) {
        bool multi = q1[i] >= 0;
        int l = levels[q0[i]];
        if (multi && levels[q1[i]] > l) l = levels[q1[i]];
        if (multi) l += 1;
        levels[q0[i]] = l;
        if (multi) levels[q1[i]] = l;
        if (l > depth) depth = l;
    }
    return depth;
}

int ck_version() { return 1; }

}  // extern "C"
