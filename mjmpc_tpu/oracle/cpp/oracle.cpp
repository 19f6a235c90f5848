// CPU rollout oracle — the native cross-check layer.
//
// Plays the role of the reference's first-party native component (the
// Cython batched rollout, /root/reference/mjmpc/envs/gym_env_wrapper_cy.pyx:
// a typed loop driving the simulator and collecting costs; build disabled
// upstream). Used to validate the TPU engine's rollout numerics from an
// independent, serial, double-precision implementation:
//   - AR(2) filtered-noise recurrence (control_utils.py:24-34 semantics)
//   - discounted cost-to-go (control_utils.py:37-46)
//   - per-particle pendulum / LQR rollout loops (gym_env_wrapper.py:125-153)
//   - full MPPI update (mppi.py:69-97) for end-to-end solve parity.
//
// Compiled on demand by cpp_oracle.py (g++ -O2 -shared); exposed via ctypes.

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// In-place AR(2) IIR filter along the horizon axis.
// eps: [n, h, da] row-major.
void ar_filter(double* eps, int64_t n, int64_t h, int64_t da,
               double b0, double b1, double b2) {
    if (h <= 2) return;
    for (int64_t i = 0; i < n; ++i) {
        double* p = eps + i * h * da;
        for (int64_t t = 2; t < h; ++t) {
            for (int64_t d = 0; d < da; ++d) {
                p[t * da + d] = b0 * p[t * da + d]
                              + b1 * p[(t - 1) * da + d]
                              + b2 * p[(t - 2) * da + d];
            }
        }
    }
}

// Discounted cost-to-go: out[i, t] = sum_{s>=t} gamma^(s-t) c[i, s],
// computed by the backward recurrence (exact at gamma = 0).
void cost_to_go(const double* costs, double* out, int64_t n, int64_t h,
                const double* gamma_seq) {
    double gamma = (h > 1) ? gamma_seq[1] / gamma_seq[0] : 0.0;
    for (int64_t i = 0; i < n; ++i) {
        const double* c = costs + i * h;
        double* o = out + i * h;
        double acc = 0.0;
        for (int64_t t = h - 1; t >= 0; --t) {
            acc = c[t] + gamma * acc;
            o[t] = acc;
        }
    }
}

// Serial per-particle pendulum rollout (mirrors envs/pendulum.py step).
// mean: [h], noise: [n, h]; costs_out: [n, h]. Every particle restarts
// from the same (th0, thdot0) — the reference's set_env_state-per-particle.
void pendulum_rollout(double g, double m, double l, double dt,
                      double max_speed, double max_torque,
                      double th0, double thdot0,
                      const double* mean, const double* noise,
                      int64_t n, int64_t h, double* costs_out) {
    const double pi = 3.14159265358979323846;
    for (int64_t i = 0; i < n; ++i) {
        double th = th0, thdot = thdot0;
        for (int64_t t = 0; t < h; ++t) {
            double u = mean[t] + noise[i * h + t];
            if (u > max_torque) u = max_torque;
            if (u < -max_torque) u = -max_torque;
            double ang = std::fmod(th + pi, 2.0 * pi);
            if (ang < 0) ang += 2.0 * pi;
            ang -= pi;
            costs_out[i * h + t] =
                ang * ang + 0.1 * thdot * thdot + 0.001 * u * u;
            thdot += (-3.0 * g / (2.0 * l) * std::sin(th + pi)
                      + 3.0 / (m * l * l) * u) * dt;
            th += thdot * dt;  // pre-clip velocity, like the env
            if (thdot > max_speed) thdot = max_speed;
            if (thdot < -max_speed) thdot = -max_speed;
        }
    }
}

// Serial LQR rollout: x' = A x + B u, cost = x^T Q x + u^T R u.
// A: [dx, dx], B: [dx, du], Q diag: [dx], R diag: [du],
// mean: [h, du], noise: [n, h, du], costs_out: [n, h].
void lqr_rollout(const double* A, const double* B, const double* Qd,
                 const double* Rd, const double* x0,
                 const double* mean, const double* noise,
                 int64_t n, int64_t h, int64_t dx, int64_t du,
                 double* costs_out) {
    std::vector<double> x(dx), xn(dx);
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t k = 0; k < dx; ++k) x[k] = x0[k];
        for (int64_t t = 0; t < h; ++t) {
            const double* u = nullptr;
            std::vector<double> uv(du);
            for (int64_t d = 0; d < du; ++d)
                uv[d] = mean[t * du + d] + noise[(i * h + t) * du + d];
            u = uv.data();
            double c = 0.0;
            for (int64_t k = 0; k < dx; ++k) c += Qd[k] * x[k] * x[k];
            for (int64_t d = 0; d < du; ++d) c += Rd[d] * u[d] * u[d];
            costs_out[i * h + t] = c;
            for (int64_t k = 0; k < dx; ++k) {
                double s = 0.0;
                for (int64_t j = 0; j < dx; ++j) s += A[k * dx + j] * x[j];
                for (int64_t d = 0; d < du; ++d) s += B[k * du + d] * u[d];
                xn[k] = s;
            }
            x.swap(xn);
        }
    }
}

// Full MPPI mean update (mppi.py:69-97, alpha=1: no control cost):
// w = softmax(-ctg[:,0]/lam); new_mean = (1-ss)*mean + ss * sum_i w_i a_i.
void mppi_update(const double* mean, const double* actions,
                 const double* costs, int64_t n, int64_t h, int64_t da,
                 double gamma, double lam, double step_size,
                 double* new_mean) {
    std::vector<double> ctg0(n);
    for (int64_t i = 0; i < n; ++i) {
        const double* c = costs + i * h;
        double acc = 0.0;
        for (int64_t t = h - 1; t >= 0; --t) acc = c[t] + gamma * acc;
        ctg0[i] = acc;
    }
    double mx = ctg0[0];
    for (int64_t i = 1; i < n; ++i) mx = std::min(mx, ctg0[i]);
    double z = 0.0;
    std::vector<double> w(n);
    for (int64_t i = 0; i < n; ++i) {
        w[i] = std::exp(-(ctg0[i] - mx) / lam);
        z += w[i];
    }
    for (int64_t t = 0; t < h; ++t) {
        for (int64_t d = 0; d < da; ++d) {
            double s = 0.0;
            for (int64_t i = 0; i < n; ++i)
                s += w[i] / z * actions[(i * h + t) * da + d];
            new_mean[t * da + d] =
                (1.0 - step_size) * mean[t * da + d] + step_size * s;
        }
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Serial double-precision kinematic-chain engine (hinge/slide joints) —
// the independent cross-check for engine/chain.py (VERDICT r1 item 7).
//
// The JAX engine derives Coriolis/gravity bias by AD of a tangent-space
// Lagrangian; here the SAME quantities come from a classic world-frame
// recursive Newton-Euler pass (qdd = 0) and the mass matrix from
// geometric-Jacobian composition — different algorithms, so agreement is
// evidence, not tautology. Mirrors mujoco_py's role for the reference's
// arm models (/root/reference/mjmpc/envs/gym_env_wrapper_cy.pyx:75-136).
// ---------------------------------------------------------------------------

namespace {

struct V3 { double x, y, z; };

inline V3 v3(const double* p) { return {p[0], p[1], p[2]}; }
inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 operator*(double s, V3 a) { return {s * a.x, s * a.y, s * a.z}; }
inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(V3 a, V3 b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}

struct M3 { double m[9]; };

inline V3 mul(const M3& r, V3 v) {
    return {r.m[0] * v.x + r.m[1] * v.y + r.m[2] * v.z,
            r.m[3] * v.x + r.m[4] * v.y + r.m[5] * v.z,
            r.m[6] * v.x + r.m[7] * v.y + r.m[8] * v.z};
}

inline M3 mul(const M3& a, const M3& b) {
    M3 o{};
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
            double s = 0;
            for (int k = 0; k < 3; ++k) s += a.m[i * 3 + k] * b.m[k * 3 + j];
            o.m[i * 3 + j] = s;
        }
    return o;
}

inline M3 eye3() { return {{1, 0, 0, 0, 1, 0, 0, 0, 1}}; }

// Rodrigues rotation about a unit axis.
inline M3 axis_rot(V3 a, double ang) {
    double c = std::cos(ang), s = std::sin(ang), t = 1.0 - c;
    return {{t * a.x * a.x + c,       t * a.x * a.y - s * a.z,
             t * a.x * a.z + s * a.y,
             t * a.x * a.y + s * a.z, t * a.y * a.y + c,
             t * a.y * a.z - s * a.x,
             t * a.x * a.z - s * a.y, t * a.y * a.z + s * a.x,
             t * a.z * a.z + c}};
}

// world inertia about COM: R I R^T
inline M3 world_inertia(const M3& r, const double* inertia) {
    M3 i{{inertia[0], inertia[1], inertia[2], inertia[3], inertia[4],
          inertia[5], inertia[6], inertia[7], inertia[8]}};
    M3 rt{{r.m[0], r.m[3], r.m[6], r.m[1], r.m[4], r.m[7],
           r.m[2], r.m[5], r.m[8]}};
    return mul(mul(r, i), rt);
}

struct ChainModel {
    int64_t n;
    const int64_t* parent;
    const int64_t* jtype;      // 0 = hinge, 1 = slide
    const double* axis;        // [n,3] child-frame
    const double* body_pos;    // [n,3]
    const double* mass;        // [n]
    const double* com;         // [n,3]
    const double* inertia;     // [n,9]
};

// forward kinematics: world rotations, frame origins, world joint axes
void fk(const ChainModel& mm, const double* q,
        std::vector<M3>& R, std::vector<V3>& P, std::vector<V3>& A) {
    R.resize(mm.n); P.resize(mm.n); A.resize(mm.n);
    for (int64_t i = 0; i < mm.n; ++i) {
        int64_t pi = mm.parent[i];
        M3 rp = (pi < 0) ? eye3() : R[pi];
        V3 pp = (pi < 0) ? V3{0, 0, 0} : P[pi];
        V3 ax_local = v3(mm.axis + 3 * i);
        V3 bp = v3(mm.body_pos + 3 * i);
        if (mm.jtype[i] == 0) {  // hinge
            P[i] = pp + mul(rp, bp);
            R[i] = mul(rp, axis_rot(ax_local, q[i]));
            A[i] = mul(R[i], ax_local);
        } else {                 // slide
            V3 aw = mul(rp, ax_local);
            P[i] = pp + mul(rp, bp) + q[i] * aw;
            R[i] = rp;
            A[i] = aw;
        }
    }
}

}  // namespace

extern "C" {

// M [n,n] by geometric-Jacobian composition.
void chain_mass_matrix(int64_t n, const int64_t* parent,
                       const int64_t* jtype, const double* axis,
                       const double* body_pos, const double* mass,
                       const double* com, const double* inertia,
                       const double* q, double* m_out) {
    ChainModel mm{n, parent, jtype, axis, body_pos, mass, com, inertia};
    std::vector<M3> R; std::vector<V3> P, A;
    fk(mm, q, R, P, A);
    for (int64_t i = 0; i < n * n; ++i) m_out[i] = 0.0;
    std::vector<V3> jv(n), jw(n);
    std::vector<int64_t> anc;
    for (int64_t i = 0; i < n; ++i) {
        V3 ci = P[i] + mul(R[i], v3(com + 3 * i));
        M3 iw = world_inertia(R[i], inertia + 9 * i);
        anc.clear();
        for (int64_t k = i; k >= 0; k = parent[k]) anc.push_back(k);
        for (int64_t k : anc) {
            if (jtype[k] == 0) { jv[k] = cross(A[k], ci - P[k]); jw[k] = A[k]; }
            else               { jv[k] = A[k]; jw[k] = {0, 0, 0}; }
        }
        for (int64_t a_ : anc)
            for (int64_t b_ : anc) {
                double val = mass[i] * dot(jv[a_], jv[b_])
                           + dot(jw[a_], mul(iw, jw[b_]));
                m_out[a_ * n + b_] += val;
            }
    }
}

// Coriolis/centrifugal + gravity generalized forces by recursive
// Newton-Euler with qdd = 0 (same sign convention as chain.bias_forces:
// M qacc = tau - bias - D qd).
void chain_bias(int64_t n, const int64_t* parent, const int64_t* jtype,
                const double* axis, const double* body_pos,
                const double* mass, const double* com,
                const double* inertia, const double* gravity,
                const double* q, const double* qd, double* bias_out) {
    ChainModel mm{n, parent, jtype, axis, body_pos, mass, com, inertia};
    std::vector<M3> R; std::vector<V3> P, A;
    fk(mm, q, R, P, A);
    V3 g = v3(gravity);
    std::vector<V3> w(n), dw(n), vo(n), ao(n), Fc(n), Nc(n), fa(n), na(n);
    for (int64_t i = 0; i < n; ++i) {
        int64_t pi = parent[i];
        V3 wp = (pi < 0) ? V3{0, 0, 0} : w[pi];
        V3 dwp = (pi < 0) ? V3{0, 0, 0} : dw[pi];
        V3 vp = (pi < 0) ? V3{0, 0, 0} : vo[pi];
        V3 ap = (pi < 0) ? V3{0, 0, 0} : ao[pi];
        V3 pp = (pi < 0) ? V3{0, 0, 0} : P[pi];
        V3 r = P[i] - pp;
        if (jtype[i] == 0) {  // hinge: origin fixed in parent
            w[i] = wp + qd[i] * A[i];
            dw[i] = dwp + qd[i] * cross(wp, A[i]);
            vo[i] = vp + cross(wp, r);
            ao[i] = ap + cross(dwp, r) + cross(wp, cross(wp, r));
        } else {              // slide
            w[i] = wp;
            dw[i] = dwp;
            vo[i] = vp + cross(wp, r) + qd[i] * A[i];
            ao[i] = ap + cross(dwp, r) + cross(wp, cross(wp, r))
                  + 2.0 * qd[i] * cross(wp, A[i]);
        }
        V3 rc = mul(R[i], v3(com + 3 * i));
        V3 acc_c = ao[i] + cross(dw[i], rc) + cross(w[i], cross(w[i], rc));
        M3 iw = world_inertia(R[i], inertia + 9 * i);
        Fc[i] = mass[i] * (acc_c - g);
        Nc[i] = mul(iw, dw[i]) + cross(w[i], mul(iw, w[i]));
        fa[i] = {0, 0, 0}; na[i] = {0, 0, 0};
    }
    for (int64_t i = n - 1; i >= 0; --i) {
        V3 rc = mul(R[i], v3(com + 3 * i));
        V3 f = Fc[i] + fa[i];
        V3 nmom = Nc[i] + cross(rc, Fc[i]) + na[i];
        bias_out[i] = (jtype[i] == 0) ? dot(A[i], nmom) : dot(A[i], f);
        int64_t pi = parent[i];
        if (pi >= 0) {
            fa[pi] = fa[pi] + f;
            na[pi] = na[pi] + nmom + cross(P[i] - P[pi], f);
        }
    }
}

// site world position (reference 'finger' site)
void chain_site(int64_t n, const int64_t* parent, const int64_t* jtype,
                const double* axis, const double* body_pos,
                const double* q, int64_t site_body,
                const double* site_pos, double* out3) {
    ChainModel mm{n, parent, jtype, axis, body_pos, nullptr, nullptr,
                  nullptr};
    std::vector<M3> R; std::vector<V3> P, A;
    fk(mm, q, R, P, A);
    V3 s = P[site_body] + mul(R[site_body], v3(site_pos));
    out3[0] = s.x; out3[1] = s.y; out3[2] = s.z;
}

// Semi-implicit Euler with implicit joint damping + limit projection —
// the engine's step() semantics, serial f64.
void chain_step(int64_t n, const int64_t* parent, const int64_t* jtype,
                const double* axis, const double* body_pos,
                const double* mass, const double* com,
                const double* inertia, const double* armature,
                const double* damping, const double* stiffness,
                const double* gear, const double* qlow,
                const double* qhigh, const double* gravity,
                double dt, int64_t n_substeps,
                const double* ctrl, double* q, double* qd) {
    std::vector<double> M(n * n), bias(n), rhs(n), acc(n);
    for (int64_t s = 0; s < n_substeps; ++s) {
        chain_mass_matrix(n, parent, jtype, axis, body_pos, mass, com,
                          inertia, q, M.data());
        chain_bias(n, parent, jtype, axis, body_pos, mass, com, inertia,
                   gravity, q, qd, bias.data());
        for (int64_t i = 0; i < n; ++i) {
            M[i * n + i] += armature[i] + dt * damping[i];
            rhs[i] = gear[i] * ctrl[i] - bias[i] - damping[i] * qd[i]
                   - stiffness[i] * q[i];
        }
        // Cholesky solve (M is SPD)
        for (int64_t i = 0; i < n; ++i) {
            for (int64_t j = 0; j <= i; ++j) {
                double sum = M[i * n + j];
                for (int64_t k = 0; k < j; ++k)
                    sum -= M[i * n + k] * M[j * n + k];
                M[i * n + j] = (i == j) ? std::sqrt(sum)
                                        : sum / M[j * n + j];
            }
        }
        for (int64_t i = 0; i < n; ++i) {
            double sum = rhs[i];
            for (int64_t k = 0; k < i; ++k) sum -= M[i * n + k] * acc[k];
            acc[i] = sum / M[i * n + i];
        }
        for (int64_t i = n - 1; i >= 0; --i) {
            double sum = acc[i];
            for (int64_t k = i + 1; k < n; ++k)
                sum -= M[k * n + i] * acc[k];
            acc[i] = sum / M[i * n + i];
        }
        for (int64_t i = 0; i < n; ++i) {
            qd[i] += dt * acc[i];
            q[i] += dt * qd[i];
            if (q[i] < qlow[i]) { q[i] = qlow[i]; qd[i] = 0.0; }
            if (q[i] > qhigh[i]) { q[i] = qhigh[i]; qd[i] = 0.0; }
        }
    }
}

}  // extern "C"
