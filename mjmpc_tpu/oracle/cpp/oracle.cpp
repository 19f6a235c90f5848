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
