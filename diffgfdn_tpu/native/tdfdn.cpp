// Sample-exact GFDN time-domain processor (native streaming renderer).
//
// The JAX block-feedforward core (kernels/tdgfdn.py) owns batch synthesis on
// TPU; this C++ processor is the host-side real-time audio path: stateful
// streaming with per-callback block processing, no JAX/device dependency.
// Built as a shared library, bound via ctypes (diffgfdn_tpu/native/tdfdn.py).
//
// Model (matches the frequency-sampled transfer function, see
// models/feedback_loop.py): per line i with delay m_i and whole-delay gain
// g_i, the delay-line output is y_i[t] = g_i * x_i[t - m_i];
// x[t] = A y[t] + b u[t]; output_j[t] = c_j . y[t] + d * u[t].

#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct TDFDN {
    int n = 0;
    std::vector<int> delays;
    std::vector<float> gains;   // whole-delay absorption gains
    std::vector<float> a;       // n x n feedback matrix, row major
    std::vector<float> b;       // input gains
    std::vector<std::vector<float>> ring;  // per-line ring buffers
    std::vector<int> pos;       // ring write/read cursor per line
    std::vector<float> y;       // scratch: current delay-line outputs
};

}  // namespace

extern "C" {

TDFDN* tdfdn_create(int n, const int* delays, const float* gains,
                    const float* a, const float* b) {
    TDFDN* f = new TDFDN();
    f->n = n;
    f->delays.assign(delays, delays + n);
    f->gains.assign(gains, gains + n);
    f->a.assign(a, a + n * n);
    f->b.assign(b, b + n);
    f->ring.resize(n);
    f->pos.assign(n, 0);
    for (int i = 0; i < n; ++i) f->ring[i].assign(delays[i], 0.0f);
    f->y.assign(n, 0.0f);
    return f;
}

void tdfdn_destroy(TDFDN* f) { delete f; }

void tdfdn_reset(TDFDN* f) {
    for (int i = 0; i < f->n; ++i)
        std::fill(f->ring[i].begin(), f->ring[i].end(), 0.0f);
    std::fill(f->pos.begin(), f->pos.end(), 0);
}

// Process n_samples through the FDN for n_outs simultaneous output taps.
//   in:   n_samples input samples
//   c:    n_outs x n output-gain matrix (row major)
//   out:  n_outs x n_samples output buffer (row major), OVERWRITTEN
//   direct: direct-path gain added to every output
void tdfdn_process(TDFDN* f, const float* in, long n_samples, const float* c,
                   int n_outs, float direct, float* out) {
    const int n = f->n;
    for (long t = 0; t < n_samples; ++t) {
        // read delayed, attenuated line outputs
        for (int i = 0; i < n; ++i) {
            f->y[i] = f->gains[i] * f->ring[i][f->pos[i]];
        }
        const float u = in[t];
        // outputs: C y + d u
        for (int j = 0; j < n_outs; ++j) {
            const float* cj = c + (size_t)j * n;
            float acc = direct * u;
            for (int i = 0; i < n; ++i) acc += cj[i] * f->y[i];
            out[(size_t)j * n_samples + t] = acc;
        }
        // feedback: x = A y + b u, written into the ring buffers
        for (int i = 0; i < n; ++i) {
            const float* ai = f->a.data() + (size_t)i * n;
            float acc = f->b[i] * u;
            for (int k = 0; k < n; ++k) acc += ai[k] * f->y[k];
            f->ring[i][f->pos[i]] = acc;
            f->pos[i] = (f->pos[i] + 1) % f->delays[i];
        }
    }
}

}  // extern "C"
