// Monotonic Alignment Search — host C++/OpenMP kernel.
//
// Native equivalent of the reference's single native component, the Cython
// kernel at monotonic_align/core.pyx:9-45 (Viterbi-style banded DP with
// OpenMP prange over the batch).  On TPU the primary path is the on-device
// Pallas kernel (glow_tts_tpu/ops/mas.py); this kernel exists as the fast
// host fallback / cross-check and for CPU-only deployments.
//
// Build: make -C native  (produces libmas.so, loaded via ctypes).

#include <algorithm>
#include <cstdint>

namespace {

constexpr float kNeg = -1e9f;

// DP + backtrace for one utterance.
// value: [t_tok_max, t_mel_max] row-major, consumed in place.
// path:  [t_tok_max, t_mel_max] int32, zero-initialised by caller.
void maximum_path_single(int32_t* path, float* value, int t_x, int t_y,
                         int t_mel_max) {
  for (int y = 0; y < t_y; ++y) {
    const int x_lo = std::max(0, t_x + y - t_y);
    const int x_hi = std::min(t_x, y + 1);
    for (int x = x_lo; x < x_hi; ++x) {
      const float stay = (x == y) ? kNeg : value[x * t_mel_max + (y - 1)];
      float move;
      if (x == 0) {
        move = (y == 0) ? 0.0f : kNeg;
      } else {
        move = value[(x - 1) * t_mel_max + (y - 1)];
      }
      value[x * t_mel_max + y] += std::max(stay, move);
    }
  }
  int index = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[index * t_mel_max + y] = 1;
    if (index != 0 &&
        (index == y || value[index * t_mel_max + (y - 1)] <
                           value[(index - 1) * t_mel_max + (y - 1)])) {
      --index;
    }
  }
}

}  // namespace

extern "C" {

// paths:  [b, t_tok_max, t_mel_max] int32 (zeroed by caller)
// values: [b, t_tok_max, t_mel_max] float32 (masked log-probabilities;
//         clobbered — used as the DP table)
// t_xs, t_ys: [b] int32 valid lengths
void maximum_path_batch(int32_t* paths, float* values, const int32_t* t_xs,
                        const int32_t* t_ys, int b, int t_tok_max,
                        int t_mel_max) {
  const int64_t stride = static_cast<int64_t>(t_tok_max) * t_mel_max;
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < b; ++i) {
    maximum_path_single(paths + i * stride, values + i * stride, t_xs[i],
                        t_ys[i], t_mel_max);
  }
}

}  // extern "C"
