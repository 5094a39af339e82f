// adaa_dsp — native host-side audio data-prep kernels.
//
// The reference's per-item decode pipeline runs in C via libsox
// (silence trim / resample, reference src/datasets/base_dataset.py:273-322);
// this library provides the TPU build's native equivalents for the
// dataloader hot path: PCM normalization, the RMS silence gate, and
// repeat-pad/cut. Exposed with a plain C ABI for ctypes binding
// (adaa_tpu/data/native.py); numpy fallbacks exist for every entry.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <memory>

extern "C" {

// int16 PCM -> float32 in [-1, 1) (torchaudio.load normalize=True).
void adaa_normalize_i16(const int16_t* in, float* out, int64_t n) {
    constexpr float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * k;
}

// Sliding-RMS silence gate with the reference's sox parameters
// (silence 1 0.2 1% -1 0.2 1%): drop leading silence before the first
// active sample and every interior/trailing silent run longer than
// min_run samples. Activity = any window of `win` samples with RMS >=
// threshold covering the sample. Returns the kept length; out must
// have capacity n. If everything is silent, copies the input through
// (the reference keeps the original in that case).
int64_t adaa_trim_silence(const float* x, int64_t n, float* out,
                          int64_t win, int64_t min_run, float threshold) {
    if (n < win + 1) {
        std::memcpy(out, x, n * sizeof(float));
        return n;
    }
    const float thr2 = threshold * threshold * (float)win;

    // prefix sums of squares (double for stability on long files)
    // activity painting via run accumulation
    std::unique_ptr<double[]> sq(new double[n + 1]);
    sq[0] = 0.0;
    for (int64_t i = 0; i < n; ++i) sq[i + 1] = sq[i] + (double)x[i] * x[i];

    std::unique_ptr<uint8_t[]> active(new uint8_t[n]());
    int64_t paint_until = -1;
    bool any = false;
    for (int64_t i = 0; i + win <= n; ++i) {
        double e = sq[i + win] - sq[i];
        if (e >= (double)thr2) {
            int64_t end = std::min(i + win, n);
            int64_t start = std::max(i, paint_until + 1);
            for (int64_t j = start; j < end; ++j) active[j] = 1;
            paint_until = end - 1;
            any = true;
        }
    }
    if (!any) {
        std::memcpy(out, x, n * sizeof(float));
        return n;
    }

    // leading edge: start at the first sample that is both inside an
    // active window and individually above threshold (sox begins output
    // at the triggering sample, not at the window boundary)
    int64_t first = 0;
    while (first < n && !(active[first] && std::fabs(x[first]) >= threshold))
        ++first;
    if (first == n) {  // no individually-loud sample: fall back
        first = 0;
        while (first < n && !active[first]) ++first;
    }

    int64_t m = 0;
    int64_t i = first;
    while (i < n) {
        if (active[i]) {
            out[m++] = x[i++];
            continue;
        }
        int64_t j = i;
        while (j < n && !active[j]) ++j;
        if (j - i <= min_run) {  // short pause: keep it
            for (int64_t k2 = i; k2 < j; ++k2) out[m++] = x[k2];
        }
        i = j;
    }
    if (m == 0) {
        std::memcpy(out, x, n * sizeof(float));
        return n;
    }
    return m;
}

// Repeat-pad / cut to exactly `cut` samples (PadDataset.apply_pad).
void adaa_repeat_pad(const float* in, int64_t n, float* out, int64_t cut) {
    if (n >= cut) {
        std::memcpy(out, in, cut * sizeof(float));
        return;
    }
    int64_t off = 0;
    while (off < cut) {
        int64_t chunk = std::min(n, cut - off);
        std::memcpy(out + off, in, chunk * sizeof(float));
        off += chunk;
    }
}

}  // extern "C"
