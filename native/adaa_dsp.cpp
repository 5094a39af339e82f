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

// Exact port of the sox `silence` effect state machine (sox 14.4.x
// silence.c) for mono float input — the engine behind the reference's
// SOX_SILENCE trim (reference src/datasets/base_dataset.py:29-33,
// 273-286, applied via torchaudio.sox_effects.apply_effects_tensor).
//
// Semantics reproduced:
//  * per-sample activity = sliding RMS over the trailing `window_size`
//    samples (sox uses rate/50, i.e. 20 ms), including the current
//    sample, compared >= threshold;
//  * SILENCE_TRIM: discard input until `start_duration` CONSECUTIVE
//    above-threshold samples are seen; that triggering run (the
//    holdoff buffer) is emitted once `start_periods` runs completed;
//  * SILENCE_COPY: copy through; below-threshold samples accumulate in
//    a holdoff buffer — if sound resumes before `stop_duration`
//    samples, the holdoff is flushed (short pauses kept); if the
//    holdoff fills, the silence is DISCARDED and (stop_periods < 0 =
//    sox "restart" mode) the machine returns to SILENCE_TRIM with a
//    cleared RMS window; without restart, processing stops (samples
//    after the silence are dropped);
//  * drain at EOF: a partial stop-holdoff (trailing silence shorter
//    than stop_duration) is flushed; a partial start-holdoff (sound
//    run shorter than start_duration) is discarded — both as in sox's
//    drain().
//
// Returns the number of output samples written to `out` (capacity n).
int64_t adaa_sox_silence(const float* x, int64_t n, float* out,
                         int32_t start_periods, int64_t start_duration,
                         float start_threshold,
                         int32_t stop_periods_in, int64_t stop_duration,
                         float stop_threshold, int64_t window_size) {
    const bool do_start = start_periods > 0;
    const bool restart = stop_periods_in < 0;
    const int32_t stop_periods = restart ? -stop_periods_in : stop_periods_in;
    const bool do_stop = stop_periods_in != 0;
    if (window_size < 1) window_size = 1;
    if (start_duration < 1) start_duration = 1;
    if (stop_duration < 1) stop_duration = 1;

    // sliding-RMS circular window of squared samples (silence.c
    // compute_rms/update_rms: compute includes the incoming sample in
    // place of the oldest; update then commits it)
    std::unique_ptr<double[]> win(new double[window_size]());
    int64_t cur = 0;
    double rms_sum = 0.0;
    const double dsize = (double)window_size;

    enum { TRIM, COPY } mode = do_start ? TRIM : COPY;
    int64_t i = 0, m = 0;
    int32_t start_found = 0, stop_found = 0;
    int64_t hold_start = 0, hold_len = 0;    // start holdoff (contiguous run)
    int64_t shold_start = 0, shold_len = 0;  // stop holdoff (contiguous run)

    while (i < n) {
        if (mode == TRIM) {
            const double s = (double)x[i];
            const double r = std::sqrt((rms_sum - win[cur] + s * s) / dsize);
            const bool above = r >= (double)start_threshold;
            rms_sum -= win[cur];
            win[cur] = s * s;
            rms_sum += win[cur];
            if (++cur >= window_size) cur = 0;
            if (above) {
                if (hold_len == 0) hold_start = i;
                ++hold_len;
                ++i;
                if (hold_len >= start_duration) {
                    if (++start_found >= start_periods) {
                        // SILENCE_TRIM_FLUSH: emit the triggering run
                        std::memcpy(out + m, x + hold_start,
                                    (size_t)hold_len * sizeof(float));
                        m += hold_len;
                        hold_len = 0;
                        mode = COPY;
                    } else {
                        hold_len = 0;  // completed period trashed, keep looking
                    }
                }
            } else {
                hold_len = 0;  // run broken: discard holdoff
                ++i;
            }
        } else {  // COPY
            if (!do_stop) {  // blind copy of the remainder
                std::memcpy(out + m, x + i, (size_t)(n - i) * sizeof(float));
                m += n - i;
                i = n;
                break;
            }
            const double s = (double)x[i];
            const double r = std::sqrt((rms_sum - win[cur] + s * s) / dsize);
            const bool above = r >= (double)stop_threshold;
            if (above && shold_len > 0) {
                // SILENCE_COPY_FLUSH: short pause kept; the current
                // sample is re-processed (sox does not update the RMS
                // window before the goto)
                std::memcpy(out + m, x + shold_start,
                            (size_t)shold_len * sizeof(float));
                m += shold_len;
                shold_len = 0;
                continue;
            }
            rms_sum -= win[cur];
            win[cur] = s * s;
            rms_sum += win[cur];
            if (++cur >= window_size) cur = 0;
            if (above) {
                out[m++] = x[i++];
            } else {
                if (shold_len == 0) shold_start = i;
                ++shold_len;
                ++i;
                if (shold_len >= stop_duration) {
                    if (++stop_found >= stop_periods) {
                        shold_len = 0;  // the long silence is discarded
                        if (restart) {
                            stop_found = 0;
                            start_found = 0;
                            hold_len = 0;
                            std::memset(win.get(), 0,
                                        (size_t)window_size * sizeof(double));
                            rms_sum = 0.0;
                            cur = 0;
                            mode = TRIM;
                        } else {
                            return m;  // SILENCE_STOP: drop the rest
                        }
                    } else {
                        // flush full period and keep looking
                        std::memcpy(out + m, x + shold_start,
                                    (size_t)shold_len * sizeof(float));
                        m += shold_len;
                        shold_len = 0;
                    }
                }
            }
        }
    }
    // drain(): flush a partial trailing stop-holdoff; a partial
    // start-holdoff (mode TRIM at EOF) is discarded
    if (mode == COPY && shold_len > 0) {
        std::memcpy(out + m, x + shold_start, (size_t)shold_len * sizeof(float));
        m += shold_len;
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
