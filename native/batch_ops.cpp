// Native host-side data-pipeline kernels for joliGEN-TPU.
//
// TPU-native counterpart of the reference's C++/CUDA data-path ops
// (models/modules/op/*.cpp run on GPU; here the device is the TPU, so the
// native fast path lives on the HOST feeding it): batched uint8->float
// normalization, batch packing, masked-region randomization, and box mask
// rasterization — the per-sample inner loops of the input pipeline that
// otherwise run as per-image numpy ops under the GIL.
//
// Built with -O3 -march=native; loaded via ctypes (see
// joligen_tpu/data/native.py). Every entry point releases the GIL by
// construction (pure C, no Python API).

#include <cstdint>
#include <cstring>
#include <random>

extern "C" {

// dst[i] = src[i] / 127.5 - 1
void normalize_u8_to_f32(const uint8_t* src, float* dst, int64_t n) {
    const float scale = 1.0f / 127.5f;
    for (int64_t i = 0; i < n; ++i) {
        dst[i] = src[i] * scale - 1.0f;
    }
}

// Pack B decoded uint8 HWC images (given as a contiguous array of pointers)
// into one (B,H,W,C) float batch in [-1,1].
void pack_batch_u8(const uint8_t** srcs, float* dst, int64_t b,
                   int64_t hwc) {
    const float scale = 1.0f / 127.5f;
    for (int64_t s = 0; s < b; ++s) {
        const uint8_t* in = srcs[s];
        float* out = dst + s * hwc;
        for (int64_t i = 0; i < hwc; ++i) {
            out[i] = in[i] * scale - 1.0f;
        }
    }
}

// img (H,W,C) float in [-1,1]; mask (H,W) int32. Where mask>0, replace the
// pixel with uniform noise in [-1,1] (reference
// data/online_creation.py fill_mask_with_random).
void fill_mask_with_random_f32(float* img, const int32_t* mask, int64_t h,
                               int64_t w, int64_t c, uint64_t seed) {
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<float> uni(-1.0f, 1.0f);
    for (int64_t y = 0; y < h; ++y) {
        for (int64_t x = 0; x < w; ++x) {
            if (mask[y * w + x] > 0) {
                float* px = img + (y * w + x) * c;
                for (int64_t k = 0; k < c; ++k) px[k] = uni(rng);
            }
        }
    }
}

// Rasterize a box label into an int32 (H,W) mask.
void rasterize_box_mask(int32_t* mask, int64_t h, int64_t w, int64_t x1,
                        int64_t y1, int64_t x2, int64_t y2, int32_t label) {
    if (x1 < 0) x1 = 0;
    if (y1 < 0) y1 = 0;
    if (x2 > w) x2 = w;
    if (y2 > h) y2 = h;
    for (int64_t y = y1; y < y2; ++y) {
        for (int64_t x = x1; x < x2; ++x) mask[y * w + x] = label;
    }
}

// Stack B float HWC samples (pointer array) into a (B,...) batch (memcpy
// fanout — the numpy np.stack path makes an extra intermediate copy).
void stack_f32(const float** srcs, float* dst, int64_t b, int64_t numel) {
    for (int64_t s = 0; s < b; ++s) {
        std::memcpy(dst + s * numel, srcs[s], numel * sizeof(float));
    }
}

}  // extern "C"
