// Fused sign-trajectory replay + quantization for attack sweeps.
//
// The Python host pipeline (attack.pgd.replay_pgd_ints +
// dataset.quantize_v_rgb_u8) makes ~6 numpy passes per iteration per
// side; on the single-core hosts this framework targets, that host CPU
// time is serial with everything else. This kernel streams each frame
// once per iteration: unpack 2-bit sign -> doubled-int update (exact
// half-integer grid, see attack/pgd.py) -> f32 quantize (one multiply,
// IEEE single precision — bit-identical to the numpy/device formula) ->
// optional BGR->RGB flip, writing the final u8 pixels directly.
//
// Capability parity context: the reference saves every PGD iteration as
// PNG (/root/reference/attack/DSGN/pgd_attack.py:357-374); this is the
// host half of that sweep for both detectors' attack spaces.
#include <cstdint>
#include <cstring>

extern "C" {

// v2_clean: (B, H, W, C) int32, DOUBLED clean values.
// packed:   (iters, B, H*W*C/4) uint8, 2-bit sign codes (s+1).
// alpha2/eps2/max2: per-sample (B,) int32, DOUBLED attack parameters.
// c255:     per-sample (B,) float: quantize scale (1/(den_h*den_w) for
//           the SRCNN v-space, 1.0 for the DSGN 255-space).
// out:      (iters, B, H, W, C) uint8 quantized frames (channel-flipped
//           when flip_channels, i.e. BGR state -> RGB pixels).
// scratch:  (B, H, W, C) int32 workspace (the evolving doubled state).
void replay_sweep_u8(const int32_t* v2_clean, const uint8_t* packed,
                     const int32_t* alpha2, const int32_t* eps2,
                     const int32_t* max2, const float* c255,
                     int iters, int b, int h, int w, int c,
                     int flip_channels, uint8_t* out, int32_t* scratch) {
    const long plane = (long)h * w * c;          // per-sample elements
    const long pbytes = plane / 4;               // packed bytes per sample
    std::memcpy(scratch, v2_clean, (size_t)b * plane * sizeof(int32_t));
    for (int k = 0; k < iters; ++k) {
        for (int bi = 0; bi < b; ++bi) {
            const int32_t a2 = alpha2[bi], e2 = eps2[bi], m2 = max2[bi];
            const float q = 0.5f * c255[bi];
            const int32_t* clean = v2_clean + (long)bi * plane;
            int32_t* v = scratch + (long)bi * plane;
            const uint8_t* p = packed + ((long)k * b + bi) * pbytes;
            uint8_t* o = out + ((long)k * b + bi) * plane;
            for (long i = 0; i < plane; i += 4) {
                const uint8_t byte = p[i >> 2];
                for (int j = 0; j < 4; ++j) {
                    const int s = ((byte >> (2 * j)) & 3) - 1;
                    int32_t d = v[i + j] + s * a2 - clean[i + j];
                    if (d > e2) d = e2;
                    if (d < -e2) d = -e2;
                    int32_t nv = d + clean[i + j];
                    if (nv < 0) nv = 0;
                    if (nv > m2) nv = m2;
                    v[i + j] = nv;
                    // quantize: trunc(f32(v) * 0.5 * c255), IEEE single
                    float x = (float)nv * q;
                    if (x < 0.f) x = 0.f;
                    if (x > 255.f) x = 255.f;
                    o[i + j] = (uint8_t)x;
                }
            }
            if (flip_channels && c == 3) {       // BGR state -> RGB out
                for (long i = 0; i < plane; i += 3) {
                    const uint8_t t = o[i];
                    o[i] = o[i + 2];
                    o[i + 2] = t;
                }
            }
        }
    }
}

// Integer bilinear resize (the host twin of data/exact_resize.py's
// resize_v2_host, same exact integer math): (h0,w0,c) u8 ->
// (out_h,out_w,c) int32 scaled by den_h*den_w. scratch: out_h*w0*c i32.
void resize_v2_i32(const uint8_t* img, int h0, int w0, int c,
                   const int32_t* i0h, const int32_t* i1h,
                   const int32_t* rh, int den_h,
                   const int32_t* i0w, const int32_t* i1w,
                   const int32_t* rw, int den_w,
                   int out_h, int out_w, int32_t* out, int32_t* scratch) {
    const long row = (long)w0 * c;
    for (int y = 0; y < out_h; ++y) {
        const uint8_t* a = img + (long)i0h[y] * row;
        const uint8_t* b = img + (long)i1h[y] * row;
        const int32_t r = rh[y], s = den_h - rh[y];
        int32_t* v1 = scratch + (long)y * row;
        for (long i = 0; i < row; ++i)
            v1[i] = s * (int32_t)a[i] + r * (int32_t)b[i];
    }
    for (int y = 0; y < out_h; ++y) {
        const int32_t* v1 = scratch + (long)y * row;
        int32_t* o = out + (long)y * out_w * c;
        for (int x = 0; x < out_w; ++x) {
            const int32_t r = rw[x], s = den_w - rw[x];
            const int32_t* a = v1 + (long)i0w[x] * c;
            const int32_t* b = v1 + (long)i1w[x] * c;
            for (int k = 0; k < c; ++k)
                o[(long)x * c + k] = s * a[k] + r * b[k];
        }
    }
}

// Quantize a v-space frame to u8 pixels: trunc(f32(v) * q), optional
// BGR->RGB flip — the iteration-0 (clean) save of the sweep.
void quantize_v_u8(const int32_t* v, long n, float q, int c,
                   int flip_channels, uint8_t* out) {
    for (long i = 0; i < n; ++i) {
        float x = (float)v[i] * q;
        if (x < 0.f) x = 0.f;
        if (x > 255.f) x = 255.f;
        out[i] = (uint8_t)x;
    }
    if (flip_channels && c == 3) {
        for (long i = 0; i < n; i += 3) {
            const uint8_t t = out[i];
            out[i] = out[i + 2];
            out[i + 2] = t;
        }
    }
}

}  // extern "C"
