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

}  // extern "C"
