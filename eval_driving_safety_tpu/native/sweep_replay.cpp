// Fused sign-trajectory replay + quantization + stored-PNG encode for
// attack sweeps.
//
// The Python host pipeline (attack.pgd.replay_pgd_ints +
// dataset.quantize_v_rgb_u8 + kitti.write_png_store) makes many numpy /
// zlib passes per iteration per side; on the single-core hosts this
// framework targets, that host CPU time is serial with everything else.
// These kernels stream each frame a minimal number of times:
//   * replay_sweep_u8: unpack 2-bit signs -> doubled-int update (exact
//     half-integer grid, see attack/pgd.py) -> f32 quantize (one multiply,
//     IEEE single precision — bit-identical to the numpy/device formula)
//     -> optional BGR->RGB flip. The update/quantize loop is written
//     branch-free over an int8 sign plane so the compiler auto-vectorizes
//     it (AVX2/AVX-512 on the driver hosts; ~4x over the scalar form).
//   * png_store_write: one-pass stored-mode PNG encoder (zlib stored
//     blocks, adler32 fused into the copy, slice-by-8 crc32) — replaces
//     the ~5-pass Python zlib path on the sweep's dominant write cost.
//
// Capability parity context: the reference saves every PGD iteration as
// PNG (/root/reference/attack/DSGN/pgd_attack.py:357-374); this is the
// host half of that sweep for both detectors' attack spaces.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// 2-bit sign codes (s+1 in {0,1,2}) -> 4 int8 signs packed in a uint32,
// little-endian so a single 32-bit store unpacks 4 signs.
uint32_t make_sign_lut_entry(int byte) {
    uint32_t out = 0;
    for (int j = 0; j < 4; ++j) {
        int s = ((byte >> (2 * j)) & 3) - 1;
        out |= (uint32_t)(uint8_t)(int8_t)s << (8 * j);
    }
    return out;
}

struct SignLut {
    uint32_t t[256];
    SignLut() { for (int i = 0; i < 256; ++i) t[i] = make_sign_lut_entry(i); }
};
const SignLut kSignLut;

// 1-bit positive plane (LSB-first) -> 8 int8 signs (bit ? +1 : -1) packed
// in a uint64 so one 64-bit store unpacks 8 signs.
struct SignLut1 {
    uint64_t t[256];
    SignLut1() {
        for (int i = 0; i < 256; ++i) {
            uint64_t out = 0;
            for (int j = 0; j < 8; ++j) {
                int8_t s = ((i >> j) & 1) ? 1 : -1;
                out |= (uint64_t)(uint8_t)s << (8 * j);
            }
            t[i] = out;
        }
    }
};
const SignLut1 kSignLut1;

inline int32_t imin(int32_t a, int32_t b) { return a < b ? a : b; }
inline int32_t imax(int32_t a, int32_t b) { return a > b ? a : b; }

}  // namespace

extern "C" {

// v_clean:  (B, H, W, C) int32, UNDOUBLED clean v values (the kernel works
//           on the doubled grid internally; clean*2 is recomputed on the
//           fly, saving the caller a full doubling pass).
// packed:   (iters, B, H*W*C/4) uint8, 2-bit sign codes (s+1).
// alpha2/eps2/max2: per-sample (B,) int32, DOUBLED attack parameters.
// c255:     per-sample (B,) float: quantize scale (1/(den_h*den_w) for
//           the SRCNN v-space, 1.0 for the DSGN 255-space).
// out:      (iters, B, H, W, C) uint8 quantized frames (channel-flipped
//           when flip_channels, i.e. BGR state -> RGB pixels).
//
// Tiled over ITERATIONS: the evolving doubled state and the clean tile
// stay L2-resident across all iterations of a tile (tile outer, iteration
// inner), so DRAM sees each of v/clean roughly ONCE instead of once per
// iteration — on the single-core hosts the replay is memory-bound and
// this is ~2-3x. Tile size is a multiple of 12 so C==3 channel flips and
// 4-element sign bytes never straddle a boundary (plane is divisible by
// 12 when C==3: pack_signs enforces plane%4==0 and C divides plane).
void replay_sweep_u8(const int32_t* v_clean, const uint8_t* packed,
                     const int32_t* alpha2, const int32_t* eps2,
                     const int32_t* max2, const float* c255,
                     int iters, int b, int h, int w, int c,
                     int flip_channels, uint8_t* out) {
    const long plane = (long)h * w * c;          // per-sample elements
    const long pbytes = plane / 4;               // packed bytes per sample
    const long TILE = 49152;                     // 2^14*3: %12 == 0
    int32_t* vt = (int32_t*)std::malloc((size_t)TILE * sizeof(int32_t));
    int8_t* s8 = (int8_t*)std::malloc((size_t)TILE);
    if (!vt || !s8) {                            // caller OOM fallback
        std::free(vt);
        std::free(s8);
        return;
    }
    for (int bi = 0; bi < b; ++bi) {
        const int32_t a2 = alpha2[bi], e2 = eps2[bi], m2 = max2[bi];
        const float q = 0.5f * c255[bi];
        const int32_t* clean = v_clean + (long)bi * plane;
        for (long t0 = 0; t0 < plane; t0 += TILE) {
            const long tl = plane - t0 < TILE ? plane - t0 : TILE;
            const int32_t* cl = clean + t0;
            for (long i = 0; i < tl; ++i) vt[i] = cl[i] * 2;
            for (int k = 0; k < iters; ++k) {
                const uint8_t* p = packed + ((long)k * b + bi) * pbytes
                    + (t0 >> 2);
                uint8_t* o = out + ((long)k * b + bi) * plane + t0;
                // unpack: one 32-bit LUT store per packed byte
                uint32_t* s32 = (uint32_t*)s8;
                for (long i = 0; i < (tl >> 2); ++i)
                    s32[i] = kSignLut.t[p[i]];
                // update + quantize: branch-free, auto-vectorizable
                for (long i = 0; i < tl; ++i) {
                    const int32_t c2 = cl[i] * 2;
                    int32_t d = vt[i] + (int32_t)s8[i] * a2 - c2;
                    d = imin(imax(d, -e2), e2);
                    const int32_t nv = imin(imax(d + c2, 0), m2);
                    vt[i] = nv;
                    // quantize: trunc(f32(v) * 0.5 * c255), IEEE single
                    float x = (float)nv * q;
                    x = x < 0.f ? 0.f : (x > 255.f ? 255.f : x);
                    o[i] = (uint8_t)(int32_t)x;
                }
                if (flip_channels && c == 3) {   // BGR state -> RGB out
                    for (long i = 0; i < tl; i += 3) {
                        const uint8_t t = o[i];
                        o[i] = o[i + 2];
                        o[i + 2] = t;
                    }
                }
            }
        }
    }
    std::free(vt);
    std::free(s8);
}

// 1-bit variant of replay_sweep_u8: `packed` is the POSITIVE 1-bit plane
// ((iters, B, H*W*C/8) uint8, bit set -> sign +1, clear -> -1; the
// "signs1" transfer format, valid only when no gradient was exactly zero
// — the caller checks the fetched per-iteration zero counts and falls
// back to the 2-bit path otherwise). Halves the device->host sign
// traffic, which on thin-pipe hosts is the sweep's dominant transfer.
void replay_sweep_u8_b1(const int32_t* v_clean, const uint8_t* packed,
                        const int32_t* alpha2, const int32_t* eps2,
                        const int32_t* max2, const float* c255,
                        int iters, int b, int h, int w, int c,
                        int flip_channels, uint8_t* out) {
    const long plane = (long)h * w * c;          // per-sample elements
    const long pbytes = plane / 8;               // packed bytes per sample
    const long TILE = 49152;                     // %24 == 0: 8-sign bytes
    int32_t* vt = (int32_t*)std::malloc((size_t)TILE * sizeof(int32_t));
    int8_t* s8 = (int8_t*)std::malloc((size_t)TILE);
    if (!vt || !s8) {
        std::free(vt);
        std::free(s8);
        return;
    }
    for (int bi = 0; bi < b; ++bi) {
        const int32_t a2 = alpha2[bi], e2 = eps2[bi], m2 = max2[bi];
        const float q = 0.5f * c255[bi];
        const int32_t* clean = v_clean + (long)bi * plane;
        for (long t0 = 0; t0 < plane; t0 += TILE) {
            const long tl = plane - t0 < TILE ? plane - t0 : TILE;
            const int32_t* cl = clean + t0;
            for (long i = 0; i < tl; ++i) vt[i] = cl[i] * 2;
            for (int k = 0; k < iters; ++k) {
                const uint8_t* p = packed + ((long)k * b + bi) * pbytes
                    + (t0 >> 3);
                uint8_t* o = out + ((long)k * b + bi) * plane + t0;
                uint64_t* s64 = (uint64_t*)s8;
                for (long i = 0; i < (tl >> 3); ++i)
                    s64[i] = kSignLut1.t[p[i]];
                for (long i = 0; i < tl; ++i) {
                    const int32_t c2 = cl[i] * 2;
                    int32_t d = vt[i] + (int32_t)s8[i] * a2 - c2;
                    d = imin(imax(d, -e2), e2);
                    const int32_t nv = imin(imax(d + c2, 0), m2);
                    vt[i] = nv;
                    float x = (float)nv * q;
                    x = x < 0.f ? 0.f : (x > 255.f ? 255.f : x);
                    o[i] = (uint8_t)(int32_t)x;
                }
                if (flip_channels && c == 3) {
                    for (long i = 0; i < tl; i += 3) {
                        const uint8_t t = o[i];
                        o[i] = o[i + 2];
                        o[i + 2] = t;
                    }
                }
            }
        }
    }
    std::free(vt);
    std::free(s8);
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

// Fused integer resize + clean-frame quantize: one horizontal pass emits
// BOTH the int32 v-plane (den_h*den_w-scaled, the replay seed) and its
// quantized u8 RGB frame q0 = trunc(f32(v) * c255) with optional BGR->RGB
// flip — the iteration-0 save, without a second 14 MB read+write pass.
// Same exact integer math as resize_v2_i32; same IEEE quantize formula
// as quantize_v_u8. Out columns [nw, out_w) must be pre-zeroed by the
// caller (or nw == out_w).
void resize_v2_q0(const uint8_t* img, int h0, int w0, int c,
                  const int32_t* i0h, const int32_t* i1h,
                  const int32_t* rh, int den_h,
                  const int32_t* i0w, const int32_t* i1w,
                  const int32_t* rw, int den_w,
                  int out_h, int nw, int out_w, float c255,
                  int flip_channels, int32_t* v_out, uint8_t* q0_out,
                  int32_t* scratch) {
    const long row = (long)w0 * c;
    for (int y = 0; y < out_h; ++y) {
        const uint8_t* a = img + (long)i0h[y] * row;
        const uint8_t* b = img + (long)i1h[y] * row;
        const int32_t r = rh[y], s = den_h - rh[y];
        int32_t* v1 = scratch + (long)y * row;
        for (long i = 0; i < row; ++i)
            v1[i] = s * (int32_t)a[i] + r * (int32_t)b[i];
    }
    const int flip = flip_channels && c == 3;
    for (int y = 0; y < out_h; ++y) {
        const int32_t* v1 = scratch + (long)y * row;
        int32_t* o = v_out + (long)y * out_w * c;
        uint8_t* q = q0_out + (long)y * out_w * c;
        for (int x = 0; x < nw; ++x) {
            const int32_t r = rw[x], s = den_w - rw[x];
            const int32_t* a = v1 + (long)i0w[x] * c;
            const int32_t* b = v1 + (long)i1w[x] * c;
            for (int k = 0; k < c; ++k) {
                const int32_t v = s * a[k] + r * b[k];
                o[(long)x * c + k] = v;
                float f = (float)v * c255;
                f = f < 0.f ? 0.f : (f > 255.f ? 255.f : f);
                q[(long)x * c + (flip ? 2 - k : k)] = (uint8_t)(int32_t)f;
            }
        }
    }
}

// Quantize a v-space frame to u8 pixels: trunc(f32(v) * q), optional
// BGR->RGB flip — the iteration-0 (clean) save of the sweep.
void quantize_v_u8(const int32_t* v, long n, float q, int c,
                   int flip_channels, uint8_t* out) {
    for (long i = 0; i < n; ++i) {
        float x = (float)v[i] * q;
        x = x < 0.f ? 0.f : (x > 255.f ? 255.f : x);
        out[i] = (uint8_t)(int32_t)x;
    }
    if (flip_channels && c == 3) {
        for (long i = 0; i < n; i += 3) {
            const uint8_t t = out[i];
            out[i] = out[i + 2];
            out[i + 2] = t;
        }
    }
}

// ---------------------------------------------------------------------------
// Stored-mode PNG writer
// ---------------------------------------------------------------------------

namespace {

// CRC-32 (zlib polynomial, reflected), slice-by-8.
struct CrcTables {
    uint32_t t[8][256];
    CrcTables() {
        for (uint32_t i = 0; i < 256; ++i) {
            uint32_t crc = i;
            for (int j = 0; j < 8; ++j)
                crc = (crc >> 1) ^ (0xEDB88320u & (~(crc & 1) + 1));
            t[0][i] = crc;
        }
        for (int k = 1; k < 8; ++k)
            for (uint32_t i = 0; i < 256; ++i)
                t[k][i] = (t[k - 1][i] >> 8) ^ t[0][t[k - 1][i] & 0xFF];
    }
};
const CrcTables kCrc;

uint32_t crc32_update(uint32_t crc, const uint8_t* p, size_t len) {
    crc = ~crc;
    while (len >= 8) {
        uint32_t lo;
        std::memcpy(&lo, p, 4);
        lo ^= crc;
        uint32_t hi;
        std::memcpy(&hi, p + 4, 4);
        crc = kCrc.t[7][lo & 0xFF] ^ kCrc.t[6][(lo >> 8) & 0xFF]
            ^ kCrc.t[5][(lo >> 16) & 0xFF] ^ kCrc.t[4][lo >> 24]
            ^ kCrc.t[3][hi & 0xFF] ^ kCrc.t[2][(hi >> 8) & 0xFF]
            ^ kCrc.t[1][(hi >> 16) & 0xFF] ^ kCrc.t[0][hi >> 24];
        p += 8;
        len -= 8;
    }
    while (len--) crc = (crc >> 8) ^ kCrc.t[0][(crc ^ *p++) & 0xFF];
    return ~crc;
}

// adler32, block-vectorized: over a block of B bytes the running sums
// advance by a += S1 and b += B*a + S2 with S1 = sum(p[i]) and
// S2 = sum((B-i)*p[i]) — two independent reductions the compiler
// auto-vectorizes, replacing the loop-carried scalar dependence.
// Overflow: per 64-byte block b grows by < 64*65520 + 64*64*255 ~ 2^22,
// so ~512 blocks (32 KB) fit uint32 before the deferred modulo.
uint32_t adler32_update(uint32_t adler, const uint8_t* p, size_t len) {
    const uint32_t MOD = 65521;
    const size_t B = 64, CHUNK = 512 * B;          // mod every 32 KB
    uint32_t a = adler & 0xFFFF, bsum = adler >> 16;
    while (len >= B) {
        size_t n = len < CHUNK ? (len / B) * B : CHUNK;
        len -= n;
        for (size_t blk = 0; blk < n; blk += B) {
            uint32_t s1 = 0, s2 = 0;
            for (size_t i = 0; i < B; ++i) {
                s1 += p[blk + i];
                s2 += (uint32_t)(B - i) * p[blk + i];
            }
            bsum += (uint32_t)B * a + s2;
            a += s1;
        }
        p += n;
        a %= MOD;
        bsum %= MOD;
    }
    for (size_t i = 0; i < len; ++i) {
        a += p[i];
        bsum += a;
        if (a >= MOD) a -= MOD;
    }
    a %= MOD;
    bsum %= MOD;
    return (bsum << 16) | a;
}

void put_be32(uint8_t* p, uint32_t v) {
    p[0] = (uint8_t)(v >> 24);
    p[1] = (uint8_t)(v >> 16);
    p[2] = (uint8_t)(v >> 8);
    p[3] = (uint8_t)v;
}

}  // namespace

// Upper bound for the in-memory PNG (sig + IHDR + one IDAT + IEND) of an
// (h, w, c) 8-bit image in stored-mode zlib blocks — the buffer size
// png_store_encode needs.
long png_store_bound(int h, int w, int c) {
    long raw = (long)h * (1 + (long)w * c);       // filter byte + scanline
    long nblocks = (raw + 65534) / 65535;
    return 8 + 25 + (12 + 2 + raw + 5 * nblocks + 4) + 12 + 64;
}

// Encode (h, w, c) u8 pixels (row stride `stride` bytes; c = 3 RGB or
// 1 gray) as a complete stored-mode PNG into `out`. Returns the byte
// length, or -1 on unsupported c.
long png_store_encode(const uint8_t* img, long stride, int h, int w, int c,
                      uint8_t* out) {
    if (c != 3 && c != 1) return -1;
    uint8_t* o = out;
    // signature
    static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A,
                                   '\n'};
    std::memcpy(o, sig, 8);
    o += 8;
    // IHDR
    put_be32(o, 13);
    std::memcpy(o + 4, "IHDR", 4);
    put_be32(o + 8, (uint32_t)w);
    put_be32(o + 12, (uint32_t)h);
    o[16] = 8;                      // bit depth
    o[17] = (c == 3) ? 2 : 0;       // color type: truecolor / grayscale
    o[18] = o[19] = o[20] = 0;      // deflate / filter 0 / no interlace
    put_be32(o + 21, crc32_update(0, o + 4, 17));
    o += 25;
    // IDAT: zlib header + stored blocks + adler32
    uint8_t* idat = o;              // length+tag written after encoding
    uint8_t* z = idat + 8;
    uint8_t* zp = z;
    *zp++ = 0x78;                   // zlib CMF: deflate, 32K window
    *zp++ = 0x01;                   // FLG: fastest, check bits valid
    const long rowbytes = (long)w * c;
    const long raw = (long)h * (1 + rowbytes);
    uint32_t adler = 1;
    long block_left = 0;
    long remaining = raw;
    int y = 0;
    long row_off = -1;              // -1 = at the filter byte of row y
    while (remaining > 0) {
        if (block_left == 0) {
            block_left = remaining < 65535 ? remaining : 65535;
            *zp++ = (remaining == block_left) ? 1 : 0;     // BFINAL
            zp[0] = (uint8_t)(block_left & 0xFF);          // LEN
            zp[1] = (uint8_t)(block_left >> 8);
            zp[2] = (uint8_t)~zp[0];                       // NLEN
            zp[3] = (uint8_t)~zp[1];
            zp += 4;
        }
        long take;
        if (row_off < 0) {                                 // filter byte
            *zp = 0;
            take = 1;
            row_off = 0;
        } else {
            take = rowbytes - row_off;
            if (take > block_left) take = block_left;
            std::memcpy(zp, img + (long)y * stride + row_off, (size_t)take);
            row_off += take;
            if (row_off == rowbytes) {
                row_off = -1;
                ++y;
            }
        }
        adler = adler32_update(adler, zp, (size_t)take);
        zp += take;
        block_left -= take;
        remaining -= take;
    }
    put_be32(zp, adler);
    zp += 4;
    const long zlen = zp - z;
    put_be32(idat, (uint32_t)zlen);
    std::memcpy(idat + 4, "IDAT", 4);
    put_be32(zp, crc32_update(0, idat + 4, (size_t)(4 + zlen)));
    o = zp + 4;
    // IEND
    put_be32(o, 0);
    std::memcpy(o + 4, "IEND", 4);
    put_be32(o + 8, crc32_update(0, o + 4, 4));
    o += 12;
    return o - out;
}

// Encode + write to `path` in one call (thread-local reusable buffer —
// a fresh malloc per frame costs ~as much in page faults as the whole
// encode — and one fwrite). Returns 0 on success, nonzero on failure.
int png_store_write(const char* path, const uint8_t* img, long stride,
                    int h, int w, int c) {
    static thread_local uint8_t* buf = nullptr;
    static thread_local long cap = 0;
    const long need = png_store_bound(h, w, c);
    if (need > cap) {
        std::free(buf);
        buf = (uint8_t*)std::malloc((size_t)need);
        cap = buf ? need : 0;
        if (!buf) return 1;
    }
    const long n = png_store_encode(img, stride, h, w, c, buf);
    if (n < 0) return 2;
    FILE* f = std::fopen(path, "wb");
    if (!f) return 3;
    const int ok = std::fwrite(buf, 1, (size_t)n, f) == (size_t)n;
    return std::fclose(f) == 0 && ok ? 0 : 4;
}

}  // extern "C"
