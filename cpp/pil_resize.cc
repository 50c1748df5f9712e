// PIL-exact bicubic resize for 8-bit RGB frames — the hot-path twin of
// grounded_video_llm_tpu/ops/pil_resize.py (see its docstring for the
// algorithm provenance: Pillow src/libImaging/Resample.c, reproduced
// bit-for-bit: scaled-support coefficients, PRECISION_BITS=22 fixed point,
// uint8-quantized intermediate between the horizontal and vertical passes).
//
// Exposed as gvd_pil_resize_batch_u8 in libgvd_decoder.so; ctypes releases
// the GIL during the call so a whole 96-frame batch resizes while the TPU
// computes (single-core host, CLAUDE.md).
//
// Speed notes (single core): accumulators are int32 exactly like Pillow —
// normalized coefficients sum to 2^22 and pixels are <=255, so the dot
// product stays inside int32 (Pillow has shipped this invariant for a
// decade). The vertical pass runs tap-outer over whole rows
// (dst[x] += k*src[x]), which gcc auto-vectorizes; the horizontal pass
// keeps Pillow's pixel-gather shape but fuses the 3 channels.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;
constexpr double kSupport = 2.0;  // bicubic

double bicubic_filter(double x) {
    constexpr double a = -0.5;
    if (x < 0.0) x = -x;
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

inline uint8_t clip8(int32_t in) {
    if (in >= (1 << kPrecisionBits << 8)) return 255;
    if (in <= 0) return 0;
    return static_cast<uint8_t>(in >> kPrecisionBits);
}

// Pillow precompute_coeffs + normalize_coeffs_8bpc for one axis.
struct AxisCoeffs {
    int ksize;
    std::vector<int> bounds;  // [out, 2] = (xmin, count)
    std::vector<int32_t> kk;  // [out, ksize]
};

AxisCoeffs precompute(int in_size, int out_size) {
    AxisCoeffs c;
    double scale = static_cast<double>(in_size) / out_size;
    double filterscale = scale < 1.0 ? 1.0 : scale;
    double support = kSupport * filterscale;
    c.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
    c.bounds.assign(static_cast<size_t>(out_size) * 2, 0);
    c.kk.assign(static_cast<size_t>(out_size) * c.ksize, 0);
    std::vector<double> w(c.ksize);
    double ss = 1.0 / filterscale;
    for (int xx = 0; xx < out_size; ++xx) {
        double center = (xx + 0.5) * scale;
        int xmin = static_cast<int>(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = static_cast<int>(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        double ww = 0.0;
        for (int x = 0; x < xmax; ++x) {
            w[x] = bicubic_filter((x + xmin - center + 0.5) * ss);
            ww += w[x];
        }
        int32_t* k = &c.kk[static_cast<size_t>(xx) * c.ksize];
        for (int x = 0; x < xmax; ++x) {
            double v = ww != 0.0 ? w[x] / ww : w[x];
            v *= static_cast<double>(1 << kPrecisionBits);
            k[x] = static_cast<int32_t>(v < 0 ? v - 0.5 : v + 0.5);
        }
        c.bounds[xx * 2] = xmin;
        c.bounds[xx * 2 + 1] = xmax;
    }
    return c;
}

// Horizontal pass: [h, w, 3] -> [h, ow, 3]
void resample_h(const uint8_t* src, int h, int w, uint8_t* dst, int ow,
                const AxisCoeffs& c) {
    constexpr int32_t half = 1 << (kPrecisionBits - 1);
    for (int y = 0; y < h; ++y) {
        const uint8_t* row = src + static_cast<size_t>(y) * w * 3;
        uint8_t* orow = dst + static_cast<size_t>(y) * ow * 3;
        for (int xx = 0; xx < ow; ++xx) {
            int xmin = c.bounds[xx * 2], n = c.bounds[xx * 2 + 1];
            const int32_t* k = &c.kk[static_cast<size_t>(xx) * c.ksize];
            int32_t s0 = half, s1 = half, s2 = half;
            const uint8_t* p = row + static_cast<size_t>(xmin) * 3;
            for (int x = 0; x < n; ++x, p += 3) {
                s0 += static_cast<int32_t>(p[0]) * k[x];
                s1 += static_cast<int32_t>(p[1]) * k[x];
                s2 += static_cast<int32_t>(p[2]) * k[x];
            }
            orow[xx * 3 + 0] = clip8(s0);
            orow[xx * 3 + 1] = clip8(s1);
            orow[xx * 3 + 2] = clip8(s2);
        }
    }
}

// Vertical pass: [h, w, 3] -> [oh, w, 3]. Tap-outer over whole rows: the
// inner loops are dense (acc[x] += k*row[x]), which the compiler vectorizes.
void resample_v(const uint8_t* src, int h, int w, uint8_t* dst, int oh,
                const AxisCoeffs& c, std::vector<int32_t>& acc) {
    constexpr int32_t half = 1 << (kPrecisionBits - 1);
    const size_t rowlen = static_cast<size_t>(w) * 3;
    acc.assign(rowlen, 0);
    for (int yy = 0; yy < oh; ++yy) {
        int ymin = c.bounds[yy * 2], n = c.bounds[yy * 2 + 1];
        const int32_t* k = &c.kk[static_cast<size_t>(yy) * c.ksize];
        int32_t* a = acc.data();
        for (size_t x = 0; x < rowlen; ++x) a[x] = half;
        for (int y = 0; y < n; ++y) {
            const uint8_t* row = src + static_cast<size_t>(ymin + y) * rowlen;
            const int32_t kv = k[y];
            for (size_t x = 0; x < rowlen; ++x)
                a[x] += static_cast<int32_t>(row[x]) * kv;
        }
        uint8_t* orow = dst + static_cast<size_t>(yy) * rowlen;
        for (size_t x = 0; x < rowlen; ++x) orow[x] = clip8(a[x]);
    }
}

}  // namespace

extern "C" int gvd_pil_resize_batch_u8(const uint8_t* src, int t, int h,
                                       int w, uint8_t* dst, int oh, int ow) {
    if (t <= 0 || h <= 0 || w <= 0 || oh <= 0 || ow <= 0) return 1;
    const bool do_h = ow != w, do_v = oh != h;
    AxisCoeffs ch, cv;
    if (do_h) ch = precompute(w, ow);
    if (do_v) cv = precompute(h, oh);
    std::vector<uint8_t> tmp;
    std::vector<int32_t> acc;
    if (do_h && do_v) tmp.resize(static_cast<size_t>(h) * ow * 3);
    const size_t in_stride = static_cast<size_t>(h) * w * 3;
    const size_t out_stride = static_cast<size_t>(oh) * ow * 3;
    for (int i = 0; i < t; ++i) {
        const uint8_t* s = src + i * in_stride;
        uint8_t* d = dst + i * out_stride;
        if (do_h && do_v) {
            resample_h(s, h, w, tmp.data(), ow, ch);
            resample_v(tmp.data(), h, ow, d, oh, cv, acc);
        } else if (do_h) {
            resample_h(s, h, w, d, ow, ch);
        } else if (do_v) {
            resample_v(s, h, w, d, oh, cv, acc);
        } else {
            std::memcpy(d, s, in_stride);
        }
    }
    return 0;
}
