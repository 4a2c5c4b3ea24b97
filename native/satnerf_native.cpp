// Native acceleration library for satnerf_tpu host-side hot loops.
//
// The reference offloads these to external native code: LZW via GDAL's C++
// TIFF stack, DSM splatting via the C plyflatten library, and NCC DSM
// registration via numba-JIT (dsmr.py). Here they are plain-C-ABI functions
// loaded through ctypes (satnerf_tpu/native.py), with pure-numpy fallbacks.
//
// Build: make -C native   (produces libsatnerf_native.so next to this file)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

extern "C" {

// --------------------------------------------------------------------- LZW

// TIFF-variant LZW decode (MSB-first codes, EarlyChange=1).
// Returns bytes written, or -1 if dst_cap would overflow.
int64_t lzw_decode(const uint8_t* src, int64_t n, uint8_t* dst,
                   int64_t dst_cap) {
    constexpr int CLEAR = 256, EOI = 257;
    // dictionary as (prefix_code, suffix_byte); first 256 are singletons
    static thread_local std::vector<int32_t> prefix;
    static thread_local std::vector<uint8_t> suffix;
    static thread_local std::vector<uint8_t> stack;
    prefix.assign(4096, -1);
    suffix.assign(4096, 0);
    stack.clear();
    stack.reserve(4096);

    int next_code = 258;
    int width = 9;
    uint64_t bitbuf = 0;
    int bitcnt = 0;
    int64_t pos = 0, out = 0;
    int prev = -1;

    auto emit = [&](int code) -> int64_t {
        // walk the chain onto a stack, then reverse-copy
        stack.clear();
        int c = code;
        while (c >= 256) {
            stack.push_back(suffix[c]);
            c = prefix[c];
        }
        stack.push_back((uint8_t)c);
        int64_t len = (int64_t)stack.size();
        if (out + len > dst_cap) return -1;
        for (int64_t i = len - 1; i >= 0; --i) dst[out++] = stack[i];
        return (int64_t)(uint8_t)c;  // first byte of the emitted string
    };

    while (true) {
        while (bitcnt < width) {
            if (pos >= n) return out;
            bitbuf = (bitbuf << 8) | src[pos++];
            bitcnt += 8;
        }
        int code = (int)((bitbuf >> (bitcnt - width)) & ((1u << width) - 1));
        bitcnt -= width;

        if (code == CLEAR) {
            next_code = 258;
            width = 9;
            prev = -1;
            continue;
        }
        if (code == EOI) return out;

        int64_t first_byte;
        if (prev < 0) {
            first_byte = emit(code);
            if (first_byte < 0) return -1;
        } else if (code < next_code) {
            first_byte = emit(code);
            if (first_byte < 0) return -1;
            if (next_code < 4096) {
                prefix[next_code] = prev;
                suffix[next_code] = (uint8_t)first_byte;
                next_code++;
            }
        } else {
            // KwKwK case: string = prev + first_byte(prev)
            int c = prev;
            while (c >= 256) c = prefix[c];
            if (next_code < 4096) {
                prefix[next_code] = prev;
                suffix[next_code] = (uint8_t)c;
                next_code++;
            }
            first_byte = emit(next_code - 1);
            if (first_byte < 0) return -1;
        }
        prev = code;
        if (next_code + 1 >= (1 << width) && width < 12) width++;  // EarlyChange
    }
}

// ------------------------------------------------------------- DSM splatting

// plyflatten-equivalent scatter accumulation: each (x, y, z) point adds
// weight*z / weight into every cell within `radius` cells of its own.
// acc and wacc are (ysize*xsize) zero-initialized by the caller.
void splat_dsm(const double* xyz, int64_t n, double xoff, double yoff,
               double resolution, int64_t xsize, int64_t ysize,
               int32_t radius, double sigma, double* acc, double* wacc) {
    const bool gauss = std::isfinite(sigma);
    const double inv2s2 = gauss ? 1.0 / (2.0 * sigma * sigma) : 0.0;
    for (int64_t k = 0; k < n; ++k) {
        const double x = xyz[3 * k], y = xyz[3 * k + 1], z = xyz[3 * k + 2];
        if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z))
            continue;
        const int64_t ci = (int64_t)std::floor((x - xoff) / resolution);
        const int64_t cj = (int64_t)std::floor((yoff - y) / resolution);
        for (int32_t dj = -radius; dj <= radius; ++dj) {
            const int64_t jj = cj + dj;
            if (jj < 0 || jj >= ysize) continue;
            for (int32_t di = -radius; di <= radius; ++di) {
                const int64_t ii = ci + di;
                if (ii < 0 || ii >= xsize) continue;
                double w = 1.0;
                if (gauss) {
                    const double cxc = xoff + (ii + 0.5) * resolution;
                    const double cyc = yoff - (jj + 0.5) * resolution;
                    const double d2 =
                        (x - cxc) * (x - cxc) + (y - cyc) * (y - cyc);
                    w = std::exp(-d2 * inv2s2);
                }
                acc[jj * xsize + ii] += w * z;
                wacc[jj * xsize + ii] += w;
            }
        }
    }
}

// --------------------------------------------------------- NCC registration

// Normalized cross-correlation between u and v shifted by (dx, dy), ignoring
// non-finite pixels (dsmr.py:50-99 semantics). Returns NaN if degenerate.
double ncc_shift(const double* u, const double* v, int64_t h, int64_t w,
                 int32_t dx, int32_t dy) {
    const int64_t x0 = std::max<int64_t>(0, -dx), x1 = std::min<int64_t>(w, w - dx);
    const int64_t y0 = std::max<int64_t>(0, -dy), y1 = std::min<int64_t>(h, h - dy);
    if (x1 <= x0 || y1 <= y0) return NAN;
    double su = 0, sv = 0;
    int64_t count = 0;
    for (int64_t j = y0; j < y1; ++j) {
        const double* ur = u + j * w;
        const double* vr = v + (j + dy) * w + dx;
        for (int64_t i = x0; i < x1; ++i) {
            const double a = ur[i], b = vr[i];
            if (std::isfinite(a) && std::isfinite(b)) {
                su += a;
                sv += b;
                count++;
            }
        }
    }
    if (count == 0) return NAN;
    const double mu = su / count, mv = sv / count;
    double vu = 0, vv = 0, xc = 0;
    for (int64_t j = y0; j < y1; ++j) {
        const double* ur = u + j * w;
        const double* vr = v + (j + dy) * w + dx;
        for (int64_t i = x0; i < x1; ++i) {
            const double a = ur[i], b = vr[i];
            if (std::isfinite(a) && std::isfinite(b)) {
                const double da = a - mu, db = b - mv;
                vu += da * da;
                vv += db * db;
                xc += da * db;
            }
        }
    }
    const double denom = std::sqrt(vu) * std::sqrt(vv);
    if (denom == 0.0) return NAN;
    return xc / denom;
}

// Exhaustive +-irange search around (initdx, initdy); best shift written to
// out[0], out[1].
void ncc_search(const double* u, const double* v, int64_t h, int64_t w,
                int32_t irange, int32_t initdx, int32_t initdy, int32_t* out) {
    double best = -2.0;
    out[0] = initdx;
    out[1] = initdy;
    for (int32_t y = initdy - irange; y <= initdy + irange; ++y)
        for (int32_t x = initdx - irange; x <= initdx + irange; ++x) {
            const double c = ncc_shift(u, v, h, w, x, y);
            if (std::isfinite(c) && c > best) {
                best = c;
                out[0] = x;
                out[1] = y;
            }
        }
}

}  // extern "C"
