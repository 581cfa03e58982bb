// Compiled CPU baselines for bench.py (VERDICT r4 Next #2).
//
// OpenMP/-O3 C++ transliterations of the reference's serial hot loops so
// the "vs compiled C++" margins in BENCH are MEASURED, not estimated:
//
//  - cpu_align64_per_image: the 2-D alignment inner loop — FFT cross-power
//    bestShift + polar ring-FFT rotational correlation per image
//    (structure of data/filters.h:432-472 bestShift and data/polar.cpp
//    rotationalCorrelation; bench config 1).
//  - cpu_gridding_per_image: the Fourier gridding insertion loop — rfft2
//    per image + per-sample trilinear scatter into the padded 256^3 cube,
//    3 channels (structure of reconstruct_fourier.cpp:474-531; config 3).
//  - cpu_match_per_particle: projection matching — translational FFT
//    cross-correlation against EVERY gallery reference + ring-FFT
//    rotational correlation (angular_projection_matching.cpp:530-770;
//    config 4).
//
// The FFT is an iterative radix-2 with precomputed twiddles plus the
// standard real-input fold (r2c via an n/2 complex transform), i.e. the
// same algorithmic class FFTW uses at these power-of-two sizes; -O3
// -march=native auto-vectorizes the butterflies. Outer image loops are
// `omp parallel for`, so on multi-core hosts the baseline is the threaded
// reference bar; cpu_baseline_threads() reports the thread count used.
//
// Build: make -C xmipp3_tpu/native libxmipp3_cpubase.so
// Driven by bench.py over ctypes; results cached in bench_baseline.json.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <map>
#include <random>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

using cfloat = std::complex<float>;

// ---------------------------------------------------------------- FFT core
struct Plan {
    int n;
    std::vector<int> rev;
    std::vector<cfloat> w;       // w[k] = exp(-2*pi*i*k/n), k < n/2
    std::vector<cfloat> wconj;
};

const Plan &plan_for(int n) {
    static std::map<int, Plan> cache;
    auto it = cache.find(n);
    if (it != cache.end()) return it->second;
    Plan p;
    p.n = n;
    p.rev.resize(n);
    int lg = 0;
    while ((1 << lg) < n) ++lg;
    for (int i = 0; i < n; ++i) {
        int r = 0;
        for (int b = 0; b < lg; ++b) if (i & (1 << b)) r |= 1 << (lg - 1 - b);
        p.rev[i] = r;
    }
    p.w.resize(n / 2);
    p.wconj.resize(n / 2);
    for (int k = 0; k < n / 2; ++k) {
        double a = -2.0 * M_PI * k / n;
        p.w[k] = cfloat((float)std::cos(a), (float)std::sin(a));
        p.wconj[k] = std::conj(p.w[k]);
    }
    return cache.emplace(n, std::move(p)).first->second;
}

// in-place complex FFT, n a power of two
void fft(cfloat *x, int n, bool inverse) {
    const Plan &p = plan_for(n);
    for (int i = 0; i < n; ++i) {
        int r = p.rev[i];
        if (i < r) std::swap(x[i], x[r]);
    }
    const cfloat *tw = inverse ? p.wconj.data() : p.w.data();
    for (int len = 2; len <= n; len <<= 1) {
        int half = len >> 1, step = n / len;
        for (int i = 0; i < n; i += len)
            for (int j = 0; j < half; ++j) {
                cfloat u = x[i + j];
                cfloat v = x[i + j + half] * tw[j * step];
                x[i + j] = u + v;
                x[i + j + half] = u - v;
            }
    }
    if (inverse) {
        float s = 1.0f / n;
        for (int i = 0; i < n; ++i) x[i] *= s;
    }
}

// real 1-D forward: n reals -> n/2+1 bins via one n/2 complex FFT + fold
void rfft(const float *in, cfloat *out, int n) {
    int h = n / 2;
    std::vector<cfloat> z(h);
    for (int i = 0; i < h; ++i) z[i] = cfloat(in[2 * i], in[2 * i + 1]);
    fft(z.data(), h, false);
    const Plan &p = plan_for(n);
    out[0] = cfloat(z[0].real() + z[0].imag(), 0.0f);
    out[h] = cfloat(z[0].real() - z[0].imag(), 0.0f);
    for (int k = 1; k < h; ++k) {
        cfloat a = z[k], b = std::conj(z[h - k]);
        cfloat even = 0.5f * (a + b);
        cfloat odd = cfloat(0.0f, -0.5f) * (a - b);
        out[k] = even + p.w[k] * odd;   // w = exp(-2pi i k / n)
    }
}

// real 1-D inverse: n/2+1 bins -> n reals (inverse of rfft, 1/n folded)
void irfft(const cfloat *in, float *out, int n) {
    int h = n / 2;
    const Plan &p = plan_for(n);
    std::vector<cfloat> z(h);
    for (int k = 0; k < h; ++k) {
        cfloat a = in[k], b = std::conj(in[k == 0 ? h : h - k]);
        cfloat even = a + b;
        cfloat odd = (a - b) * p.wconj[k];
        z[k] = even + cfloat(0.0f, 1.0f) * odd;
    }
    fft(z.data(), h, true);
    for (int i = 0; i < h; ++i) {
        out[2 * i] = 0.5f * z[i].real();
        out[2 * i + 1] = 0.5f * z[i].imag();
    }
}

// column-axis complex FFT over an (H, K) row-major array, butterflies
// vectorized across the contiguous K axis (SIMD-friendly, no transpose)
void fft_cols(cfloat *a, int H, int K, bool inverse) {
    const Plan &p = plan_for(H);
    for (int i = 0; i < H; ++i) {
        int r = p.rev[i];
        if (i < r)
            for (int k = 0; k < K; ++k)
                std::swap(a[(size_t)i * K + k], a[(size_t)r * K + k]);
    }
    const cfloat *tw = inverse ? p.wconj.data() : p.w.data();
    for (int len = 2; len <= H; len <<= 1) {
        int half = len >> 1, step = H / len;
        for (int i = 0; i < H; i += len)
            for (int j = 0; j < half; ++j) {
                cfloat w = tw[j * step];
                float wr = w.real(), wi = w.imag();
                float *u = reinterpret_cast<float *>(a + (size_t)(i + j) * K);
                float *v = reinterpret_cast<float *>(
                    a + (size_t)(i + j + half) * K);
                for (int k = 0; k < K; ++k) {          // vectorizes
                    float vr = v[2 * k] * wr - v[2 * k + 1] * wi;
                    float vi = v[2 * k] * wi + v[2 * k + 1] * wr;
                    float ur = u[2 * k], ui = u[2 * k + 1];
                    u[2 * k] = ur + vr;
                    u[2 * k + 1] = ui + vi;
                    v[2 * k] = ur - vr;
                    v[2 * k + 1] = ui - vi;
                }
            }
    }
    if (inverse) {
        float s = 1.0f / H;
        for (size_t i = 0; i < (size_t)H * K; ++i) a[i] *= s;
    }
}

void transpose_c(const cfloat *src, cfloat *dst, int R, int C) {
    constexpr int B = 16;
    for (int r0 = 0; r0 < R; r0 += B)
        for (int c0 = 0; c0 < C; c0 += B)
            for (int r = r0; r < std::min(r0 + B, R); ++r)
                for (int c = c0; c < std::min(c0 + B, C); ++c)
                    dst[(size_t)c * R + r] = src[(size_t)r * C + c];
}

// 2-D real forward (H x W real -> H x (W/2+1) complex). Both passes run
// through the axis0-vectorized fft_cols (rows via transpose), so every
// butterfly is SIMD across the other axis — the same batching FFTW's
// many-plan interface applies.
void rfft2(const float *img, cfloat *spec, int H, int W) {
    int h = W / 2, K = W / 2 + 1;
    const Plan &p = plan_for(W);
    thread_local std::vector<cfloat> z, zt;
    z.resize((size_t)H * h);
    zt.resize((size_t)H * h);
    for (int y = 0; y < H; ++y)
        for (int i = 0; i < h; ++i)
            z[(size_t)y * h + i] = cfloat(img[(size_t)y * W + 2 * i],
                                          img[(size_t)y * W + 2 * i + 1]);
    transpose_c(z.data(), zt.data(), H, h);       // (h, H)
    fft_cols(zt.data(), h, H, false);
    transpose_c(zt.data(), z.data(), h, H);       // back to (H, h)
    for (int y = 0; y < H; ++y) {                 // Hermitian fold per row
        const cfloat *zr = z.data() + (size_t)y * h;
        cfloat *o = spec + (size_t)y * K;
        o[0] = cfloat(zr[0].real() + zr[0].imag(), 0.0f);
        o[h] = cfloat(zr[0].real() - zr[0].imag(), 0.0f);
        for (int k = 1; k < h; ++k) {
            cfloat a = zr[k], b = std::conj(zr[h - k]);
            cfloat even = 0.5f * (a + b);
            cfloat odd = cfloat(0.0f, -0.5f) * (a - b);
            o[k] = even + p.w[k] * odd;
        }
    }
    fft_cols(spec, H, K, false);
}

// 2-D real inverse (same batched structure, reversed)
void irfft2(const cfloat *spec, float *img, int H, int W) {
    int h = W / 2, K = W / 2 + 1;
    const Plan &p = plan_for(W);
    thread_local std::vector<cfloat> tmp, z, zt;
    tmp.assign(spec, spec + (size_t)H * K);
    fft_cols(tmp.data(), H, K, true);
    z.resize((size_t)H * h);
    zt.resize((size_t)H * h);
    for (int y = 0; y < H; ++y) {                 // inverse fold per row
        const cfloat *in = tmp.data() + (size_t)y * K;
        cfloat *zr = z.data() + (size_t)y * h;
        for (int k = 0; k < h; ++k) {
            cfloat a = in[k], b = std::conj(in[k == 0 ? h : h - k]);
            cfloat even = a + b;
            cfloat odd = (a - b) * p.wconj[k];
            zr[k] = even + cfloat(0.0f, 1.0f) * odd;
        }
    }
    transpose_c(z.data(), zt.data(), H, h);
    fft_cols(zt.data(), h, H, true);
    transpose_c(zt.data(), z.data(), h, H);
    for (int y = 0; y < H; ++y)
        for (int i = 0; i < h; ++i) {
            img[(size_t)y * W + 2 * i] = 0.5f * z[(size_t)y * h + i].real();
            img[(size_t)y * W + 2 * i + 1] =
                0.5f * z[(size_t)y * h + i].imag();
        }
}

// bilinear sample with clamped borders (map_coordinates order=1 analog)
inline float bilerp(const float *img, int H, int W, float yf, float xf) {
    int y0 = (int)std::floor(yf), x0 = (int)std::floor(xf);
    float fy = yf - y0, fx = xf - x0;
    auto at = [&](int y, int x) {
        y = std::min(std::max(y, 0), H - 1);
        x = std::min(std::max(x, 0), W - 1);
        return img[(size_t)y * W + x];
    };
    return at(y0, x0) * (1 - fy) * (1 - fx) + at(y0, x0 + 1) * (1 - fy) * fx
         + at(y0 + 1, x0) * fy * (1 - fx) + at(y0 + 1, x0 + 1) * fy * fx;
}

std::vector<float> random_images(int count, int n, uint32_t seed) {
    std::mt19937 gen(seed);
    std::normal_distribution<float> nd(0.0f, 1.0f);
    std::vector<float> v((size_t)count * n * n);
    for (auto &x : v) x = nd(gen);
    return v;
}

double now_s() {
    return std::chrono::duration<double>(
        std::chrono::steady_clock::now().time_since_epoch()).count();
}

// polar ring sampling grid (rmin..rmax rings x nang angles)
struct PolarGrid {
    int nr, na;
    std::vector<float> yy, xx;   // (nr*na)
    PolarGrid(int n, int rmin, int rmax, int nang) {
        nr = rmax - rmin + 1;
        na = nang;
        yy.resize((size_t)nr * na);
        xx.resize((size_t)nr * na);
        for (int r = 0; r < nr; ++r)
            for (int a = 0; a < na; ++a) {
                double th = 2.0 * M_PI * a / na;
                yy[(size_t)r * na + a] = n / 2 + (rmin + r) * std::sin(th);
                xx[(size_t)r * na + a] = n / 2 + (rmin + r) * std::cos(th);
            }
    }
};

volatile float g_sink;   // defeat dead-code elimination

}  // namespace

extern "C" {

int cpu_baseline_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

// config 1: per-image bestShift + rotational correlation at 64^2
// (data/filters.h:432-472; data/polar.cpp rotationalCorrelation)
double cpu_align64_per_image(int n_meas) {
    const int n = 64, K = n / 2 + 1, rmin = 2, rmax = n / 2 - 2, nang = 128;
    auto imgs = random_images(n_meas + 1, n, 0);
    const float *ref = imgs.data() + (size_t)n_meas * n * n;
    PolarGrid pg(n, rmin, rmax, nang);
    const int ka = nang / 2 + 1;

    // precompute reference spectra (the reference caches these too)
    std::vector<cfloat> Fr((size_t)n * K);
    rfft2(ref, Fr.data(), n, n);
    std::vector<float> polr((size_t)pg.nr * pg.na);
    for (size_t i = 0; i < polr.size(); ++i)
        polr[i] = bilerp(ref, n, n, pg.yy[i], pg.xx[i]);
    std::vector<cfloat> Fpr((size_t)pg.nr * ka);
    for (int r = 0; r < pg.nr; ++r)
        rfft(polr.data() + (size_t)r * pg.na, Fpr.data() + (size_t)r * ka,
             pg.na);

    double t0 = now_s();
    float sink = 0.0f;
#pragma omp parallel for reduction(+ : sink) schedule(static)
    for (int i = 0; i < n_meas; ++i) {
        const float *img = imgs.data() + (size_t)i * n * n;
        std::vector<cfloat> Fi((size_t)n * K), cross((size_t)n * K);
        std::vector<float> cc((size_t)n * n);
        rfft2(img, Fi.data(), n, n);
        for (size_t j = 0; j < cross.size(); ++j)
            cross[j] = Fi[j] * std::conj(Fr[j]);
        irfft2(cross.data(), cc.data(), n, n);
        int best = 0;
        for (int j = 1; j < n * n; ++j) if (cc[j] > cc[best]) best = j;
        sink += cc[best];
        // rotation: polar rings + per-ring FFT correlation
        std::vector<float> pol((size_t)pg.nr * pg.na);
        for (size_t j = 0; j < pol.size(); ++j)
            pol[j] = bilerp(img, n, n, pg.yy[j], pg.xx[j]);
        std::vector<cfloat> Fp((size_t)pg.nr * ka);
        for (int r = 0; r < pg.nr; ++r)
            rfft(pol.data() + (size_t)r * pg.na, Fp.data() + (size_t)r * ka,
                 pg.na);
        std::vector<cfloat> acc(ka, cfloat(0, 0));
        for (int r = 0; r < pg.nr; ++r)
            for (int k = 0; k < ka; ++k)
                acc[k] += Fp[(size_t)r * ka + k]
                          * std::conj(Fpr[(size_t)r * ka + k]);
        std::vector<float> curve(nang);
        irfft(acc.data(), curve.data(), nang);
        int bi = 0;
        for (int j = 1; j < nang; ++j) if (curve[j] > curve[bi]) bi = j;
        sink += curve[bi];
    }
    g_sink = sink;
    return (now_s() - t0) / n_meas;
}

// config 3: per-image rfft2 + trilinear scatter into the padded cube
// (reconstruct_fourier.cpp:474-531 insertion loop; 3 channels re/im/w)
double cpu_gridding_per_image(int n_meas) {
    const int N = 128, K = N / 2 + 1, Pq = 256;
    auto imgs = random_images(n_meas, N, 1);
    // kept rfft2 samples: |f| <= 0.5 (the numpy baseline's disk)
    std::vector<int> ky, kx;
    std::vector<float> fy, fx;
    for (int y = 0; y < N; ++y) {
        float fyv = (y < K - 1 ? y : y - N) / (float)N;
        for (int x = 0; x < K; ++x) {
            float fxv = x / (float)N;
            if (std::sqrt(fyv * fyv + fxv * fxv) <= 0.5f) {
                ky.push_back(y); kx.push_back(x);
                fy.push_back(fyv); fx.push_back(fxv);
            }
        }
    }
    const size_t S = ky.size();
    // per-image random rotations (ZYZ Euler, as the bench inputs)
    std::mt19937 gen(7);
    std::uniform_real_distribution<double> ur(0.0, 2 * M_PI);
    std::uniform_real_distribution<double> uc(-1.0, 1.0);
    std::vector<float> mats((size_t)n_meas * 9);
    for (int i = 0; i < n_meas; ++i) {
        double a = ur(gen), b = std::acos(uc(gen)), g = ur(gen);
        double ca = std::cos(a), sa = std::sin(a), cb = std::cos(b),
               sb = std::sin(b), cg = std::cos(g), sg = std::sin(g);
        float *A = mats.data() + (size_t)i * 9;
        A[0] = (float)(cg * cb * ca - sg * sa);
        A[1] = (float)(cg * cb * sa + sg * ca);
        A[2] = (float)(-cg * sb);
        A[3] = (float)(-sg * cb * ca - cg * sa);
        A[4] = (float)(-sg * cb * sa + cg * ca);
        A[5] = (float)(sg * sb);
        A[6] = (float)(sb * ca);
        A[7] = (float)(sb * sa);
        A[8] = (float)cb;
    }
    static std::vector<float> cube_r, cube_i, cube_w;
    cube_r.assign((size_t)Pq * Pq * Pq, 0.0f);
    cube_i.assign((size_t)Pq * Pq * Pq, 0.0f);
    cube_w.assign((size_t)Pq * Pq * Pq, 0.0f);

    double t0 = now_s();
    // NOTE: the scatter races if threaded naively; the reference's threaded
    // version partitions the cube by z (reconstruct_fourier.cpp buffer
    // loop). Keep the insertion serial per image but thread over images
    // with per-thread private cubes when OMP_NUM_THREADS>1 is impractical
    // at 3x64 MB/thread — so this loop is serial, like the reference's
    // per-buffer insertion thread.
    for (int i = 0; i < n_meas; ++i) {
        const float *img = imgs.data() + (size_t)i * N * N;
        std::vector<cfloat> spec((size_t)N * K);
        rfft2(img, spec.data(), N, N);
        const float *A = mats.data() + (size_t)i * 9;
        for (size_t s = 0; s < S; ++s) {
            cfloat v = spec[(size_t)ky[s] * K + kx[s]];
            float zc = (A[6] * fx[s] + A[7] * fy[s]) * Pq + Pq / 2;
            float yc = (A[3] * fx[s] + A[4] * fy[s]) * Pq + Pq / 2;
            float xc = (A[0] * fx[s] + A[1] * fy[s]) * Pq + Pq / 2;
            int z0 = (int)std::floor(zc), y0 = (int)std::floor(yc),
                x0 = (int)std::floor(xc);
            float fz = zc - z0, fyw = yc - y0, fxw = xc - x0;
            for (int dz = 0; dz < 2; ++dz)
                for (int dy = 0; dy < 2; ++dy)
                    for (int dx = 0; dx < 2; ++dx) {
                        float w = (dz ? fz : 1 - fz) * (dy ? fyw : 1 - fyw)
                                  * (dx ? fxw : 1 - fxw);
                        int zi = std::min(std::max(z0 + dz, 0), Pq - 1);
                        int yi = std::min(std::max(y0 + dy, 0), Pq - 1);
                        int xi = std::min(std::max(x0 + dx, 0), Pq - 1);
                        size_t o = ((size_t)zi * Pq + yi) * Pq + xi;
                        cube_r[o] += w * v.real();
                        cube_i[o] += w * v.imag();
                        cube_w[o] += w;
                    }
        }
    }
    g_sink = cube_w[(size_t)Pq / 2 * Pq * Pq];
    return (now_s() - t0) / n_meas;
}

// config 4: per-particle translational search vs EVERY reference + ring
// rotational correlation (angular_projection_matching.cpp:530-770)
double cpu_match_per_particle(int n_meas, int n_refs) {
    const int n = 128, K = n / 2 + 1, rmin = 2, rmax = n / 2 - 2, nang = 128;
    auto data = random_images(n_meas + n_refs, n, 2);
    const float *refs = data.data() + (size_t)n_meas * n * n;
    PolarGrid pg(n, rmin, rmax, nang);
    const int ka = nang / 2 + 1;

    std::vector<cfloat> Frefs((size_t)n_refs * n * K);
    std::vector<cfloat> Fpolrefs((size_t)n_refs * pg.nr * ka);
    for (int r = 0; r < n_refs; ++r) {
        rfft2(refs + (size_t)r * n * n, Frefs.data() + (size_t)r * n * K,
              n, n);
        std::vector<float> pol((size_t)pg.nr * pg.na);
        for (size_t j = 0; j < pol.size(); ++j)
            pol[j] = bilerp(refs + (size_t)r * n * n, n, n, pg.yy[j],
                            pg.xx[j]);
        for (int q = 0; q < pg.nr; ++q)
            rfft(pol.data() + (size_t)q * pg.na,
                 Fpolrefs.data() + ((size_t)r * pg.nr + q) * ka, pg.na);
    }

    double t0 = now_s();
    float sink = 0.0f;
#pragma omp parallel for reduction(+ : sink) schedule(static)
    for (int i = 0; i < n_meas; ++i) {
        const float *img = data.data() + (size_t)i * n * n;
        std::vector<cfloat> Fi((size_t)n * K), cross((size_t)n * K);
        std::vector<float> cc((size_t)n * n);
        rfft2(img, Fi.data(), n, n);
        for (int r = 0; r < n_refs; ++r) {      // translational vs every ref
            const cfloat *Fr = Frefs.data() + (size_t)r * n * K;
            for (size_t j = 0; j < cross.size(); ++j)
                cross[j] = Fi[j] * std::conj(Fr[j]);
            irfft2(cross.data(), cc.data(), n, n);
            int best = 0;
            for (int j = 1; j < n * n; ++j) if (cc[j] > cc[best]) best = j;
            sink += cc[best];
        }
        // rotational correlation vs every reference
        std::vector<float> pol((size_t)pg.nr * pg.na);
        for (size_t j = 0; j < pol.size(); ++j)
            pol[j] = bilerp(img, n, n, pg.yy[j], pg.xx[j]);
        std::vector<cfloat> Fp((size_t)pg.nr * ka);
        for (int q = 0; q < pg.nr; ++q)
            rfft(pol.data() + (size_t)q * pg.na, Fp.data() + (size_t)q * ka,
                 pg.na);
        std::vector<cfloat> acc(ka);
        std::vector<float> curve(nang);
        for (int r = 0; r < n_refs; ++r) {
            std::fill(acc.begin(), acc.end(), cfloat(0, 0));
            const cfloat *Fpr = Fpolrefs.data() + (size_t)r * pg.nr * ka;
            for (int q = 0; q < pg.nr; ++q)
                for (int k = 0; k < ka; ++k)
                    acc[k] += Fp[(size_t)q * ka + k]
                              * std::conj(Fpr[(size_t)q * ka + k]);
            irfft(acc.data(), curve.data(), nang);
            int bi = 0;
            for (int j = 1; j < nang; ++j) if (curve[j] > curve[bi]) bi = j;
            sink += curve[bi];
        }
    }
    g_sink = sink;
    return (now_s() - t0) / n_meas;
}

#ifdef CPU_BASELINES_SELFTEST
#include <cstdio>
int main() {
    // FFT correctness: roundtrip + known transform
    const int n = 64;
    std::vector<float> x(n), y(n);
    std::mt19937 gen(3);
    std::normal_distribution<float> nd;
    for (auto &v : x) v = nd(gen);
    std::vector<cfloat> X(n / 2 + 1);
    rfft(x.data(), X.data(), n);
    irfft(X.data(), y.data(), n);
    float err = 0;
    for (int i = 0; i < n; ++i) err = std::max(err, std::fabs(x[i] - y[i]));
    std::printf("rfft roundtrip max err: %g\n", err);
    // 2-D roundtrip
    std::vector<float> img(n * n), back(n * n);
    for (auto &v : img) v = nd(gen);
    std::vector<cfloat> S((size_t)n * (n / 2 + 1));
    rfft2(img.data(), S.data(), n, n);
    irfft2(S.data(), back.data(), n, n);
    err = 0;
    for (int i = 0; i < n * n; ++i)
        err = std::max(err, std::fabs(img[i] - back[i]));
    std::printf("rfft2 roundtrip max err: %g\n", err);
    // FFT kernel microbench (compare vs numpy pocketfft kernel time)
    for (int sz : {64, 128}) {
        std::vector<float> a((size_t)sz * sz), b((size_t)sz * sz);
        for (auto &v : a) v = nd(gen);
        std::vector<cfloat> Sp((size_t)sz * (sz / 2 + 1));
        rfft2(a.data(), Sp.data(), sz, sz);
        int reps = 2000;
        double t0 = now_s();
        for (int r = 0; r < reps; ++r) rfft2(a.data(), Sp.data(), sz, sz);
        double tf = (now_s() - t0) / reps;
        t0 = now_s();
        for (int r = 0; r < reps; ++r) irfft2(Sp.data(), b.data(), sz, sz);
        double ti = (now_s() - t0) / reps;
        std::printf("rfft2 %d: %.1f us  irfft2: %.1f us\n", sz, tf * 1e6,
                    ti * 1e6);
    }
    std::printf("align64 s/img: %g\n", cpu_align64_per_image(64));
    std::printf("gridding s/img: %g\n", cpu_gridding_per_image(8));
    std::printf("match s/particle (32 refs): %g\n",
                cpu_match_per_particle(2, 32));
    return err < 1e-4f ? 0 : 1;
}
#endif

}  // extern "C"
