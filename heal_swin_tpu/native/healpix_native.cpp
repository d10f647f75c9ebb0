// HEALPix core index math in C++ — native equivalent of the healpy (C++) routines the
// reference depends on (SURVEY.md §2.9): nested/ring conversions, pixel centers,
// ang2pix, and 4-neighbor bilinear interpolation weights.
//
// Mirrors heal_swin_tpu/ops/healpix.py exactly (same algorithms, same conventions);
// the Python module dispatches here via ctypes when this library is built
// (heal_swin_tpu/ops/native.py), with the numpy implementation as fallback and as the
// cross-check oracle in tests.
//
// Build: make -C heal_swin_tpu/native  (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <algorithm>

namespace {

const int64_t JRLL[12] = {2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4};
const int64_t JPLL[12] = {1, 3, 5, 7, 0, 2, 4, 6, 1, 3, 5, 7};
const double PI = 3.14159265358979323846;

inline uint64_t spread_bits(uint64_t v) {
    v &= 0xffffffffull;
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFull;
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFull;
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0Full;
    v = (v | (v << 2)) & 0x3333333333333333ull;
    v = (v | (v << 1)) & 0x5555555555555555ull;
    return v;
}

inline uint64_t compress_bits(uint64_t v) {
    v &= 0x5555555555555555ull;
    v = (v | (v >> 1)) & 0x3333333333333333ull;
    v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0Full;
    v = (v | (v >> 4)) & 0x00FF00FF00FF00FFull;
    v = (v | (v >> 8)) & 0x0000FFFF0000FFFFull;
    v = (v | (v >> 16)) & 0x00000000FFFFFFFFull;
    return v;
}

inline int64_t isqrt64(int64_t v) {
    int64_t r = (int64_t)std::sqrt((double)v + 0.5);
    while (r * r > v) --r;
    while ((r + 1) * (r + 1) <= v) ++r;
    return r;
}

struct Xyf { int64_t x, y, f; };

inline Xyf nest2xyf(int64_t nside, int64_t pix) {
    int64_t npface = nside * nside;
    Xyf r;
    r.f = pix / npface;
    uint64_t p = (uint64_t)(pix % npface);
    r.x = (int64_t)compress_bits(p);
    r.y = (int64_t)compress_bits(p >> 1);
    return r;
}

inline int64_t xyf2nest(int64_t nside, Xyf v) {
    return v.f * nside * nside +
           (int64_t)(spread_bits((uint64_t)v.x) | (spread_bits((uint64_t)v.y) << 1));
}

inline int64_t xyf2ring(int64_t nside, Xyf v) {
    int64_t npix = 12 * nside * nside;
    int64_t ncap = 2 * nside * (nside - 1);
    int64_t jr = JRLL[v.f] * nside - v.x - v.y - 1;
    int64_t nr, kshift, n_before;
    if (jr < nside) {
        nr = jr; kshift = 0; n_before = 2 * nr * (nr - 1);
    } else if (jr > 3 * nside) {
        nr = 4 * nside - jr; kshift = 0; n_before = npix - 2 * (nr + 1) * nr;
    } else {
        nr = nside; kshift = (jr - nside) & 1; n_before = ncap + (jr - nside) * 4 * nside;
    }
    int64_t jp = (JPLL[v.f] * nr + v.x - v.y + 1 + kshift) / 2;
    if (jp > 4 * nr) jp -= 4 * nr;
    if (jp < 1) jp += 4 * nr;
    return n_before + jp - 1;
}

inline Xyf ring2xyf(int64_t nside, int64_t pix) {
    int64_t npix = 12 * nside * nside;
    int64_t ncap = 2 * nside * (nside - 1);
    int64_t iring, iphi, kshift, nr, face;
    if (pix < ncap) {
        iring = (1 + isqrt64(1 + 2 * pix)) >> 1;
        iphi = pix + 1 - 2 * iring * (iring - 1);
        kshift = 0; nr = iring; face = (iphi - 1) / iring;
    } else if (pix < npix - ncap) {
        int64_t ip = pix - ncap;
        iring = ip / (4 * nside) + nside;
        iphi = ip % (4 * nside) + 1;
        kshift = (iring + nside) & 1;
        nr = nside;
        int64_t ire = iring - nside + 1;
        int64_t irm = 2 * nside + 2 - ire;
        int64_t ifm = (iphi - ire / 2 + nside - 1) / nside;
        int64_t ifp = (iphi - irm / 2 + nside - 1) / nside;
        face = (ifp == ifm) ? (ifp | 4) : ((ifp < ifm) ? ifp : (ifm + 8));
    } else {
        int64_t ip = npix - pix;
        iring = (1 + isqrt64(2 * ip - 1)) >> 1;
        iphi = 4 * iring + 1 - (ip - 2 * iring * (iring - 1));
        kshift = 0; nr = iring;
        iring = 4 * nside - iring;
        face = 8 + (iphi - 1) / nr;
    }
    int64_t irt = iring - JRLL[face] * nside + 1;
    int64_t ipt = 2 * iphi - JPLL[face] * nr - kshift - 1;
    if (ipt >= 2 * nside) ipt -= 8 * nside;
    Xyf r;
    r.x = (ipt - irt) >> 1;
    r.y = (-ipt - irt) >> 1;
    r.f = face;
    return r;
}

inline void xyf2loc(int64_t nside, Xyf v, double* z, double* phi) {
    int64_t npix = 12 * nside * nside;
    int64_t jr = JRLL[v.f] * nside - v.x - v.y - 1;
    int64_t nr, kshift;
    if (jr < nside) {
        nr = jr; kshift = 0;
        *z = 1.0 - (double)(nr * nr) * (4.0 / npix);
    } else if (jr > 3 * nside) {
        nr = 4 * nside - jr; kshift = 0;
        *z = -(1.0 - (double)(nr * nr) * (4.0 / npix));
    } else {
        nr = nside; kshift = (jr - nside) & 1;
        *z = (double)(2 * nside - jr) * (2.0 / (3.0 * nside));
    }
    int64_t jp = (JPLL[v.f] * nr + v.x - v.y + 1 + kshift) / 2;
    if (jp > 4 * nr) jp -= 4 * nr;
    if (jp < 1) jp += 4 * nr;
    *phi = ((double)jp - (kshift + 1) * 0.5) * (PI / 2.0) / (double)nr;
}

inline Xyf loc2xyf(int64_t nside, double z, double phi) {
    double za = std::fabs(z);
    double tt = std::fmod(phi, 2.0 * PI);
    if (tt < 0) tt += 2.0 * PI;
    tt *= 2.0 / PI;
    Xyf r;
    if (za <= 2.0 / 3.0) {
        double temp1 = nside * (0.5 + tt);
        double temp2 = nside * (z * 0.75);
        int64_t jp = (int64_t)std::floor(temp1 - temp2);
        int64_t jm = (int64_t)std::floor(temp1 + temp2);
        int shift = 0;
        int64_t n = nside;
        while (n > 1) { n >>= 1; ++shift; }
        int64_t ifp = jp >> shift;
        int64_t ifm = jm >> shift;
        r.f = (ifp == ifm) ? ((ifp & 3) + 4) : ((ifp < ifm) ? (ifp & 3) : ((ifm & 3) + 8));
        r.x = jm & (nside - 1);
        r.y = nside - (jp & (nside - 1)) - 1;
    } else {
        int64_t ntt = std::min((int64_t)tt, (int64_t)3);
        double tp = tt - ntt;
        double tmp = nside * std::sqrt(3.0 * (1.0 - za));
        int64_t jp = std::min((int64_t)(tp * tmp), nside - 1);
        int64_t jm = std::min((int64_t)((1.0 - tp) * tmp), nside - 1);
        if (z >= 0) {
            r.f = ntt; r.x = nside - jm - 1; r.y = nside - jp - 1;
        } else {
            r.f = ntt + 8; r.x = jp; r.y = jm;
        }
    }
    return r;
}

// ring number (1..4nside-1) -> startpix, ringpix, theta, shifted
inline void ring_info(int64_t nside, int64_t ring, int64_t* startpix, int64_t* ringpix,
                      double* theta, bool* shifted) {
    int64_t npix = 12 * nside * nside;
    int64_t ncap = 2 * nside * (nside - 1);
    int64_t northring = (ring > 2 * nside) ? (4 * nside - ring) : ring;
    if (northring < nside) {
        double tmp = (double)(northring * northring) * (4.0 / npix);
        double costheta = 1.0 - tmp;
        double sintheta = std::sqrt(std::max(tmp * (2.0 - tmp), 0.0));
        *theta = std::atan2(sintheta, costheta);
        *startpix = 2 * northring * (northring - 1);
        *ringpix = 4 * northring;
        *shifted = true;
    } else {
        double zz = (double)(2 * nside - northring) * (2.0 / (3.0 * nside));
        *theta = std::acos(std::min(std::max(zz, -1.0), 1.0));
        *startpix = ncap + (northring - nside) * 4 * nside;
        *ringpix = 4 * nside;
        *shifted = ((northring - nside) & 1) == 0;
    }
    if (ring != northring) {
        *theta = PI - *theta;
        *startpix = npix - *startpix - *ringpix;
    }
}

inline int64_t ring_above(int64_t nside, double z) {
    double az = std::fabs(z);
    if (az <= 2.0 / 3.0) return (int64_t)(nside * (2.0 - 1.5 * z));
    int64_t iring = (int64_t)(nside * std::sqrt(3.0 * (1.0 - az)));
    return (z > 0) ? iring : (4 * nside - iring - 1);
}

}  // namespace

extern "C" {

void hpx_nest2ring(int64_t nside, const int64_t* pix, int64_t n, int64_t* out) {
    for (int64_t i = 0; i < n; ++i) out[i] = xyf2ring(nside, nest2xyf(nside, pix[i]));
}

void hpx_ring2nest(int64_t nside, const int64_t* pix, int64_t n, int64_t* out) {
    for (int64_t i = 0; i < n; ++i) out[i] = xyf2nest(nside, ring2xyf(nside, pix[i]));
}

void hpx_pix2ang(int64_t nside, const int64_t* pix, int64_t n, int nest, double* theta,
                 double* phi) {
    for (int64_t i = 0; i < n; ++i) {
        Xyf v = nest ? nest2xyf(nside, pix[i]) : ring2xyf(nside, pix[i]);
        double z, ph;
        xyf2loc(nside, v, &z, &ph);
        theta[i] = std::acos(std::min(std::max(z, -1.0), 1.0));
        phi[i] = ph;
    }
}

void hpx_ang2pix(int64_t nside, const double* theta, const double* phi, int64_t n, int nest,
                 int64_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        Xyf v = loc2xyf(nside, std::cos(theta[i]), phi[i]);
        out[i] = nest ? xyf2nest(nside, v) : xyf2ring(nside, v);
    }
}

// pix_out: (4, n) row-major; wgt_out: (4, n)
void hpx_get_interp_weights(int64_t nside, const double* theta, const double* phi, int64_t n,
                            int nest, int64_t* pix_out, double* wgt_out) {
    int64_t npix = 12 * nside * nside;
    for (int64_t i = 0; i < n; ++i) {
        double th = theta[i], ph = phi[i];
        double z = std::cos(th);
        int64_t ir1 = ring_above(nside, z);
        int64_t ir2 = ir1 + 1;
        int64_t pix[4] = {0, 0, 0, 0};
        double wgt[4] = {0, 0, 0, 0};
        double theta1 = 0.0, theta2 = PI;

        if (ir1 > 0) {
            int64_t sp, nr; bool sh;
            ring_info(nside, ir1, &sp, &nr, &theta1, &sh);
            double dphi = 2.0 * PI / nr;
            double tmp = ph / dphi - 0.5 * (sh ? 1.0 : 0.0);
            int64_t i1 = (int64_t)std::floor(tmp);
            double w1 = tmp - i1;
            int64_t i2 = i1 + 1;
            i1 %= nr; if (i1 < 0) i1 += nr;
            i2 %= nr; if (i2 < 0) i2 += nr;
            pix[0] = sp + i1; pix[1] = sp + i2;
            wgt[0] = 1.0 - w1; wgt[1] = w1;
        }
        if (ir2 < 4 * nside) {
            int64_t sp, nr; bool sh;
            ring_info(nside, ir2, &sp, &nr, &theta2, &sh);
            double dphi = 2.0 * PI / nr;
            double tmp = ph / dphi - 0.5 * (sh ? 1.0 : 0.0);
            int64_t i1 = (int64_t)std::floor(tmp);
            double w1 = tmp - i1;
            int64_t i2 = i1 + 1;
            i1 %= nr; if (i1 < 0) i1 += nr;
            i2 %= nr; if (i2 < 0) i2 += nr;
            pix[2] = sp + i1; pix[3] = sp + i2;
            wgt[2] = 1.0 - w1; wgt[3] = w1;
        }
        if (ir1 == 0) {
            double wtheta = (theta2 > 0) ? th / theta2 : 0.0;
            wgt[2] *= wtheta; wgt[3] *= wtheta;
            double fac = (1.0 - wtheta) * 0.25;
            wgt[0] = fac; wgt[1] = fac;
            wgt[2] += fac; wgt[3] += fac;
            pix[0] = (pix[2] + 2) % 4;
            pix[1] = (pix[3] + 2) % 4;
        } else if (ir2 == 4 * nside) {
            double denom = (PI - theta1 > 0) ? (PI - theta1) : 1.0;
            double wtheta = (th - theta1) / denom;
            wgt[0] *= (1.0 - wtheta); wgt[1] *= (1.0 - wtheta);
            double fac = wtheta * 0.25;
            wgt[0] += fac; wgt[1] += fac;
            wgt[2] = fac; wgt[3] = fac;
            pix[2] = ((pix[0] + 2) & 3) + npix - 4;
            pix[3] = ((pix[1] + 2) & 3) + npix - 4;
        } else {
            double denom = (theta2 - theta1 != 0) ? (theta2 - theta1) : 1.0;
            double wtheta = (th - theta1) / denom;
            wgt[0] *= (1.0 - wtheta); wgt[1] *= (1.0 - wtheta);
            wgt[2] *= wtheta; wgt[3] *= wtheta;
        }
        for (int k = 0; k < 4; ++k) {
            int64_t p = pix[k];
            if (nest) p = xyf2nest(nside, ring2xyf(nside, p));
            pix_out[(int64_t)k * n + i] = p;
            wgt_out[(int64_t)k * n + i] = wgt[k];
        }
    }
}

}  // extern "C"
