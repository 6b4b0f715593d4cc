// zkhost — native host-side BN254 math for the TPU zkCensus framework.
//
// Role: the CPU runtime pieces the reference delegated to Go/wasm native
// code (go-rapidsnark's field/curve arithmetic, snarkjs setup math) —
// trusted-setup key generation (fixed-base scalar muls over G1/G2),
// Pippenger MSM oracles, and batch affine conversions.  The TPU owns the
// proving hot path (JAX/Pallas); this library keeps the host paths
// (setup, key export, verification preprocessing) from being Python-slow.
//
// Exposed as a C ABI for ctypes (no pybind11 in the image).
// Scalars: 4x u64 little-endian plain form, already reduced mod r.
// Affine points: (x, y) plain-form coordinates, 4x u64 each; (0,0) = inf.
//
// Reference call sites replaced: snarkjs groth16 setup / zkey math
// (circuit/circuit-compiler.sh:99-136), go-rapidsnark prover MSMs
// (zk_census_test.go:89). See SURVEY.md §2b.

#include <cstdint>
#include <cstring>
#include <vector>

#include "constants.h"

using u128 = unsigned __int128;

// ---------------------------------------------------------------------------
// 4x64 Montgomery field arithmetic (generic over modulus)
// ---------------------------------------------------------------------------

struct FieldCtx {
    const u64* mod;
    u64 inv;        // -mod^{-1} mod 2^64
    const u64* r2;  // R^2 mod p
    const u64* r;   // R mod p (Montgomery one)
};

static const FieldCtx FQ_CTX = {FQ_MOD, FQ_INV, FQ_R2, FQ_R};
static const FieldCtx FR_CTX = {FR_MOD, FR_INV, FR_R2, FR_R};

static inline bool geq(const u64* a, const u64* b) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] != b[i]) return a[i] > b[i];
    }
    return true;
}

static inline void sub_nocarry(u64* a, const u64* b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - b[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

static inline void fadd(const FieldCtx& F, const u64* a, const u64* b,
                        u64* out) {
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a[i] + b[i] + carry;
        out[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq(out, F.mod)) sub_nocarry(out, F.mod);
}

static inline void fsub(const FieldCtx& F, const u64* a, const u64* b,
                        u64* out) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - b[i] - borrow;
        out[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)out[i] + F.mod[i] + carry;
            out[i] = (u64)s;
            carry = s >> 64;
        }
    }
}

static inline void fneg(const FieldCtx& F, const u64* a, u64* out) {
    bool zero = !(a[0] | a[1] | a[2] | a[3]);
    if (zero) {
        memset(out, 0, 32);
        return;
    }
    u64 t[4];
    memcpy(t, F.mod, 32);
    sub_nocarry(t, a);
    memcpy(out, t, 32);
}

// CIOS Montgomery multiplication
static inline void fmul(const FieldCtx& F, const u64* a, const u64* b,
                        u64* out) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)t[j] + (u128)a[i] * b[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);

        u64 m = t[0] * F.inv;
        carry = ((u128)t[0] + (u128)m * F.mod[0]) >> 64;
        for (int j = 1; j < 4; j++) {
            u128 cur2 = (u128)t[j] + (u128)m * F.mod[j] + carry;
            t[j - 1] = (u64)cur2;
            carry = cur2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
        t[5] = 0;
    }
    if (t[4] || geq(t, F.mod)) sub_nocarry(t, F.mod);
    memcpy(out, t, 32);
}

static inline void fsqr(const FieldCtx& F, const u64* a, u64* out) {
    fmul(F, a, a, out);
}

static inline void to_mont(const FieldCtx& F, const u64* a, u64* out) {
    fmul(F, a, F.r2, out);
}

static inline void from_mont(const FieldCtx& F, const u64* a, u64* out) {
    u64 one[4] = {1, 0, 0, 0};
    fmul(F, a, one, out);
}

static void fpow(const FieldCtx& F, const u64* a, const u64* e, u64* out) {
    u64 acc[4], base[4];
    memcpy(acc, F.r, 32);  // Montgomery one
    memcpy(base, a, 32);
    for (int limb = 0; limb < 4; limb++) {
        for (int bit = 0; bit < 64; bit++) {
            if ((e[limb] >> bit) & 1) fmul(F, acc, base, acc);
            fsqr(F, base, base);
        }
    }
    memcpy(out, acc, 32);
}

static void finv(const FieldCtx& F, const u64* a, u64* out) {
    // a^(p-2)
    u64 e[4];
    memcpy(e, F.mod, 32);
    // subtract 2
    u64 two[4] = {2, 0, 0, 0};
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)e[i] - two[i] - borrow;
        e[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    fpow(F, a, e, out);
}

// ---------------------------------------------------------------------------
// Fq2 arithmetic (coordinates as 8x u64: [c0, c1])
// ---------------------------------------------------------------------------

struct Fq2 { u64 c0[4]; u64 c1[4]; };

static inline void f2add(const Fq2& a, const Fq2& b, Fq2& o) {
    fadd(FQ_CTX, a.c0, b.c0, o.c0);
    fadd(FQ_CTX, a.c1, b.c1, o.c1);
}

static inline void f2sub(const Fq2& a, const Fq2& b, Fq2& o) {
    fsub(FQ_CTX, a.c0, b.c0, o.c0);
    fsub(FQ_CTX, a.c1, b.c1, o.c1);
}

static inline void f2neg(const Fq2& a, Fq2& o) {
    fneg(FQ_CTX, a.c0, o.c0);
    fneg(FQ_CTX, a.c1, o.c1);
}

static inline void f2mul(const Fq2& a, const Fq2& b, Fq2& o) {
    u64 v0[4], v1[4], s1[4], s2[4], sp[4];
    fmul(FQ_CTX, a.c0, b.c0, v0);
    fmul(FQ_CTX, a.c1, b.c1, v1);
    fadd(FQ_CTX, a.c0, a.c1, s1);
    fadd(FQ_CTX, b.c0, b.c1, s2);
    fmul(FQ_CTX, s1, s2, sp);
    u64 re[4], im[4];
    fsub(FQ_CTX, v0, v1, re);
    fsub(FQ_CTX, sp, v0, im);
    fsub(FQ_CTX, im, v1, im);
    memcpy(o.c0, re, 32);
    memcpy(o.c1, im, 32);
}

static inline void f2sqr(const Fq2& a, Fq2& o) { f2mul(a, a, o); }

static void f2inv(const Fq2& a, Fq2& o) {
    u64 n0[4], n1[4], norm[4], ninv[4];
    fsqr(FQ_CTX, a.c0, n0);
    fsqr(FQ_CTX, a.c1, n1);
    fadd(FQ_CTX, n0, n1, norm);
    finv(FQ_CTX, norm, ninv);
    fmul(FQ_CTX, a.c0, ninv, o.c0);
    u64 negc1[4];
    fneg(FQ_CTX, a.c1, negc1);
    fmul(FQ_CTX, negc1, ninv, o.c1);
}

static inline bool f2is_zero(const Fq2& a) {
    return !(a.c0[0] | a.c0[1] | a.c0[2] | a.c0[3]
             | a.c1[0] | a.c1[1] | a.c1[2] | a.c1[3]);
}

// ---------------------------------------------------------------------------
// G1 Jacobian (Montgomery-form coords)
// ---------------------------------------------------------------------------

struct G1J { u64 x[4], y[4], z[4]; };  // z == 0 -> infinity

static inline bool g1_is_inf(const G1J& p) {
    return !(p.z[0] | p.z[1] | p.z[2] | p.z[3]);
}

static void g1_dbl(const G1J& p, G1J& r) {
    if (g1_is_inf(p)) { r = p; return; }
    const FieldCtx& F = FQ_CTX;
    u64 a[4], b[4], c[4], d[4], e[4], f[4], t[4];
    fsqr(F, p.x, a);              // A = X^2
    fsqr(F, p.y, b);              // B = Y^2
    fsqr(F, b, c);                // C = B^2
    fadd(F, p.x, b, d);           // X+B
    fsqr(F, d, d);                // (X+B)^2
    fsub(F, d, a, d);
    fsub(F, d, c, d);
    fadd(F, d, d, d);             // D = 2((X+B)^2 - A - C)
    fadd(F, a, a, e);
    fadd(F, e, a, e);             // E = 3A
    fsqr(F, e, f);                // F = E^2
    fsub(F, f, d, t);
    fsub(F, t, d, r.x);           // X3 = F - 2D
    u64 c8[4];
    fadd(F, c, c, c8);
    fadd(F, c8, c8, c8);
    fadd(F, c8, c8, c8);          // 8C
    fsub(F, d, r.x, t);
    u64 yz[4];
    fmul(F, p.y, p.z, yz);
    fmul(F, e, t, t);
    fsub(F, t, c8, r.y);          // Y3 = E(D - X3) - 8C
    fadd(F, yz, yz, r.z);         // Z3 = 2YZ
}

static void g1_add(const G1J& p, const G1J& q, G1J& r) {
    if (g1_is_inf(p)) { r = q; return; }
    if (g1_is_inf(q)) { r = p; return; }
    const FieldCtx& F = FQ_CTX;
    u64 z1z1[4], z2z2[4], u1[4], u2[4], s1[4], s2[4];
    fsqr(F, p.z, z1z1);
    fsqr(F, q.z, z2z2);
    fmul(F, p.x, z2z2, u1);
    fmul(F, q.x, z1z1, u2);
    u64 t[4];
    fmul(F, q.z, z2z2, t);
    fmul(F, p.y, t, s1);
    fmul(F, p.z, z1z1, t);
    fmul(F, q.y, t, s2);
    u64 h[4], rr[4];
    fsub(F, u2, u1, h);
    fsub(F, s2, s1, rr);
    bool hz = !(h[0] | h[1] | h[2] | h[3]);
    bool rz = !(rr[0] | rr[1] | rr[2] | rr[3]);
    if (hz) {
        if (rz) { g1_dbl(p, r); return; }
        memset(&r, 0, sizeof(r));  // infinity
        return;
    }
    u64 i[4], j[4], v[4];
    fadd(F, h, h, i);
    fsqr(F, i, i);                // I = (2H)^2
    fmul(F, h, i, j);             // J = H*I
    fadd(F, rr, rr, rr);          // r = 2(S2-S1)
    fmul(F, u1, i, v);            // V = U1*I
    fsqr(F, rr, r.x);
    fsub(F, r.x, j, r.x);
    fsub(F, r.x, v, r.x);
    fsub(F, r.x, v, r.x);         // X3 = r^2 - J - 2V
    fsub(F, v, r.x, t);
    fmul(F, rr, t, t);
    u64 s1j[4];
    fmul(F, s1, j, s1j);
    fadd(F, s1j, s1j, s1j);
    fsub(F, t, s1j, r.y);         // Y3 = r(V - X3) - 2 S1 J
    fadd(F, p.z, q.z, t);
    fsqr(F, t, t);
    fsub(F, t, z1z1, t);
    fsub(F, t, z2z2, t);
    fmul(F, t, h, r.z);           // Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) H
}

// ---------------------------------------------------------------------------
// G2 Jacobian over Fq2
// ---------------------------------------------------------------------------

struct G2J { Fq2 x, y, z; };

static inline bool g2_is_inf(const G2J& p) { return f2is_zero(p.z); }

static void g2_dbl(const G2J& p, G2J& r) {
    if (g2_is_inf(p)) { r = p; return; }
    Fq2 a, b, c, d, e, f, t, c8, yz;
    f2sqr(p.x, a);
    f2sqr(p.y, b);
    f2sqr(b, c);
    f2add(p.x, b, d);
    f2sqr(d, d);
    f2sub(d, a, d);
    f2sub(d, c, d);
    f2add(d, d, d);
    f2add(a, a, e);
    f2add(e, a, e);
    f2sqr(e, f);
    f2sub(f, d, t);
    f2sub(t, d, r.x);
    f2add(c, c, c8);
    f2add(c8, c8, c8);
    f2add(c8, c8, c8);
    f2sub(d, r.x, t);
    f2mul(p.y, p.z, yz);
    f2mul(e, t, t);
    f2sub(t, c8, r.y);
    f2add(yz, yz, r.z);
}

static void g2_add(const G2J& p, const G2J& q, G2J& r) {
    if (g2_is_inf(p)) { r = q; return; }
    if (g2_is_inf(q)) { r = p; return; }
    Fq2 z1z1, z2z2, u1, u2, s1, s2, t, h, rr;
    f2sqr(p.z, z1z1);
    f2sqr(q.z, z2z2);
    f2mul(p.x, z2z2, u1);
    f2mul(q.x, z1z1, u2);
    f2mul(q.z, z2z2, t);
    f2mul(p.y, t, s1);
    f2mul(p.z, z1z1, t);
    f2mul(q.y, t, s2);
    f2sub(u2, u1, h);
    f2sub(s2, s1, rr);
    if (f2is_zero(h)) {
        if (f2is_zero(rr)) { g2_dbl(p, r); return; }
        memset(&r, 0, sizeof(r));
        return;
    }
    Fq2 i, j, v, s1j;
    f2add(h, h, i);
    f2sqr(i, i);
    f2mul(h, i, j);
    f2add(rr, rr, rr);
    f2mul(u1, i, v);
    f2sqr(rr, r.x);
    f2sub(r.x, j, r.x);
    f2sub(r.x, v, r.x);
    f2sub(r.x, v, r.x);
    f2sub(v, r.x, t);
    f2mul(rr, t, t);
    f2mul(s1, j, s1j);
    f2add(s1j, s1j, s1j);
    f2sub(t, s1j, r.y);
    f2add(p.z, q.z, t);
    f2sqr(t, t);
    f2sub(t, z1z1, t);
    f2sub(t, z2z2, t);
    f2mul(t, h, r.z);
}

// ---------------------------------------------------------------------------
// affine conversion (batched, shared inversion)
// ---------------------------------------------------------------------------

static void g1_batch_to_affine(const std::vector<G1J>& pts, u64* out) {
    size_t n = pts.size();
    const FieldCtx& F = FQ_CTX;
    std::vector<u64> prefix(4 * (n + 1));
    memcpy(&prefix[0], F.r, 32);  // one
    std::vector<char> inf(n);
    for (size_t i = 0; i < n; i++) {
        inf[i] = g1_is_inf(pts[i]);
        if (inf[i]) {
            memcpy(&prefix[4 * (i + 1)], &prefix[4 * i], 32);
        } else {
            fmul(F, &prefix[4 * i], pts[i].z, &prefix[4 * (i + 1)]);
        }
    }
    u64 acc[4];
    finv(F, &prefix[4 * n], acc);
    for (size_t ii = n; ii-- > 0;) {
        u64 zinv[4];
        if (inf[ii]) {
            memset(&out[8 * ii], 0, 64);
            continue;
        }
        fmul(F, acc, &prefix[4 * ii], zinv);
        fmul(F, acc, pts[ii].z, acc);
        u64 zi2[4], zi3[4], xa[4], ya[4];
        fsqr(F, zinv, zi2);
        fmul(F, zi2, zinv, zi3);
        fmul(F, pts[ii].x, zi2, xa);
        fmul(F, pts[ii].y, zi3, ya);
        from_mont(F, xa, &out[8 * ii]);
        from_mont(F, ya, &out[8 * ii + 4]);
    }
}

static void g2_batch_to_affine(const std::vector<G2J>& pts, u64* out) {
    size_t n = pts.size();
    for (size_t i = 0; i < n; i++) {
        u64* o = &out[16 * i];
        if (g2_is_inf(pts[i])) {
            memset(o, 0, 128);
            continue;
        }
        Fq2 zinv, zi2, zi3, xa, ya;
        f2inv(pts[i].z, zinv);
        f2sqr(zinv, zi2);
        f2mul(zi2, zinv, zi3);
        f2mul(pts[i].x, zi2, xa);
        f2mul(pts[i].y, zi3, ya);
        from_mont(FQ_CTX, xa.c0, o);
        from_mont(FQ_CTX, xa.c1, o + 4);
        from_mont(FQ_CTX, ya.c0, o + 8);
        from_mont(FQ_CTX, ya.c1, o + 12);
    }
}

// ---------------------------------------------------------------------------
// public C ABI
// ---------------------------------------------------------------------------

static void load_g1(const u64* xy, G1J& p) {
    bool inf = true;
    for (int i = 0; i < 8; i++) inf &= (xy[i] == 0);
    if (inf) { memset(&p, 0, sizeof(p)); return; }
    to_mont(FQ_CTX, xy, p.x);
    to_mont(FQ_CTX, xy + 4, p.y);
    memcpy(p.z, FQ_R, 32);
}

static void load_g2(const u64* xy, G2J& p) {
    bool inf = true;
    for (int i = 0; i < 16; i++) inf &= (xy[i] == 0);
    if (inf) { memset(&p, 0, sizeof(p)); return; }
    to_mont(FQ_CTX, xy, p.x.c0);
    to_mont(FQ_CTX, xy + 4, p.x.c1);
    to_mont(FQ_CTX, xy + 8, p.y.c0);
    to_mont(FQ_CTX, xy + 12, p.y.c1);
    memcpy(p.z.c0, FQ_R, 32);
    memset(p.z.c1, 0, 32);
}

extern "C" {

// out[i] = scalars[i] * base;  scalars n x 4 u64 plain; base/out affine plain
void zk_g1_fixed_base_mul(const u64* scalars, size_t n, const u64* base_xy,
                          u64* out) {
    G1J base;
    load_g1(base_xy, base);
    // window-8 table: 32 windows x 255 entries
    const int WBITS = 8, NWIN = 32;
    std::vector<G1J> table((size_t)NWIN * 255);
    G1J cur = base;
    for (int w = 0; w < NWIN; w++) {
        G1J acc;
        memset(&acc, 0, sizeof(acc));
        for (int d = 1; d <= 255; d++) {
            g1_add(acc, cur, acc);
            table[(size_t)w * 255 + (d - 1)] = acc;
        }
        g1_add(acc, cur, cur);  // cur * 256
    }
    std::vector<G1J> results(n);
    for (size_t i = 0; i < n; i++) {
        G1J acc;
        memset(&acc, 0, sizeof(acc));
        const u64* s = &scalars[4 * i];
        for (int w = 0; w < NWIN; w++) {
            unsigned d = (unsigned)((s[w / 8] >> (8 * (w % 8))) & 0xFF);
            if (d) g1_add(acc, table[(size_t)w * 255 + (d - 1)], acc);
        }
        results[i] = acc;
    }
    g1_batch_to_affine(results, out);
}

void zk_g2_fixed_base_mul(const u64* scalars, size_t n, const u64* base_xy,
                          u64* out) {
    G2J base;
    load_g2(base_xy, base);
    const int NWIN = 32;
    std::vector<G2J> table((size_t)NWIN * 255);
    G2J cur = base;
    for (int w = 0; w < NWIN; w++) {
        G2J acc;
        memset(&acc, 0, sizeof(acc));
        for (int d = 1; d <= 255; d++) {
            g2_add(acc, cur, acc);
            table[(size_t)w * 255 + (d - 1)] = acc;
        }
        g2_add(acc, cur, cur);
    }
    std::vector<G2J> results(n);
    for (size_t i = 0; i < n; i++) {
        G2J acc;
        memset(&acc, 0, sizeof(acc));
        const u64* s = &scalars[4 * i];
        for (int w = 0; w < NWIN; w++) {
            unsigned d = (unsigned)((s[w / 8] >> (8 * (w % 8))) & 0xFF);
            if (d) g2_add(acc, table[(size_t)w * 255 + (d - 1)], acc);
        }
        results[i] = acc;
    }
    g2_batch_to_affine(results, out);
}

// Pippenger MSM: scalars n x 4 u64, points n x 8 u64 affine; out 8 u64
void zk_g1_msm(const u64* scalars, const u64* points, size_t n, u64* out) {
    const int C = 12;
    const int NBUCKETS = 1 << C;
    const int NWIN = (256 + C - 1) / C;
    std::vector<G1J> pts(n);
    for (size_t i = 0; i < n; i++) load_g1(&points[8 * i], pts[i]);
    G1J total;
    memset(&total, 0, sizeof(total));
    std::vector<G1J> buckets(NBUCKETS);
    for (int w = NWIN - 1; w >= 0; w--) {
        for (int k = 0; k < C; k++) g1_dbl(total, total);
        for (auto& b : buckets) memset(&b, 0, sizeof(G1J));
        int bit0 = w * C;
        for (size_t i = 0; i < n; i++) {
            const u64* s = &scalars[4 * i];
            unsigned d = 0;
            for (int k = 0; k < C; k++) {
                int bit = bit0 + k;
                if (bit < 256) {
                    d |= (unsigned)((s[bit / 64] >> (bit % 64)) & 1) << k;
                }
            }
            if (d) g1_add(buckets[d], pts[i], buckets[d]);
        }
        G1J running, wsum;
        memset(&running, 0, sizeof(running));
        memset(&wsum, 0, sizeof(wsum));
        for (int d = NBUCKETS - 1; d >= 1; d--) {
            g1_add(running, buckets[d], running);
            g1_add(wsum, running, wsum);
        }
        g1_add(total, wsum, total);
    }
    std::vector<G1J> one = {total};
    g1_batch_to_affine(one, out);
}

void zk_g2_msm(const u64* scalars, const u64* points, size_t n, u64* out) {
    const int C = 8;
    const int NBUCKETS = 1 << C;
    const int NWIN = 32;
    std::vector<G2J> pts(n);
    for (size_t i = 0; i < n; i++) load_g2(&points[16 * i], pts[i]);
    G2J total;
    memset(&total, 0, sizeof(total));
    std::vector<G2J> buckets(NBUCKETS);
    for (int w = NWIN - 1; w >= 0; w--) {
        for (int k = 0; k < C; k++) g2_dbl(total, total);
        for (auto& b : buckets) memset(&b, 0, sizeof(G2J));
        for (size_t i = 0; i < n; i++) {
            const u64* s = &scalars[4 * i];
            unsigned d = (unsigned)((s[w / 8] >> (8 * (w % 8))) & 0xFF);
            if (d) g2_add(buckets[d], pts[i], buckets[d]);
        }
        G2J running, wsum;
        memset(&running, 0, sizeof(running));
        memset(&wsum, 0, sizeof(wsum));
        for (int d = NBUCKETS - 1; d >= 1; d--) {
            g2_add(running, buckets[d], running);
            g2_add(wsum, running, wsum);
        }
        g2_add(total, wsum, total);
    }
    std::vector<G2J> one = {total};
    g2_batch_to_affine(one, out);
}

// ---------------------------------------------------------------------------
// ceremony-derivation primitives (ptau -> proving key): pairwise scalar
// mul, pairwise add, and segment-sum over affine point arrays.  These are
// the EC building blocks of the Lagrange-ification (EC-iNTT butterflies)
// and the per-wire sparse combinations — the snarkjs "prepare phase2" +
// "groth16 setup" math (circuit/circuit-compiler.sh:99-136) done natively.
// ---------------------------------------------------------------------------

// out[i] = scalars[i] * points[i]  (pairwise; scalars < r, plain form)
void zk_g1_scale_batch(const u64* scalars, const u64* points, size_t n,
                       u64* out) {
    std::vector<G1J> results(n);
    #pragma omp parallel for schedule(static)
    for (long long i = 0; i < (long long)n; i++) {
        G1J p;
        load_g1(&points[8 * i], p);
        G1J acc;
        memset(&acc, 0, sizeof(acc));
        const u64* s = &scalars[4 * i];
        for (int bit = 253; bit >= 0; bit--) {
            g1_dbl(acc, acc);
            if ((s[bit / 64] >> (bit % 64)) & 1) g1_add(acc, p, acc);
        }
        results[i] = acc;
    }
    g1_batch_to_affine(results, out);
}

void zk_g2_scale_batch(const u64* scalars, const u64* points, size_t n,
                       u64* out) {
    std::vector<G2J> results(n);
    #pragma omp parallel for schedule(static)
    for (long long i = 0; i < (long long)n; i++) {
        G2J p;
        load_g2(&points[16 * i], p);
        G2J acc;
        memset(&acc, 0, sizeof(acc));
        const u64* s = &scalars[4 * i];
        for (int bit = 253; bit >= 0; bit--) {
            g2_dbl(acc, acc);
            if ((s[bit / 64] >> (bit % 64)) & 1) g2_add(acc, p, acc);
        }
        results[i] = acc;
    }
    g2_batch_to_affine(results, out);
}

// out[i] = a[i] + b[i]  (pairwise affine add)
void zk_g1_add_batch(const u64* a, const u64* b, size_t n, u64* out) {
    std::vector<G1J> results(n);
    for (size_t i = 0; i < n; i++) {
        G1J pa, pb;
        load_g1(&a[8 * i], pa);
        load_g1(&b[8 * i], pb);
        g1_add(pa, pb, results[i]);
    }
    g1_batch_to_affine(results, out);
}

void zk_g2_add_batch(const u64* a, const u64* b, size_t n, u64* out) {
    std::vector<G2J> results(n);
    for (size_t i = 0; i < n; i++) {
        G2J pa, pb;
        load_g2(&a[16 * i], pa);
        load_g2(&b[16 * i], pb);
        g2_add(pa, pb, results[i]);
    }
    g2_batch_to_affine(results, out);
}

// out[ids[i]] += points[i]  for i in [n); out has m slots, zero-initialized
void zk_g1_segsum(const u64* points, const uint32_t* ids, size_t n,
                  size_t m, u64* out) {
    std::vector<G1J> acc(m);
    for (auto& a : acc) memset(&a, 0, sizeof(G1J));
    for (size_t i = 0; i < n; i++) {
        G1J p;
        load_g1(&points[8 * i], p);
        g1_add(acc[ids[i]], p, acc[ids[i]]);
    }
    g1_batch_to_affine(acc, out);
}

void zk_g2_segsum(const u64* points, const uint32_t* ids, size_t n,
                  size_t m, u64* out) {
    std::vector<G2J> acc(m);
    for (auto& a : acc) memset(&a, 0, sizeof(G2J));
    for (size_t i = 0; i < n; i++) {
        G2J p;
        load_g2(&points[16 * i], p);
        g2_add(acc[ids[i]], p, acc[ids[i]]);
    }
    g2_batch_to_affine(acc, out);
}

}  // extern "C"
