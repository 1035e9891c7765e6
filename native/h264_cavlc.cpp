// In-process H.264 CAVLC all-intra encoder: the compressed debug-stream
// tier above the lossless I_PCM encoder.
//
// The reference streams its debug video through a real encoder
// (reference src/rtpstreamer.cpp:62-93 auto-picks nvenc/qsv/vaapi/x264);
// I_PCM is ~12 bits/px (a 1080p30 stream is ~750 Mb/s, LAN-hostile). This
// tier codes every macroblock as Intra_16x16 with DC prediction, the 4x4
// integer core transform + Hadamard DC transforms, spec-exact dequant and
// reconstruction (so the decoder's output equals our reconstruction
// bit-for-bit) and CAVLC entropy coding — a fully standard baseline
// bitstream at roughly 0.3-2 bits/px depending on content and QP.
//
// QP is clamped to [10, 29]: <=29 keeps the chroma QP mapping identity
// (Table 8-15) and >=10 bounds worst-case level magnitudes far inside the
// CAVLC escape range.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include "h264_common.h"

using vptpu::BitWriter;

namespace {

// ---------------------------------------------------------------------------
// quant / dequant tables (ITU-T H.264 8.5.9-8.5.12)
// ---------------------------------------------------------------------------

// encoder-side multipliers MF, per qp%6 and coefficient class
// class 0: (0,0),(0,2),(2,0),(2,2); class 1: (1,1),(1,3),(3,1),(3,3);
// class 2: the rest
static const int32_t kMF[6][3] = {
    {13107, 5243, 8066}, {11916, 4660, 7490}, {10082, 4194, 6554},
    {9362, 3647, 5825},  {8192, 3355, 5243},  {7282, 2893, 4559},
};
// decoder-side scale V (spec levelScale = 16 * V)
static const int32_t kV[6][3] = {
    {10, 16, 13}, {11, 18, 14}, {13, 20, 16},
    {14, 23, 18}, {16, 25, 20}, {18, 29, 23},
};

static inline int pclass(int r, int c) {
    const bool re = (r & 1) == 0, ce = (c & 1) == 0;
    return (re && ce) ? 0 : ((!re && !ce) ? 1 : 2);
}

// zigzag scan for 4x4 blocks (Figure 8-8)
static const int kZigzag[16] = {0, 1, 4, 8, 5, 2, 3, 6,
                               9, 12, 13, 10, 7, 11, 14, 15};

// ---------------------------------------------------------------------------
// CAVLC VLC tables (Tables 9-5, 9-7, 9-9, 9-10). {len, value} pairs.
// ---------------------------------------------------------------------------

struct Vlc { uint8_t len; uint16_t val; };

// coeff_token, contexts: 0 -> 0<=nC<2, 1 -> 2<=nC<4, 2 -> 4<=nC<8.
// Indexed [ctx][TotalCoeff][TrailingOnes].
static const Vlc kCoeffToken[3][17][4] = {
    {   // ctx 0
        {{1, 1}, {0, 0}, {0, 0}, {0, 0}},
        {{6, 5}, {2, 1}, {0, 0}, {0, 0}},
        {{8, 7}, {6, 4}, {3, 1}, {0, 0}},
        {{9, 7}, {8, 6}, {7, 5}, {5, 3}},
        {{10, 7}, {9, 6}, {8, 5}, {6, 3}},
        {{11, 7}, {10, 6}, {9, 5}, {7, 4}},
        {{13, 15}, {11, 6}, {10, 5}, {8, 4}},
        {{13, 11}, {13, 14}, {11, 5}, {9, 4}},
        {{13, 8}, {13, 10}, {13, 13}, {10, 4}},
        {{14, 15}, {14, 14}, {13, 9}, {11, 4}},
        {{14, 11}, {14, 10}, {14, 13}, {13, 12}},
        {{15, 15}, {15, 14}, {14, 9}, {14, 12}},
        {{15, 11}, {15, 10}, {15, 13}, {14, 8}},
        {{16, 15}, {15, 1}, {15, 9}, {15, 12}},
        {{16, 11}, {16, 14}, {16, 13}, {15, 8}},
        {{16, 7}, {16, 10}, {16, 9}, {16, 12}},
        {{16, 4}, {16, 6}, {16, 5}, {16, 8}},
    },
    {   // ctx 1
        {{2, 3}, {0, 0}, {0, 0}, {0, 0}},
        {{6, 11}, {2, 2}, {0, 0}, {0, 0}},
        {{6, 7}, {5, 7}, {3, 3}, {0, 0}},
        {{7, 7}, {6, 10}, {6, 9}, {4, 5}},
        {{8, 7}, {6, 6}, {6, 5}, {4, 4}},
        {{8, 4}, {7, 6}, {7, 5}, {5, 6}},
        {{9, 7}, {8, 6}, {8, 5}, {6, 8}},
        {{11, 15}, {9, 6}, {9, 5}, {6, 4}},
        {{11, 11}, {11, 14}, {11, 13}, {7, 4}},
        {{12, 15}, {11, 10}, {11, 9}, {9, 4}},
        {{12, 11}, {12, 14}, {12, 13}, {11, 12}},
        {{12, 8}, {12, 10}, {12, 9}, {11, 8}},
        {{13, 15}, {13, 14}, {13, 13}, {12, 12}},
        {{13, 11}, {13, 10}, {13, 9}, {13, 12}},
        {{13, 7}, {14, 11}, {13, 6}, {13, 8}},
        {{14, 9}, {14, 8}, {14, 10}, {13, 1}},
        {{14, 7}, {14, 6}, {14, 5}, {14, 4}},
    },
    {   // ctx 2
        {{4, 15}, {0, 0}, {0, 0}, {0, 0}},
        {{6, 15}, {4, 14}, {0, 0}, {0, 0}},
        {{6, 11}, {5, 15}, {4, 13}, {0, 0}},
        {{6, 8}, {5, 12}, {5, 14}, {4, 12}},
        {{7, 15}, {5, 10}, {5, 11}, {4, 11}},
        {{7, 11}, {5, 8}, {5, 9}, {4, 10}},
        {{7, 9}, {6, 14}, {6, 13}, {4, 9}},
        {{7, 8}, {6, 10}, {6, 9}, {4, 8}},
        {{8, 15}, {7, 14}, {7, 13}, {5, 13}},
        {{8, 11}, {8, 14}, {7, 10}, {6, 12}},
        {{9, 15}, {8, 10}, {8, 13}, {7, 12}},
        {{9, 11}, {9, 14}, {8, 9}, {8, 12}},
        {{9, 8}, {9, 10}, {9, 13}, {8, 8}},
        {{10, 13}, {9, 7}, {9, 9}, {9, 12}},
        {{10, 9}, {10, 12}, {10, 11}, {10, 10}},
        {{10, 5}, {10, 8}, {10, 7}, {10, 6}},
        {{10, 1}, {10, 4}, {10, 3}, {10, 2}},
    },
};

// coeff_token for chroma DC (nC == -1), Table 9-5 last column (4:2:0)
static const Vlc kCoeffTokenChromaDC[5][4] = {
    {{2, 1}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 7}, {1, 1}, {0, 0}, {0, 0}},
    {{6, 4}, {6, 6}, {3, 1}, {0, 0}},
    {{6, 3}, {7, 3}, {7, 2}, {6, 5}},
    {{6, 2}, {8, 3}, {8, 2}, {7, 0}},
};

// total_zeros for 4x4 (and 16-coeff DC) blocks, Table 9-7/9-8.
// Indexed [TotalCoeff-1][total_zeros].
static const Vlc kTotalZeros[15][16] = {
    {{1, 1}, {3, 3}, {3, 2}, {4, 3}, {4, 2}, {5, 3}, {5, 2}, {6, 3}, {6, 2}, {7, 3}, {7, 2}, {8, 3}, {8, 2}, {9, 3}, {9, 2}, {9, 1}},
    {{3, 7}, {3, 6}, {3, 5}, {3, 4}, {3, 3}, {4, 5}, {4, 4}, {4, 3}, {4, 2}, {5, 3}, {5, 2}, {6, 3}, {6, 2}, {6, 1}, {6, 0}, {0, 0}},
    {{4, 5}, {3, 7}, {3, 6}, {3, 5}, {4, 4}, {4, 3}, {3, 4}, {3, 3}, {4, 2}, {5, 3}, {5, 2}, {6, 1}, {5, 1}, {6, 0}, {0, 0}, {0, 0}},
    {{5, 3}, {3, 7}, {4, 5}, {4, 4}, {3, 6}, {3, 5}, {3, 4}, {4, 3}, {3, 3}, {4, 2}, {5, 2}, {5, 1}, {5, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{4, 5}, {4, 4}, {4, 3}, {3, 7}, {3, 6}, {3, 5}, {3, 4}, {3, 3}, {4, 2}, {5, 1}, {4, 1}, {5, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 1}, {5, 1}, {3, 7}, {3, 6}, {3, 5}, {3, 4}, {3, 3}, {3, 2}, {4, 1}, {3, 1}, {6, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 1}, {5, 1}, {3, 5}, {3, 4}, {3, 3}, {2, 3}, {3, 2}, {4, 1}, {3, 1}, {6, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 1}, {4, 1}, {5, 1}, {3, 3}, {2, 3}, {2, 2}, {3, 2}, {3, 1}, {6, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 1}, {6, 0}, {4, 1}, {2, 3}, {2, 2}, {3, 1}, {2, 1}, {5, 1}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{5, 1}, {5, 0}, {3, 1}, {2, 3}, {2, 2}, {2, 1}, {4, 1}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{4, 0}, {4, 1}, {3, 1}, {3, 2}, {1, 1}, {3, 3}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{4, 0}, {4, 1}, {2, 1}, {1, 1}, {3, 1}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{3, 0}, {3, 1}, {1, 1}, {2, 1}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{2, 0}, {2, 1}, {1, 1}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{1, 0}, {1, 1}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
};

// total_zeros for chroma DC (maxNumCoeff 4), Table 9-9 (4:2:0).
// Indexed [TotalCoeff-1][total_zeros].
static const Vlc kTotalZerosChromaDC[3][4] = {
    {{1, 1}, {2, 1}, {3, 1}, {3, 0}},
    {{1, 1}, {2, 1}, {2, 0}, {0, 0}},
    {{1, 1}, {1, 0}, {0, 0}, {0, 0}},
};

// run_before, Table 9-10. Indexed [min(zerosLeft,7)-1][run_before].
static const Vlc kRunBefore[7][15] = {
    {{1, 1}, {1, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{1, 1}, {2, 1}, {2, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{2, 3}, {2, 2}, {2, 1}, {2, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{2, 3}, {2, 2}, {2, 1}, {3, 1}, {3, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{2, 3}, {2, 2}, {3, 3}, {3, 2}, {3, 1}, {3, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{2, 3}, {3, 0}, {3, 1}, {3, 3}, {3, 2}, {3, 5}, {3, 4}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{3, 7}, {3, 6}, {3, 5}, {3, 4}, {3, 3}, {3, 2}, {3, 1}, {4, 1}, {5, 1}, {6, 1}, {7, 1}, {8, 1}, {9, 1}, {10, 1}, {11, 1}},
};

// ---------------------------------------------------------------------------
// transforms (spec-exact reconstruction path)
// ---------------------------------------------------------------------------

// The 4x4 transforms below have vectorized bodies (GCC vector extensions,
// one int32x4 register per matrix row; each pass is transpose + vertical
// butterfly). All arithmetic is int32 add/sub/shift — bit-identical to the
// scalar forms, which remain as the portable fallback.
#if defined(__GNUC__) && defined(__SSE2__)
#define VPTPU_VEC 1
typedef int32_t v4si __attribute__((vector_size(16)));

static inline void vload4(const int32_t in[16], v4si r[4]) {
    __builtin_memcpy(&r[0], in + 0, 16);
    __builtin_memcpy(&r[1], in + 4, 16);
    __builtin_memcpy(&r[2], in + 8, 16);
    __builtin_memcpy(&r[3], in + 12, 16);
}

static inline void vstore4(int32_t out[16], const v4si r[4]) {
    __builtin_memcpy(out + 0, &r[0], 16);
    __builtin_memcpy(out + 4, &r[1], 16);
    __builtin_memcpy(out + 8, &r[2], 16);
    __builtin_memcpy(out + 12, &r[3], 16);
}

static inline void vtranspose4(v4si& a, v4si& b, v4si& c, v4si& d) {
    v4si t0 = __builtin_shufflevector(a, b, 0, 4, 1, 5);
    v4si t1 = __builtin_shufflevector(a, b, 2, 6, 3, 7);
    v4si t2 = __builtin_shufflevector(c, d, 0, 4, 1, 5);
    v4si t3 = __builtin_shufflevector(c, d, 2, 6, 3, 7);
    a = __builtin_shufflevector(t0, t2, 0, 1, 4, 5);
    b = __builtin_shufflevector(t0, t2, 2, 3, 6, 7);
    c = __builtin_shufflevector(t1, t3, 0, 1, 4, 5);
    d = __builtin_shufflevector(t1, t3, 2, 3, 6, 7);
}
#endif

// forward 4x4 core transform: W = Cf * X * Cf^T
static void fwd4x4(const int32_t in[16], int32_t out[16]) {
#ifdef VPTPU_VEC
    v4si x[4];
    vload4(in, x);
    for (int pass = 0; pass < 2; ++pass) {
        vtranspose4(x[0], x[1], x[2], x[3]);  // lanes become the 4 groups
        v4si s03 = x[0] + x[3], d03 = x[0] - x[3];
        v4si s12 = x[1] + x[2], d12 = x[1] - x[2];
        x[0] = s03 + s12;
        x[1] = (d03 + d03) + d12;
        x[2] = s03 - s12;
        x[3] = d03 - (d12 + d12);
    }
    vstore4(out, x);
#else
    int32_t tmp[16];
    for (int r = 0; r < 4; ++r) {
        const int32_t* x = in + 4 * r;
        int32_t s03 = x[0] + x[3], d03 = x[0] - x[3];
        int32_t s12 = x[1] + x[2], d12 = x[1] - x[2];
        tmp[4 * r + 0] = s03 + s12;
        tmp[4 * r + 1] = 2 * d03 + d12;
        tmp[4 * r + 2] = s03 - s12;
        tmp[4 * r + 3] = d03 - 2 * d12;
    }
    for (int c = 0; c < 4; ++c) {
        int32_t x0 = tmp[c], x1 = tmp[4 + c], x2 = tmp[8 + c], x3 = tmp[12 + c];
        int32_t s03 = x0 + x3, d03 = x0 - x3;
        int32_t s12 = x1 + x2, d12 = x1 - x2;
        out[c] = s03 + s12;
        out[4 + c] = 2 * d03 + d12;
        out[8 + c] = s03 - s12;
        out[12 + c] = d03 - 2 * d12;
    }
#endif
}

// inverse 4x4 core transform (8.5.12.3), input = dequantized d, output
// residual r with the final (x + 32) >> 6
static void inv4x4(const int32_t d[16], int32_t r[16]) {
#ifdef VPTPU_VEC
    v4si x[4];
    vload4(d, x);
    for (int pass = 0; pass < 2; ++pass) {
        vtranspose4(x[0], x[1], x[2], x[3]);
        v4si e0 = x[0] + x[2];
        v4si e1 = x[0] - x[2];
        v4si e2 = (x[1] >> 1) - x[3];
        v4si e3 = x[1] + (x[3] >> 1);
        x[0] = e0 + e3;
        x[1] = e1 + e2;
        x[2] = e1 - e2;
        x[3] = e0 - e3;
    }
    for (int i = 0; i < 4; ++i) x[i] = (x[i] + 32) >> 6;
    vstore4(r, x);
#else
    int32_t tmp[16];
    for (int i = 0; i < 4; ++i) {
        const int32_t* x = d + 4 * i;
        int32_t e0 = x[0] + x[2];
        int32_t e1 = x[0] - x[2];
        int32_t e2 = (x[1] >> 1) - x[3];
        int32_t e3 = x[1] + (x[3] >> 1);
        tmp[4 * i + 0] = e0 + e3;
        tmp[4 * i + 1] = e1 + e2;
        tmp[4 * i + 2] = e1 - e2;
        tmp[4 * i + 3] = e0 - e3;
    }
    for (int c = 0; c < 4; ++c) {
        int32_t x0 = tmp[c], x1 = tmp[4 + c], x2 = tmp[8 + c], x3 = tmp[12 + c];
        int32_t e0 = x0 + x2;
        int32_t e1 = x0 - x2;
        int32_t e2 = (x1 >> 1) - x3;
        int32_t e3 = x1 + (x3 >> 1);
        r[c] = (e0 + e3 + 32) >> 6;
        r[4 + c] = (e1 + e2 + 32) >> 6;
        r[8 + c] = (e1 - e2 + 32) >> 6;
        r[12 + c] = (e0 - e3 + 32) >> 6;
    }
#endif
}

// 4x4 Hadamard (both directions identical up to scaling choices)
static void hadamard4x4(const int32_t in[16], int32_t out[16]) {
#ifdef VPTPU_VEC
    v4si x[4];
    vload4(in, x);
    for (int pass = 0; pass < 2; ++pass) {
        vtranspose4(x[0], x[1], x[2], x[3]);
        v4si s03 = x[0] + x[3], d03 = x[0] - x[3];
        v4si s12 = x[1] + x[2], d12 = x[1] - x[2];
        x[0] = s03 + s12;
        x[1] = d03 + d12;
        x[2] = s03 - s12;
        x[3] = d03 - d12;
    }
    vstore4(out, x);
#else
    int32_t tmp[16];
    for (int r = 0; r < 4; ++r) {
        const int32_t* x = in + 4 * r;
        int32_t s03 = x[0] + x[3], d03 = x[0] - x[3];
        int32_t s12 = x[1] + x[2], d12 = x[1] - x[2];
        tmp[4 * r + 0] = s03 + s12;
        tmp[4 * r + 1] = d03 + d12;
        tmp[4 * r + 2] = s03 - s12;
        tmp[4 * r + 3] = d03 - d12;
    }
    for (int c = 0; c < 4; ++c) {
        int32_t x0 = tmp[c], x1 = tmp[4 + c], x2 = tmp[8 + c], x3 = tmp[12 + c];
        int32_t s03 = x0 + x3, d03 = x0 - x3;
        int32_t s12 = x1 + x2, d12 = x1 - x2;
        out[c] = s03 + s12;
        out[4 + c] = d03 + d12;
        out[8 + c] = s03 - s12;
        out[12 + c] = d03 - d12;
    }
#endif
}

static inline uint8_t clip255(int32_t v) {
    return uint8_t(v < 0 ? 0 : (v > 255 ? 255 : v));
}

// ---------------------------------------------------------------------------
// CAVLC residual block writer
// ---------------------------------------------------------------------------

// Encode one residual block (9.2). coeffs: scan-ordered coefficients
// (zigzag already applied by the caller), n = number of coefficients in
// scan (16 luma DC, 15 AC, 4 chroma DC). nC selects the coeff_token
// context (-1 = chroma DC). Returns TotalCoeff.
static FILE* trace_file() {
    static FILE* f = [] {
        const char* p = getenv("VPTPU_CAVLC_TRACE");
        return p ? fopen(p, "w") : (FILE*)nullptr;
    }();
    return f;
}

static int write_block(BitWriter& w, const int32_t* coeffs, int n, int nC) {
    int nz_idx[16];
    int total = 0;
    for (int i = 0; i < n; ++i)
        if (coeffs[i]) nz_idx[total++] = i;

    int trailing = 0;
    // trailing ones: up to 3 consecutive +-1 at the high-frequency end
    for (int i = total - 1; i >= 0 && trailing < 3; --i) {
        int32_t v = coeffs[nz_idx[i]];
        if (v == 1 || v == -1) ++trailing;
        else break;
    }

    if (FILE* tf = trace_file()) {
        fprintf(tf, "blk n=%d nC=%d tc=%d t1=%d tz=%d lv=", n, nC, total,
                trailing, total ? nz_idx[total - 1] + 1 - total : 0);
        for (int i = total - 1; i >= 0; --i)
            fprintf(tf, "%d,", coeffs[nz_idx[i]]);
        fprintf(tf, " pos=");
        for (int i = total - 1; i >= 0; --i)
            fprintf(tf, "%d,", nz_idx[i]);
        fprintf(tf, "\n");
    }

    if (nC == -1) {
        const Vlc& t = kCoeffTokenChromaDC[total][trailing];
        w.put_bits(t.val, t.len);
    } else if (nC < 8) {
        int ctx = (nC < 2) ? 0 : (nC < 4 ? 1 : 2);
        const Vlc& t = kCoeffToken[ctx][total][trailing];
        w.put_bits(t.val, t.len);
    } else {
        // 6-bit FLC: TotalCoeff==0 -> 000011, else ((tc-1)<<2)|t1s
        uint32_t code = (total == 0) ? 3 : uint32_t(((total - 1) << 2) | trailing);
        w.put_bits(code, 6);
    }
    if (total == 0) return 0;

    // trailing one signs, highest frequency first
    for (int i = 0; i < trailing; ++i) {
        int32_t v = coeffs[nz_idx[total - 1 - i]];
        w.put_bit(v < 0 ? 1 : 0);
    }

    // remaining levels, highest frequency first
    int suffix_len = (total > 10 && trailing < 3) ? 1 : 0;
    for (int i = total - 1 - trailing; i >= 0; --i) {
        int32_t level = coeffs[nz_idx[i]];
        int32_t code = (level > 0) ? 2 * level - 2 : -2 * level - 1;
        if (i == total - 1 - trailing && trailing < 3)
            code -= 2;  // first non-T1 level has |value| >= 2
        if (suffix_len == 0) {
            if (code < 14) {
                w.put_bits(1, code + 1);           // code zeros then 1
            } else if (code < 30) {
                w.put_bits(1, 15);                  // level_prefix 14
                w.put_bits(uint32_t(code - 14), 4);
            } else {
                w.put_bits(1, 16);                  // level_prefix 15
                w.put_bits(uint32_t(code - 30), 12);
            }
        } else {
            if (code < (15 << suffix_len)) {
                uint32_t prefix = uint32_t(code) >> suffix_len;
                w.put_bits(1, int(prefix) + 1);
                w.put_bits(uint32_t(code) & ((1u << suffix_len) - 1), suffix_len);
            } else {
                w.put_bits(1, 16);                  // level_prefix 15
                w.put_bits(uint32_t(code - (15 << suffix_len)), 12);
            }
        }
        if (suffix_len == 0) suffix_len = 1;
        if (std::abs(level) > (3 << (suffix_len - 1)) && suffix_len < 6)
            ++suffix_len;
    }

    // total_zeros: zeros before the highest-frequency nonzero
    int total_zeros = nz_idx[total - 1] + 1 - total;
    if (total < n) {
        if (nC == -1) {
            const Vlc& t = kTotalZerosChromaDC[total - 1][total_zeros];
            w.put_bits(t.val, t.len);
        } else {
            const Vlc& t = kTotalZeros[total - 1][total_zeros];
            w.put_bits(t.val, t.len);
        }
    }

    // run_before per coefficient, highest frequency first, except the last
    int zeros_left = total_zeros;
    for (int i = total - 1; i > 0 && zeros_left > 0; --i) {
        int run = nz_idx[i] - nz_idx[i - 1] - 1;
        const Vlc& t = kRunBefore[(zeros_left < 7 ? zeros_left : 7) - 1][run];
        w.put_bits(t.val, t.len);
        zeros_left -= run;
    }
    return total;
}

// ---------------------------------------------------------------------------
// per-macroblock transform + quant + reconstruction state
// ---------------------------------------------------------------------------

struct PlaneCtx {
    uint8_t* recon;       // reconstructed plane (decoder-identical)
    int stride;
    int16_t* nnz;         // per-4x4-block TotalCoeff map, width blk_w
    int blk_w;
    int blk_y0 = 0;       // first block row of this slice (9.2.1 top
                          // availability stops at the slice boundary)
};

// nC from neighbouring 4x4 blocks' TotalCoeff (9.2.1)
static int pred_nc(const PlaneCtx& p, int bx, int by) {
    bool left = bx > 0, top = by > p.blk_y0;
    if (left && top)
        return (p.nnz[by * p.blk_w + bx - 1] + p.nnz[(by - 1) * p.blk_w + bx] + 1) >> 1;
    if (left) return p.nnz[by * p.blk_w + bx - 1];
    if (top) return p.nnz[(by - 1) * p.blk_w + bx];
    return 0;
}

struct QuantParams {
    int qp, qbits, mod;
    int32_t f_intra;   // rounding offset
    int32_t mfpos[16]; // kMF by raster position (quant)
    int32_t lspos[16]; // 16 * kV by raster position (dequant levelScale)
};

static QuantParams make_qp(int qp) {
    QuantParams q;
    q.qp = qp;
    q.qbits = 15 + qp / 6;
    q.mod = qp % 6;
    q.f_intra = (1 << q.qbits) / 3;
    for (int i = 0; i < 16; ++i) {
        int cls = pclass(i / 4, i % 4);
        q.mfpos[i] = kMF[q.mod][cls];
        q.lspos[i] = 16 * kV[q.mod][cls];
    }
    return q;
}

static inline int32_t quant_coeff(int32_t w, int cls, const QuantParams& q,
                                  int extra_shift) {
    // int32 suffices: |w| <= 255*36 (two 1-D passes of gain 6), kMF <=
    // 13107, product < 2^27.4; f < 2^17 — comfortably inside int32
    int32_t f = q.f_intra << extra_shift;
    int32_t lv = (std::abs(w) * kMF[q.mod][cls] + f) >> (q.qbits + extra_shift);
    return w < 0 ? -lv : lv;
}

// AC / plain 4x4 dequant (8.5.12.2); ls = 16 * V
static inline int32_t dequant_ac(int32_t c, int cls, const QuantParams& q) {
    int32_t ls = 16 * kV[q.mod][cls];
    if (q.qp >= 24) return (c * ls) << (q.qp / 6 - 4);
    int sh = 4 - q.qp / 6;
    return (c * ls + (1 << (sh - 1))) >> sh;
}

// Quantize the 15 AC coefficients of a transformed block (raster order,
// slot 0 forced to 0). Returns true if any level is nonzero. Bit-identical
// to quant_coeff(tr[i], pclass, q, 0) per element.
static inline bool quant_block_ac(const int32_t tr[16], const QuantParams& q,
                                  int32_t wq[16]) {
#ifdef VPTPU_VEC
    v4si x[4], mf[4], acc{};
    vload4(tr, x);
    vload4(q.mfpos, mf);
    const v4si f = {q.f_intra, q.f_intra, q.f_intra, q.f_intra};
    for (int g = 0; g < 4; ++g) {
        v4si sign = x[g] >> 31;
        v4si ax = (x[g] ^ sign) - sign;
        v4si lv = (ax * mf[g] + f) >> q.qbits;
        lv = (lv ^ sign) - sign;
        if (g == 0) lv &= (v4si){0, -1, -1, -1};  // DC slot stays 0
        x[g] = lv;
        acc |= lv;
    }
    vstore4(wq, x);
    return (acc[0] | acc[1] | acc[2] | acc[3]) != 0;
#else
    bool any = false;
    wq[0] = 0;
    for (int i = 1; i < 16; ++i) {
        wq[i] = quant_coeff(tr[i], pclass(i / 4, i % 4), q, 0);
        any |= wq[i] != 0;
    }
    return any;
#endif
}

// Quantize n4*4 DC-class coefficients (Hadamard outputs) with the DC
// extra_shift: lv = (|x| * MF0 + (f << es)) >> (qbits + es), sign restored.
static inline void quant_dc_n(const int32_t* in, int n4, const QuantParams& q,
                              int es, int32_t* out) {
#ifdef VPTPU_VEC
    const int32_t mf0 = kMF[q.mod][0];
    const v4si mf = {mf0, mf0, mf0, mf0};
    const int32_t fi = q.f_intra << es;
    const v4si f = {fi, fi, fi, fi};
    for (int g = 0; g < n4; ++g) {
        v4si x;
        __builtin_memcpy(&x, in + 4 * g, 16);
        v4si sign = x >> 31;
        v4si ax = (x ^ sign) - sign;
        v4si lv = (ax * mf + f) >> (q.qbits + es);
        lv = (lv ^ sign) - sign;
        __builtin_memcpy(out + 4 * g, &lv, 16);
    }
#else
    for (int i = 0; i < 4 * n4; ++i) {
        int32_t lv = (std::abs(in[i]) * kMF[q.mod][0]
                      + (q.f_intra << es)) >> (q.qbits + es);
        out[i] = in[i] < 0 ? -lv : lv;
    }
#endif
}

// Quantize all 16 coefficients of a transformed block (raster order, the
// Intra_4x4 LumaLevel4x4 case — no separate DC transform). Returns true
// if any level is nonzero.
static inline bool quant_block_full(const int32_t tr[16], const QuantParams& q,
                                    int32_t wq[16]) {
#ifdef VPTPU_VEC
    v4si x[4], mf[4], acc{};
    vload4(tr, x);
    vload4(q.mfpos, mf);
    const v4si f = {q.f_intra, q.f_intra, q.f_intra, q.f_intra};
    for (int g = 0; g < 4; ++g) {
        v4si sign = x[g] >> 31;
        v4si ax = (x[g] ^ sign) - sign;
        v4si lv = (ax * mf[g] + f) >> q.qbits;
        lv = (lv ^ sign) - sign;
        x[g] = lv;
        acc |= lv;
    }
    vstore4(wq, x);
    return (acc[0] | acc[1] | acc[2] | acc[3]) != 0;
#else
    bool any = false;
    for (int i = 0; i < 16; ++i) {
        wq[i] = quant_coeff(tr[i], pclass(i / 4, i % 4), q, 0);
        any |= wq[i] != 0;
    }
    return any;
#endif
}

// Dequantize a block's 15 AC coefficients into d[1..15] (d[0] untouched).
// Bit-identical to dequant_ac per element.
static inline void dequant_block_ac(const int32_t wq[16], const QuantParams& q,
                                    int32_t d[16]) {
#ifdef VPTPU_VEC
    int32_t d0 = d[0];
    v4si x[4], ls[4];
    vload4(wq, x);
    vload4(q.lspos, ls);
    if (q.qp >= 24) {
        const int sh = q.qp / 6 - 4;
        for (int g = 0; g < 4; ++g) x[g] = (x[g] * ls[g]) << sh;
    } else {
        const int sh = 4 - q.qp / 6;
        const int32_t rnd = 1 << (sh - 1);
        const v4si r = {rnd, rnd, rnd, rnd};
        for (int g = 0; g < 4; ++g) x[g] = (x[g] * ls[g] + r) >> sh;
    }
    vstore4(d, x);
    d[0] = d0;
#else
    for (int i = 1; i < 16; ++i)
        d[i] = dequant_ac(wq[i], pclass(i / 4, i % 4), q);
#endif
}

// luma 4x4 block order inside a MB (6.4.3): 8x8 quadrant z-order, then
// 4x4 z-order within
static const int kBlkX[16] = {0, 1, 0, 1, 2, 3, 2, 3,
                              0, 1, 0, 1, 2, 3, 2, 3};
static const int kBlkY[16] = {0, 0, 1, 1, 0, 0, 1, 1,
                              2, 2, 3, 3, 2, 2, 3, 3};

// ---------------------------------------------------------------------------
// Intra_4x4 luma prediction (8.3.1.2) + per-MB candidate encoding
// ---------------------------------------------------------------------------

// Build the 4x4 prediction for ``mode`` from neighbor samples.
// top[0..7] must carry the top-right substitution already (p[4..7,-1]
// replaced by p[3,-1] when unavailable, 8.3.1.2 sample substitution);
// tl = p[-1,-1], left[0..3] = p[-1,0..3]. Caller guarantees the mode's
// required neighbors are available.
static void i4_predict(int mode, const uint8_t top[8], uint8_t tl,
                       const uint8_t left[4], bool at, bool al,
                       uint8_t pred[16]) {
    auto T = [&](int i) -> int32_t { return i < 0 ? tl : top[i]; };
    auto L = [&](int i) -> int32_t { return i < 0 ? tl : left[i]; };
    switch (mode) {
        case 0:  // Vertical
            for (int y = 0; y < 4; ++y)
                for (int x = 0; x < 4; ++x) pred[4 * y + x] = top[x];
            break;
        case 1:  // Horizontal
            for (int y = 0; y < 4; ++y)
                for (int x = 0; x < 4; ++x) pred[4 * y + x] = left[y];
            break;
        case 2: {  // DC
            int32_t s = 0, n = 0;
            if (at) { s += top[0] + top[1] + top[2] + top[3]; n += 4; }
            if (al) { s += left[0] + left[1] + left[2] + left[3]; n += 4; }
            uint8_t dc = uint8_t(n == 8 ? (s + 4) >> 3
                                : n == 4 ? (s + 2) >> 2 : 128);
            memset(pred, dc, 16);
            break;
        }
        case 3:  // Diagonal_Down_Left
            for (int y = 0; y < 4; ++y)
                for (int x = 0; x < 4; ++x)
                    pred[4 * y + x] = uint8_t(
                        (x == 3 && y == 3)
                            ? (top[6] + 3 * top[7] + 2) >> 2
                            : (top[x + y] + 2 * top[x + y + 1]
                               + top[x + y + 2] + 2) >> 2);
            break;
        case 4:  // Diagonal_Down_Right
            for (int y = 0; y < 4; ++y)
                for (int x = 0; x < 4; ++x)
                    pred[4 * y + x] = uint8_t(
                        x > y ? (T(x - y - 2) + 2 * T(x - y - 1) + T(x - y) + 2) >> 2
                      : x < y ? (L(y - x - 2) + 2 * L(y - x - 1) + L(y - x) + 2) >> 2
                              : (top[0] + 2 * tl + left[0] + 2) >> 2);
            break;
        case 5:  // Vertical_Right
            for (int y = 0; y < 4; ++y)
                for (int x = 0; x < 4; ++x) {
                    int z = 2 * x - y;
                    int32_t v;
                    if (z >= 0 && (z & 1) == 0)
                        v = (T(x - (y >> 1) - 1) + T(x - (y >> 1)) + 1) >> 1;
                    else if (z >= 0)
                        v = (T(x - (y >> 1) - 2) + 2 * T(x - (y >> 1) - 1)
                             + T(x - (y >> 1)) + 2) >> 2;
                    else if (z == -1)
                        v = (left[0] + 2 * tl + top[0] + 2) >> 2;
                    else
                        v = (L(y - 1) + 2 * L(y - 2) + L(y - 3) + 2) >> 2;
                    pred[4 * y + x] = uint8_t(v);
                }
            break;
        case 6:  // Horizontal_Down
            for (int y = 0; y < 4; ++y)
                for (int x = 0; x < 4; ++x) {
                    int z = 2 * y - x;
                    int32_t v;
                    if (z >= 0 && (z & 1) == 0)
                        v = (L(y - (x >> 1) - 1) + L(y - (x >> 1)) + 1) >> 1;
                    else if (z >= 0)
                        v = (L(y - (x >> 1) - 2) + 2 * L(y - (x >> 1) - 1)
                             + L(y - (x >> 1)) + 2) >> 2;
                    else if (z == -1)
                        v = (left[0] + 2 * tl + top[0] + 2) >> 2;
                    else
                        v = (T(x - 1) + 2 * T(x - 2) + T(x - 3) + 2) >> 2;
                    pred[4 * y + x] = uint8_t(v);
                }
            break;
        case 7:  // Vertical_Left
            for (int y = 0; y < 4; ++y)
                for (int x = 0; x < 4; ++x)
                    pred[4 * y + x] = uint8_t(
                        (y & 1) == 0
                            ? (top[x + (y >> 1)] + top[x + (y >> 1) + 1] + 1) >> 1
                            : (top[x + (y >> 1)] + 2 * top[x + (y >> 1) + 1]
                               + top[x + (y >> 1) + 2] + 2) >> 2);
            break;
        default:  // 8: Horizontal_Up
            for (int y = 0; y < 4; ++y)
                for (int x = 0; x < 4; ++x) {
                    int z = x + 2 * y;
                    int32_t v;
                    if (z > 5) v = left[3];
                    else if (z == 5) v = (left[2] + 3 * left[3] + 2) >> 2;
                    else if (z & 1)
                        v = (left[y + (x >> 1)] + 2 * left[y + (x >> 1) + 1]
                             + left[y + (x >> 1) + 2] + 2) >> 2;
                    else
                        v = (left[y + (x >> 1)] + left[y + (x >> 1) + 1] + 1) >> 1;
                    pred[4 * y + x] = uint8_t(v);
                }
            break;
    }
}

// z coding order index per raster (by, bx) position inside a MB (6.4.3)
static const int8_t kZofYX[4][4] = {
    {0, 1, 4, 5}, {2, 3, 6, 7}, {8, 9, 12, 13}, {10, 11, 14, 15},
};

struct I4MB {
    uint8_t recon[256];   // 16x16 row-major reconstruction
    int32_t wq[16][16];   // per z-block quantized coefficients (raster)
    int8_t mode[16];      // per z-block chosen prediction mode
    int8_t predm[16];     // per z-block predicted mode (for bit cost)
    int32_t sad;          // sum over blocks of best-mode prediction SAD
    int32_t mode_bits;    // 1 per predicted-mode hit, 4 otherwise
    bool any;             // any nonzero quantized coefficient
};

// Candidate-encode one MB as Intra_4x4 into local buffers (no bitstream,
// no global state). Block-sequential: each block predicts from the local
// reconstruction of earlier blocks, exactly like the decoder will.
// imodes: global per-4x4 mode map (-1 on non-Intra_4x4 MBs) for the
// mode-prediction context across MB boundaries; blk_y0 is the slice's
// first block row (top availability stops at the slice boundary).
static void try_i4_mb(const uint8_t* src, int width, const uint8_t* rec,
                      int x0, int y0, int slice_top_row,
                      const int8_t* imodes, int blk_w, int blk_y0,
                      const QuantParams& q, uint32_t mode_mask, int lam,
                      I4MB* o) {
    o->sad = 0;
    o->mode_bits = 0;
    o->any = false;
    const int mbx = x0 / 16, mby = y0 / 16;
    for (int z = 0; z < 16; ++z) {
        const int bx = kBlkX[z], by = kBlkY[z];
        const int X0 = x0 + bx * 4, Y0 = y0 + by * 4;
        const bool at = (by > 0) || (Y0 > slice_top_row);
        const bool al = X0 > 0;
        const bool atl = at && al;

        // neighbor samples: local recon inside the MB, the committed
        // plane outside (left MB columns / previous MB row)
        uint8_t top[8], left[4], tl = 128;
        if (at) {
            const uint8_t* trow = (by > 0)
                ? o->recon + (by * 4 - 1) * 16 + bx * 4
                : rec + (Y0 - 1) * width + X0;
            for (int i = 0; i < 4; ++i) top[i] = trow[i];
            bool atr;
            if (by == 0) {
                atr = X0 + 7 < width;
                if (atr)
                    for (int i = 4; i < 8; ++i) top[i] = trow[i];
            } else {
                atr = bx < 3 && kZofYX[by - 1][bx + 1] < z;
                if (atr) {
                    const uint8_t* r2 = o->recon + (by * 4 - 1) * 16
                                        + (bx + 1) * 4;
                    for (int i = 0; i < 4; ++i) top[4 + i] = r2[i];
                }
            }
            if (!atr)
                for (int i = 4; i < 8; ++i) top[i] = top[3];
        }
        if (al) {
            for (int i = 0; i < 4; ++i)
                left[i] = (bx > 0)
                    ? o->recon[(by * 4 + i) * 16 + bx * 4 - 1]
                    : rec[(Y0 + i) * width + X0 - 1];
        }
        if (atl)
            tl = (bx > 0 && by > 0)
                ? o->recon[(by * 4 - 1) * 16 + bx * 4 - 1]
                : rec[(Y0 - 1) * width + X0 - 1];

        // predicted mode (8.3.1.1): if EITHER neighbor block is
        // unavailable the prediction is DC for both sides
        // (dcPredModePredictedFlag); otherwise min(modeA, modeB), with a
        // neighbor not coded as Intra_4x4 contributing DC
        const int gbx = mbx * 4 + bx, gby = mby * 4 + by;
        int predm = 2;
        if (al && gby > blk_y0) {
            int8_t a = (bx > 0) ? o->mode[kZofYX[by][bx - 1]]
                                : imodes[gby * blk_w + gbx - 1];
            int8_t b = (by > 0) ? o->mode[kZofYX[by - 1][bx]]
                                : imodes[(gby - 1) * blk_w + gbx];
            int ma = a >= 0 ? a : 2, mb = b >= 0 ? b : 2;
            predm = ma < mb ? ma : mb;
        }
        o->predm[z] = int8_t(predm);

        const uint8_t* s = src + Y0 * width + X0;
        uint8_t pred[16], best_pred[16];
        int best_mode = -1;
        int32_t best_cost = INT32_MAX, best_sad = 0;
        // cheap modes first (predicted, DC, V, H): a near-perfect early
        // hit skips the diagonal mode evaluations
        int order[10], nord = 0, ncheap;
        order[nord++] = predm;
        if (predm != 2) order[nord++] = 2;
        if (predm != 0) order[nord++] = 0;
        if (predm != 1) order[nord++] = 1;
        ncheap = nord;
        for (int m = 3; m < 9; ++m)
            if (m != predm) order[nord++] = m;
        for (int mi = 0; mi < nord; ++mi) {
            const int m = order[mi];
            if (mi >= ncheap && best_sad <= lam * 6) break;  // early exit
            if (!(mode_mask & (1u << m))) continue;
            bool ok = (m == 2)
                || (m == 1 || m == 8 ? al
                 : m == 0 || m == 3 || m == 7 ? at : atl);
            if (!ok) continue;
            i4_predict(m, top, tl, left, at, al, pred);
            int32_t sad = 0;
            for (int r = 0; r < 4; ++r)
                for (int c = 0; c < 4; ++c) {
                    int32_t d = int32_t(s[r * width + c]) - pred[4 * r + c];
                    sad += d < 0 ? -d : d;
                }
            int32_t cost = sad + lam * (m == predm ? 1 : 4);
            if (cost < best_cost) {
                best_cost = cost;
                best_mode = m;
                best_sad = sad;
                memcpy(best_pred, pred, 16);
            }
        }
        o->mode[z] = int8_t(best_mode);
        o->sad += best_sad;
        o->mode_bits += best_mode == predm ? 1 : 4;

        // residual -> transform -> quant -> recon (decoder-identical)
        int32_t blk[16], orr = 0;
        for (int r = 0; r < 4; ++r)
            for (int c = 0; c < 4; ++c) {
                int32_t v = int32_t(s[r * width + c]) - best_pred[4 * r + c];
                blk[4 * r + c] = v;
                orr |= v;
            }
        uint8_t* rb = o->recon + by * 4 * 16 + bx * 4;
        if (!orr) {
            memset(o->wq[z], 0, sizeof(o->wq[z]));
            for (int r = 0; r < 4; ++r)
                memcpy(rb + r * 16, best_pred + 4 * r, 4);
            continue;
        }
        int32_t tr[16];
        fwd4x4(blk, tr);
        if (quant_block_full(tr, q, o->wq[z])) {
            o->any = true;
            int32_t d[16], res[16];
            d[0] = dequant_ac(o->wq[z][0], 0, q);
            dequant_block_ac(o->wq[z], q, d);
            inv4x4(d, res);
            for (int r = 0; r < 4; ++r)
                for (int c = 0; c < 4; ++c)
                    rb[r * 16 + c] =
                        clip255(best_pred[4 * r + c] + res[4 * r + c]);
        } else {
            for (int r = 0; r < 4; ++r)
                memcpy(rb + r * 16, best_pred + 4 * r, 4);
        }
    }
}

// One slice: MB rows [my0, my1). Intra prediction and nC contexts stop at
// the slice boundary (neighbor availability is slice-local, 6.4.8), so
// slices are fully independent — recon/nnz rows are disjoint per slice and
// the arrays can be shared without synchronization.
static void encode_slice(const uint8_t* y, const uint8_t* u, const uint8_t* v,
                         int width, int cw, int mbs_x, int my0, int my1,
                         const QuantParams& q, int qp, int idr_pic_id,
                         PlaneCtx py, PlaneCtx pu, PlaneCtx pv,
                         int8_t* imodes, uint32_t mode_mask, int lam,
                         int pcm_mode, BitWriter& w) {
    uint8_t* ry = py.recon;
    int16_t* nnz_y = py.nnz;
    {
        w.put_ue(uint32_t(my0 * mbs_x));  // first_mb_in_slice
        w.put_ue(7);                      // slice_type: I (all slices)
        w.put_ue(0);                      // pic_parameter_set_id
        w.put_bits(0, 4);                 // frame_num (IDR: 0)
        w.put_ue(uint32_t(idr_pic_id & 1));
        w.put_bit(0);                     // no_output_of_prior_pics_flag
        w.put_bit(0);                     // long_term_reference_flag
        w.put_se(qp - 26);                // slice_qp_delta
        w.put_ue(1);                      // disable_deblocking_filter_idc

        for (int my = my0; my < my1; ++my) {
            for (int mx = 0; mx < mbs_x; ++mx) {
                // ---- luma: Intra_16x16 DC prediction off the recon ----
                const int x0 = mx * 16, y0 = my * 16;
                int32_t pred;
                {
                    bool top = my > my0, left = mx > 0;
                    int32_t s = 0;
                    if (top)
                        for (int i = 0; i < 16; ++i)
                            s += ry[(y0 - 1) * width + x0 + i];
                    if (left)
                        for (int i = 0; i < 16; ++i)
                            s += ry[(y0 + i) * width + x0 - 1];
                    pred = (top && left) ? (s + 16) >> 5
                         : (top || left) ? (s + 8) >> 4 : 128;
                }

                // ---- Intra_4x4 candidate vs the I_16x16 DC estimate ----
                int32_t sad16 = 0;
                if (imodes) {
                    for (int r = 0; r < 16; ++r)
                        for (int c = 0; c < 16; ++c) {
                            int32_t d = int32_t(y[(y0 + r) * width + x0 + c])
                                        - pred;
                            sad16 += d < 0 ? -d : d;
                        }
                }
                I4MB i4;
                bool use_i4 = false;
                // flat-MB screen: when the I_16x16 DC estimate is already
                // cheap (most of a field view), the 9-mode search cannot
                // pay for its own mode bits — skip it entirely
                if (imodes && sad16 > lam * 24) {
                    try_i4_mb(y, width, ry, x0, y0, my0 * 16, imodes,
                              py.blk_w, py.blk_y0, q, mode_mask, lam, &i4);
                    // mode decision: prediction SAD + mode-bit rate; the
                    // I_16x16 side gets a small fixed bit credit (its
                    // header carries no per-block modes)
                    use_i4 = i4.sad + lam * i4.mode_bits < sad16 - lam * 4;
                    if (getenv("VPTPU_I4_TRACE") && use_i4) {
                        fprintf(stderr, "i4 mb(%d,%d) sad4=%d sad16=%d m=",
                                mx, my, i4.sad, sad16);
                        for (int z = 0; z < 16; ++z)
                            fprintf(stderr, "%d", i4.mode[z]);
                        fprintf(stderr, "\n");
                    }
                }

                // transform all 16 4x4 blocks; collect DC separately
                int32_t wq[16][16];    // quantized AC (w/ zero DC slot)
                int32_t dcq[16] = {0}; // quantized DC levels (block order)
                int32_t dc_raw[16];    // raw transform DCs (raster order)
                bool any_ac = false;
                uint32_t ac_mask = 0;  // bit b: block b has a nonzero AC
                for (int b = 0; use_i4 ? false : b < 16; ++b) {
                    int bx = kBlkX[b], by = kBlkY[b];
                    int32_t blk[16], tr[16];
                    int32_t orr = 0;
                    for (int r = 0; r < 4; ++r)
                        for (int c = 0; c < 4; ++c) {
                            int32_t v =
                                int32_t(y[(y0 + by * 4 + r) * width + x0 + bx * 4 + c])
                                - pred;
                            blk[4 * r + c] = v;
                            orr |= v;
                        }
                    if (!orr) {
                        // flat block at exactly the prediction: transform
                        // and quant are all-zero by linearity
                        dc_raw[by * 4 + bx] = 0;
                        memset(wq[b], 0, sizeof(wq[b]));
                        continue;
                    }
                    fwd4x4(blk, tr);
                    dc_raw[by * 4 + bx] = tr[0];
                    if (quant_block_ac(tr, q, wq[b])) {
                        any_ac = true;
                        ac_mask |= 1u << b;
                    }
                }
                // DC Hadamard + quant (raster order), store back per block.
                // Effective >> (qbits + 2): the DC dequant path (8.5.10:
                // (f * 16*V00) >> (6 - qp/6), then the core inverse's
                // >> 6) has 4x less gain than the AC path, so levels
                // carry 4x the precision. |hd| <= 4*255*36 -> product
                // < 2^29.1: int32 ok.
                if (!use_i4) {
                    int32_t hd[16], hq[16];
                    hadamard4x4(dc_raw, hd);
                    quant_dc_n(hd, 4, q, 2, hq);
                    for (int b = 0; b < 16; ++b)
                        dcq[b] = hq[kBlkY[b] * 4 + kBlkX[b]];
                }

                const int cbp_luma = any_ac ? 1 : 0;

                // ---- chroma: DC-mode prediction per 4x4 sub-block ----
                const uint8_t* srcs[2] = {u, v};
                PlaneCtx* pcs[2] = {&pu, &pv};
                int32_t cpred[2][4];   // per component, per 4x4 block (z)
                int32_t cwq[2][4][16]; // quantized AC
                int32_t cdcq[2][4];    // quantized 2x2 DC
                bool c_any_ac = false, c_any_dc = false;
                uint32_t cac_mask[2] = {0, 0};  // bit b: block b has AC
                for (int comp = 0; comp < 2; ++comp) {
                    const uint8_t* src = srcs[comp];
                    uint8_t* rec = pcs[comp]->recon;
                    const int cx0 = mx * 8, cy0 = my * 8;
                    bool top = my > my0, left = mx > 0;
                    // 8.3.4.1 DC prediction per 4x4 sub-block
                    for (int b = 0; b < 4; ++b) {
                        int sx = (b & 1) * 4, sy = (b >> 1) * 4;
                        int32_t st = 0, sl = 0;
                        if (top)
                            for (int i = 0; i < 4; ++i)
                                st += rec[(cy0 - 1) * cw + cx0 + sx + i];
                        if (left)
                            for (int i = 0; i < 4; ++i)
                                sl += rec[(cy0 + sy + i) * cw + cx0 - 1];
                        int32_t p;
                        if (b == 0 || b == 3) {
                            p = (top && left) ? (st + sl + 4) >> 3
                              : top ? (st + 2) >> 2
                              : left ? (sl + 2) >> 2 : 128;
                        } else if (b == 1) {      // top-right: prefer top
                            p = top ? (st + 2) >> 2
                              : left ? (sl + 2) >> 2 : 128;
                        } else {                  // bottom-left: prefer left
                            p = left ? (sl + 2) >> 2
                              : top ? (st + 2) >> 2 : 128;
                        }
                        cpred[comp][b] = p;
                    }
                    int32_t cdc_raw[4];
                    for (int b = 0; b < 4; ++b) {
                        int sx = (b & 1) * 4, sy = (b >> 1) * 4;
                        int32_t blk[16], tr[16];
                        int32_t orr = 0;
                        for (int r = 0; r < 4; ++r)
                            for (int c = 0; c < 4; ++c) {
                                int32_t v =
                                    int32_t(src[(cy0 + sy + r) * cw + cx0 + sx + c])
                                    - cpred[comp][b];
                                blk[4 * r + c] = v;
                                orr |= v;
                            }
                        if (!orr) {
                            cdc_raw[b] = 0;
                            memset(cwq[comp][b], 0, sizeof(cwq[comp][b]));
                            continue;
                        }
                        fwd4x4(blk, tr);
                        cdc_raw[b] = tr[0];
                        if (quant_block_ac(tr, q, cwq[comp][b])) {
                            c_any_ac = true;
                            cac_mask[comp] |= 1u << b;
                        }
                    }
                    // 2x2 DC Hadamard: [[1,1],[1,-1]] both sides
                    int32_t h0 = cdc_raw[0] + cdc_raw[1] + cdc_raw[2] + cdc_raw[3];
                    int32_t h1 = cdc_raw[0] - cdc_raw[1] + cdc_raw[2] - cdc_raw[3];
                    int32_t h2 = cdc_raw[0] + cdc_raw[1] - cdc_raw[2] - cdc_raw[3];
                    int32_t h3 = cdc_raw[0] - cdc_raw[1] - cdc_raw[2] + cdc_raw[3];
                    int32_t hs[4] = {h0, h1, h2, h3};
                    for (int i = 0; i < 4; ++i) {
                        // |hs| <= 4*255*36: int32 ok (cf. quant_coeff)
                        int32_t lv = (std::abs(hs[i]) * kMF[q.mod][0]
                                      + 2 * q.f_intra) >> (q.qbits + 1);
                        cdcq[comp][i] = hs[i] < 0 ? -lv : lv;
                        if (cdcq[comp][i]) c_any_dc = true;
                    }
                }
                const int cbp_chroma = c_any_ac ? 2 : (c_any_dc ? 1 : 0);

                // writer snapshot: the I_PCM fallback below rewinds the
                // whole MB if entropy coding loses to the raw samples
                const long snap_pos = w.pos;
                const int snap_bit = w.bit;
                const uint32_t snap_acc = w.acc;

                // ---- macroblock header + luma residual ----
                if (use_i4) {
                    // publish this MB's block modes for neighbor
                    // prediction contexts (left/top precede in coding
                    // order, so whole-MB upfront is safe)
                    for (int z = 0; z < 16; ++z)
                        imodes[(my * 4 + kBlkY[z]) * py.blk_w
                               + mx * 4 + kBlkX[z]] = i4.mode[z];
                    // luma cbp restricted to {0, 15}: when any block has
                    // coefficients — or chroma is coded at all — all four
                    // luma 8x8s are coded (an empty 4x4 costs one
                    // coeff_token), keeping the emitted cbp in the
                    // anchor set {0, 15, 31, 47} of Table 9-4
                    const int luma_bits =
                        (i4.any || cbp_chroma) ? 15 : 0;
                    const int cbp = luma_bits | (cbp_chroma << 4);
                    w.put_ue(0);  // mb_type: I_4x4 (I slice)
                    for (int z = 0; z < 16; ++z) {
                        if (i4.mode[z] == i4.predm[z]) {
                            w.put_bit(1);
                        } else {
                            w.put_bit(0);
                            int rem = i4.mode[z] < i4.predm[z]
                                ? i4.mode[z] : i4.mode[z] - 1;
                            w.put_bits(uint32_t(rem), 3);
                        }
                    }
                    w.put_ue(0);  // intra_chroma_pred_mode: DC
                    // Table 9-4 intra mapping, anchor rows:
                    // cbp 0 -> 3, 15 -> 2, 31 -> 1, 47 -> 0
                    w.put_ue(cbp == 0 ? 3u : cbp == 15 ? 2u
                             : cbp == 31 ? 1u : 0u);
                    if (cbp) w.put_se(0);  // mb_qp_delta
                    for (int z = 0; z < 16; ++z) {
                        int bx = mx * 4 + kBlkX[z], by = my * 4 + kBlkY[z];
                        if (luma_bits) {
                            int32_t scan[16];
                            for (int i = 0; i < 16; ++i)
                                scan[i] = i4.wq[z][kZigzag[i]];
                            int tc = write_block(w, scan, 16,
                                                 pred_nc(py, bx, by));
                            nnz_y[by * py.blk_w + bx] = int16_t(tc);
                        } else {
                            nnz_y[by * py.blk_w + bx] = 0;
                        }
                    }
                } else {
                if (imodes)
                    for (int z = 0; z < 16; ++z)
                        imodes[(my * 4 + kBlkY[z]) * py.blk_w
                               + mx * 4 + kBlkX[z]] = -1;
                // I_16x16 mb_type: 1 + predMode(2=DC) + 4*cbpChroma
                //                    + 12*(cbpLuma ? 1 : 0)
                w.put_ue(uint32_t(1 + 2 + 4 * cbp_chroma + 12 * cbp_luma));
                w.put_ue(0);   // intra_chroma_pred_mode: DC
                w.put_se(0);   // mb_qp_delta

                // ---- residual: luma DC (16 coeffs, zigzag over raster) ----
                {
                    int32_t scan[16];
                    int32_t dc_raster[16];
                    for (int b = 0; b < 16; ++b)
                        dc_raster[kBlkY[b] * 4 + kBlkX[b]] = dcq[b];
                    for (int i = 0; i < 16; ++i)
                        scan[i] = dc_raster[kZigzag[i]];
                    int bx = mx * 4, by = my * 4;
                    int tc = write_block(w, scan, 16, pred_nc(py, bx, by));
                    (void)tc;  // DC TotalCoeff does not feed nnz maps
                }
                // ---- luma AC (15 coeffs each) when cbp_luma ----
                for (int b = 0; b < 16; ++b) {
                    int bx = mx * 4 + kBlkX[b], by = my * 4 + kBlkY[b];
                    if (cbp_luma) {
                        int32_t scan[15];
                        for (int i = 1; i < 16; ++i)
                            scan[i - 1] = wq[b][kZigzag[i]];
                        int tc = write_block(w, scan, 15, pred_nc(py, bx, by));
                        nnz_y[by * py.blk_w + bx] = int16_t(tc);
                    } else {
                        nnz_y[by * py.blk_w + bx] = 0;
                        for (int i = 1; i < 16; ++i) wq[b][i] = 0;
                    }
                }
                }
                // ---- chroma DC (both components) when cbp_chroma ----
                if (cbp_chroma) {
                    for (int comp = 0; comp < 2; ++comp)
                        write_block(w, cdcq[comp], 4, -1);
                }
                // ---- chroma AC when cbp_chroma == 2 ----
                for (int comp = 0; comp < 2; ++comp) {
                    PlaneCtx& pc = *pcs[comp];
                    for (int b = 0; b < 4; ++b) {
                        int bx = mx * 2 + (b & 1), by = my * 2 + (b >> 1);
                        if (cbp_chroma == 2) {
                            int32_t scan[15];
                            for (int i = 1; i < 16; ++i)
                                scan[i - 1] = cwq[comp][b][kZigzag[i]];
                            int tc = write_block(w, scan, 15, pred_nc(pc, bx, by));
                            pc.nnz[by * pc.blk_w + bx] = int16_t(tc);
                        } else {
                            pc.nnz[by * pc.blk_w + bx] = 0;
                            for (int i = 1; i < 16; ++i) cwq[comp][b][i] = 0;
                        }
                    }
                    if (cbp_chroma < 1)
                        for (int i = 0; i < 4; ++i) cdcq[comp][i] = 0;
                }

                // ---- per-MB I_PCM fallback (spec 7.3.5, 8.3.5) ----
                // When the entropy-coded MB costs more than the raw
                // samples, rewind the writer and send the MB verbatim:
                // bounds the worst case at 3081+7 bits/MB regardless of
                // content (QP >= 10 already keeps levels inside the CAVLC
                // escape range, so this is a rate bound, not correctness).
                // VPTPU_PCM=0 disables, VPTPU_PCM=force sends every MB
                // as I_PCM (test hook: the decode is then lossless).
                const long mb_bits =
                    (w.pos - snap_pos) * 8 + (w.bit - snap_bit);
                bool use_pcm = pcm_mode == 2;
                if (pcm_mode == 1) {
                    const long ipcm_bits =
                        9 + ((8 - ((snap_bit + 9) & 7)) & 7) + 384 * 8;
                    use_pcm = mb_bits > ipcm_bits;
                }
                if (use_pcm) {
                    w.pos = snap_pos; w.bit = snap_bit; w.acc = snap_acc;
                    w.put_ue(25);         // mb_type: I_PCM (I slice)
                    w.byte_align_zero();  // pcm_alignment_zero_bit
                    for (int r = 0; r < 16; ++r)
                        w.put_bytes(y + (y0 + r) * width + x0, 16);
                    const int cx0 = mx * 8, cy0 = my * 8;
                    for (int r = 0; r < 8; ++r)
                        w.put_bytes(u + (cy0 + r) * cw + cx0, 8);
                    for (int r = 0; r < 8; ++r)
                        w.put_bytes(v + (cy0 + r) * cw + cx0, 8);
                    // neighbors of an I_PCM MB predict nC with
                    // TotalCoeff 16 (9.2.1) and Intra4x4PredMode DC
                    for (int z = 0; z < 16; ++z) {
                        const int bi = (my * 4 + kBlkY[z]) * py.blk_w
                                       + mx * 4 + kBlkX[z];
                        nnz_y[bi] = 16;
                        if (imodes) imodes[bi] = -1;
                    }
                    for (int b = 0; b < 4; ++b) {
                        const int bx = mx * 2 + (b & 1);
                        const int by = my * 2 + (b >> 1);
                        pu.nnz[by * pu.blk_w + bx] = 16;
                        pv.nnz[by * pv.blk_w + bx] = 16;
                    }
                    // decoded samples are the source, exactly
                    for (int r = 0; r < 16; ++r)
                        memcpy(ry + (y0 + r) * width + x0,
                               y + (y0 + r) * width + x0, 16);
                    for (int r = 0; r < 8; ++r) {
                        memcpy(pu.recon + (cy0 + r) * cw + cx0,
                               u + (cy0 + r) * cw + cx0, 8);
                        memcpy(pv.recon + (cy0 + r) * cw + cx0,
                               v + (cy0 + r) * cw + cx0, 8);
                    }
                    if (getenv("VPTPU_PCM_TRACE"))
                        fprintf(stderr, "pcm mb(%d,%d) bits=%ld\n",
                                mx, my, mb_bits);
                    continue;  // recon done above
                }

                // ---- reconstruction (decoder-identical) ----
                // luma DC dequant (8.5.10, qp < 36 branch)
                if (use_i4) {
                    for (int r = 0; r < 16; ++r)
                        memcpy(ry + (y0 + r) * width + x0,
                               i4.recon + r * 16, 16);
                } else {
                    bool any_dc = false;
                    for (int b = 0; b < 16; ++b)
                        if (dcq[b]) { any_dc = true; break; }
                    if (!any_ac && !any_dc) {
                        // all-zero MB: recon is the flat prediction
                        for (int r = 0; r < 16; ++r)
                            memset(ry + (y0 + r) * width + x0,
                                   uint8_t(pred), 16);
                    } else {
                        int32_t hin[16], f2[16];
                        for (int i = 0; i < 16; ++i) hin[i] = 0;
                        for (int b = 0; b < 16; ++b)
                            hin[kBlkY[b] * 4 + kBlkX[b]] = dcq[b];
                        hadamard4x4(hin, f2);
                        int sh = 6 - q.qp / 6;
                        int32_t ls = 16 * kV[q.mod][0];
                        int32_t dcd[16];
                        for (int i = 0; i < 16; ++i)
                            dcd[i] = (f2[i] * ls + (1 << (sh - 1))) >> sh;
                        for (int b = 0; b < 16; ++b) {
                            int bx = kBlkX[b], by = kBlkY[b];
                            if (dcd[by * 4 + bx] == 0
                                && !(ac_mask & (1u << b))) {
                                for (int r = 0; r < 4; ++r)
                                    memset(ry + (y0 + by * 4 + r) * width
                                               + x0 + bx * 4,
                                           uint8_t(pred), 4);
                                continue;
                            }
                            int32_t d[16], res[16];
                            d[0] = dcd[by * 4 + bx];
                            dequant_block_ac(wq[b], q, d);
                            inv4x4(d, res);
                            for (int r = 0; r < 4; ++r)
                                for (int c = 0; c < 4; ++c)
                                    ry[(y0 + by * 4 + r) * width
                                       + x0 + bx * 4 + c] =
                                        clip255(pred + res[4 * r + c]);
                        }
                    }
                }
                // chroma reconstruction
                for (int comp = 0; comp < 2; ++comp) {
                    uint8_t* rec = pcs[comp]->recon;
                    const int cx0 = mx * 8, cy0 = my * 8;
                    // 2x2 DC inverse butterfly + scale (8.5.11, 4:2:0)
                    int32_t c0 = cdcq[comp][0], c1 = cdcq[comp][1];
                    int32_t c2 = cdcq[comp][2], c3 = cdcq[comp][3];
                    int32_t f0 = c0 + c1 + c2 + c3;
                    int32_t f1 = c0 - c1 + c2 - c3;
                    int32_t f2c = c0 + c1 - c2 - c3;
                    int32_t f3 = c0 - c1 - c2 + c3;
                    int32_t ls = 16 * kV[q.mod][0];
                    int32_t dcd[4] = {
                        ((f0 * ls) << (q.qp / 6)) >> 5,
                        ((f1 * ls) << (q.qp / 6)) >> 5,
                        ((f2c * ls) << (q.qp / 6)) >> 5,
                        ((f3 * ls) << (q.qp / 6)) >> 5,
                    };
                    for (int b = 0; b < 4; ++b) {
                        int sx = (b & 1) * 4, sy = (b >> 1) * 4;
                        // transmitted AC is cwq (zeroed when cbp < 2, so
                        // the pre-zeroing mask only gates the cbp==2 case)
                        if (dcd[b] == 0
                            && (cbp_chroma < 2
                                || !(cac_mask[comp] & (1u << b)))) {
                            for (int r = 0; r < 4; ++r)
                                memset(rec + (cy0 + sy + r) * cw + cx0 + sx,
                                       uint8_t(cpred[comp][b]), 4);
                            continue;
                        }
                        int32_t d[16], res[16];
                        d[0] = dcd[b];
                        dequant_block_ac(cwq[comp][b], q, d);
                        inv4x4(d, res);
                        for (int r = 0; r < 4; ++r)
                            for (int c = 0; c < 4; ++c)
                                rec[(cy0 + sy + r) * cw + cx0 + sx + c] =
                                    clip255(cpred[comp][b] + res[4 * r + c]);
                    }
                }
            }
        }
        w.rbsp_trailing();
    }
}

// ---------------------------------------------------------------------------
// P slices: zero-motion inter tier (conditional replenishment)
// ---------------------------------------------------------------------------

// coded_block_pattern me(v) codeNum per cbp value for Inter MB types
// (Table 9-4, ChromaArrayType 1, inter column).
static const uint8_t kInterCbpCode[48] = {
    0,  2,  3,  7,  4,  8,  17, 13, 5,  18, 9,  14, 10, 15, 16, 11,
    1,  32, 33, 36, 34, 37, 44, 40, 35, 45, 38, 41, 39, 42, 43, 19,
    6,  24, 25, 20, 26, 21, 46, 28, 27, 47, 22, 29, 23, 30, 31, 12};

// ---------------------------------------------------------------------------
// motion vectors: per-MB storage, spec prediction, integer-pel search
// ---------------------------------------------------------------------------

// Per-MB motion state for one P picture. MVs are stored in quarter-pel
// units: the base search is integer-pel (multiples of 4 — shifted-copy
// luma prediction), and subpel_refine (VPTPU_SUBPEL, default on) stores
// arbitrary quarter-pel values, predicted through the full 8.4.2.2.1
// 6-tap/average interpolation and the general eighth-pel chroma
// bilinear. Slices only read rows >= their own my0, so the arrays are
// safely shared across slice threads.
struct MvCtx {
    int16_t* mv;    // (mbs_y * mbs_x * 2) quarter-pel
    uint8_t* ok;    // 1 = inter MB with refIdxL0 0; 0 = intra (I_PCM)
    int mbs_x;
    int my0;        // first MB row of this slice (neighbors above are
                    // unavailable, matching the decoder's slice bounds)
};

struct MvNb {
    bool avail;     // MB available (in picture and slice)
    bool r0;        // inter-coded with refIdxL0 == 0
    int16_t mv[2];
};

static inline MvNb mv_neighbor(const MvCtx& m, int nx, int ny) {
    MvNb n{false, false, {0, 0}};
    if (nx < 0 || nx >= m.mbs_x || ny < m.my0) return n;
    n.avail = true;
    const int idx = ny * m.mbs_x + nx;
    if (m.ok[idx]) {
        n.r0 = true;
        n.mv[0] = m.mv[2 * idx];
        n.mv[1] = m.mv[2 * idx + 1];
    }
    return n;
}

// Luma MV prediction for a 16x16 partition (8.4.1.3): median of the
// left/up/up-right neighbors, with the C->D substitution (8.4.1.3.2),
// the single-matching-refIdx shortcut, and the A-only first-row rule.
// Intra and unavailable neighbors contribute mv (0,0) with refIdx -1.
static void mv_pred_16x16(const MvCtx& m, int mx, int my, int16_t mvp[2]) {
    const MvNb A = mv_neighbor(m, mx - 1, my);
    const MvNb B = mv_neighbor(m, mx, my - 1);
    const MvNb C0 = mv_neighbor(m, mx + 1, my - 1);
    const MvNb D = mv_neighbor(m, mx - 1, my - 1);
    if (!B.avail && !C0.avail && !D.avail && A.avail) {
        mvp[0] = A.mv[0];
        mvp[1] = A.mv[1];
        return;
    }
    const MvNb& C = C0.avail ? C0 : D;
    const int n_r0 = int(A.r0) + int(B.r0) + int(C.r0);
    if (n_r0 == 1) {
        const MvNb& N = A.r0 ? A : (B.r0 ? B : C);
        mvp[0] = N.mv[0];
        mvp[1] = N.mv[1];
        return;
    }
    for (int i = 0; i < 2; ++i) {
        const int16_t a = A.mv[i], b = B.mv[i], c = C.mv[i];
        const int16_t lo = a < b ? a : b, hi = a < b ? b : a;
        mvp[i] = c < lo ? lo : (c > hi ? hi : c);
    }
}

// P_Skip motion vector (8.4.1.1): zero if the left or up neighbor is
// unavailable or is a zero-MV refIdx-0 block, else the 16x16 prediction.
static void mv_skip(const MvCtx& m, int mx, int my, int16_t mv[2]) {
    const MvNb A = mv_neighbor(m, mx - 1, my);
    const MvNb B = mv_neighbor(m, mx, my - 1);
    if (!A.avail || !B.avail || (A.r0 && !A.mv[0] && !A.mv[1])
        || (B.r0 && !B.mv[0] && !B.mv[1])) {
        mv[0] = mv[1] = 0;
        return;
    }
    mv_pred_16x16(m, mx, my, mv);
}

static inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// 16x16 luma prediction at any quarter-pel MV (8.4.2.2.1), edge-clamped
// exactly like the decoder (reference coordinates clip into the
// picture). Integer positions are shifted copies; half positions run the
// 6-tap [1,-5,20,20,-5,1] filter (the center j position filters the
// unclipped vertical intermediates horizontally, /1024); quarter
// positions average the two nearest integer/half samples.
static void pred_luma_16x16(const uint8_t* ref, int width, int height,
                            int x0, int y0, int qx, int qy,
                            uint8_t out[256]) {
    const int bx = x0 + (qx >> 2), by = y0 + (qy >> 2);
    const int xf = qx & 3, yf = qy & 3;
    if (!xf && !yf) {
        if (bx >= 0 && by >= 0 && bx + 16 <= width && by + 16 <= height) {
            for (int r = 0; r < 16; ++r)
                memcpy(out + r * 16, ref + size_t(by + r) * width + bx, 16);
            return;
        }
        for (int r = 0; r < 16; ++r) {
            const int yy = clampi(by + r, 0, height - 1);
            for (int c = 0; c < 16; ++c)
                out[r * 16 + c] = ref[size_t(yy) * width
                                      + clampi(bx + c, 0, width - 1)];
        }
        return;
    }
    // clamped source window: rows/cols [-2, 18+2] around the block (the
    // 6-tap stencil reaches 2 back / 3 forward of each position)
    uint8_t win[22][22];
    for (int r = 0; r < 22; ++r) {
        const int yy = clampi(by + r - 2, 0, height - 1);
        for (int c = 0; c < 22; ++c)
            win[r][c] = ref[size_t(yy) * width
                            + clampi(bx + c - 2, 0, width - 1)];
    }
    // G: integer grid (17x17 needed for quarter averages); b/h: half
    // positions; j: center half-half via unclipped vertical sums
    auto tap6 = [](int a, int b2, int c, int d, int e, int f) {
        return a - 5 * b2 + 20 * c + 20 * d - 5 * e + f;
    };
    int bhalf[17][17], hhalf[17][17], jhalf[17][17];
    if (xf) {
        for (int r = 0; r < 17; ++r)
            for (int c = 0; c < 17; ++c)
                bhalf[r][c] = clip255((tap6(win[r + 2][c], win[r + 2][c + 1],
                                            win[r + 2][c + 2],
                                            win[r + 2][c + 3],
                                            win[r + 2][c + 4],
                                            win[r + 2][c + 5]) + 16) >> 5);
    }
    if (yf) {
        for (int r = 0; r < 17; ++r)
            for (int c = 0; c < 17; ++c)
                hhalf[r][c] = clip255((tap6(win[r][c + 2], win[r + 1][c + 2],
                                            win[r + 2][c + 2],
                                            win[r + 3][c + 2],
                                            win[r + 4][c + 2],
                                            win[r + 5][c + 2]) + 16) >> 5);
    }
    if (xf && yf) {
        // cc: unclipped vertical 6-tap intermediates at half-row, for
        // every horizontal stencil position; j = 6-tap over cc, /1024
        int cc[17][22];
        for (int r = 0; r < 17; ++r)
            for (int c = 0; c < 22; ++c)
                cc[r][c] = tap6(win[r][c], win[r + 1][c], win[r + 2][c],
                                win[r + 3][c], win[r + 4][c], win[r + 5][c]);
        for (int r = 0; r < 17; ++r)
            for (int c = 0; c < 17; ++c)
                jhalf[r][c] = clip255((tap6(cc[r][c], cc[r][c + 1],
                                            cc[r][c + 2], cc[r][c + 3],
                                            cc[r][c + 4], cc[r][c + 5])
                                       + 512) >> 10);
    }
    auto at = [&](int grid_x, int grid_y, int fx, int fy) -> int {
        // sample on the {integer, half} lattice: (fx, fy) in {0, 2}
        if (!fx && !fy) return win[grid_y + 2][grid_x + 2];
        if (fx && !fy) return bhalf[grid_y][grid_x];
        if (!fx && fy) return hhalf[grid_y][grid_x];
        return jhalf[grid_y][grid_x];
    };
    // each output pixel: the spec quarter positions are averages of the
    // two nearest lattice samples (Table 8-12); halves/integers are the
    // lattice samples themselves
    const int hx = xf >> 1, hy = yf >> 1;           // nearest-low half flags
    for (int r = 0; r < 16; ++r)
        for (int c = 0; c < 16; ++c) {
            int v;
            if ((xf & 1) == 0 && (yf & 1) == 0) {
                v = at(c, r, xf, yf);
            } else if (yf == 0 || yf == 2) {
                // horizontal quarter: average horizontally-adjacent
                // samples at this row's lattice (integer or half row)
                const int left = at(c, r, 2 * hx, yf);
                const int right = (xf == 1)
                    ? at(c, r, 2, yf)
                    : at(c + 1, r, 0, yf);
                v = (left + right + 1) >> 1;
            } else if (xf == 0 || xf == 2) {
                const int up = at(c, r, xf, 2 * hy);
                const int dn = (yf == 1)
                    ? at(c, r, xf, 2)
                    : at(c, r + 1, xf, 0);
                v = (up + dn + 1) >> 1;
            } else {
                // diagonal quarters e/g/p/r: average of the nearest
                // horizontal-half and vertical-half samples
                const int bs = (yf == 1) ? bhalf[r][c] : bhalf[r + 1][c];
                const int hs = (xf == 1) ? hhalf[r][c] : hhalf[r][c + 1];
                v = (bs + hs + 1) >> 1;
            }
            out[r * 16 + c] = uint8_t(v);
        }
}

// 8x8 chroma prediction (8.4.2.2.2, ChromaArrayType 1): the chroma MV is
// the luma MV in eighth-chroma-sample units; integer-pel luma MVs leave
// fractions in {0, 4}, handled by the standard bilinear filter.
static void pred_chroma_8x8(const uint8_t* ref, int cw, int ch,
                            int cx0, int cy0, int qx, int qy,
                            uint8_t out[64]) {
    const int xi = qx >> 3, yi = qy >> 3;
    const int xf = qx & 7, yf = qy & 7;
    const int bx = cx0 + xi, by = cy0 + yi;
    if (!xf && !yf) {
        if (bx >= 0 && by >= 0 && bx + 8 <= cw && by + 8 <= ch) {
            for (int r = 0; r < 8; ++r)
                memcpy(out + r * 8, ref + size_t(by + r) * cw + bx, 8);
        } else {
            for (int r = 0; r < 8; ++r) {
                const int yy = clampi(by + r, 0, ch - 1);
                for (int c = 0; c < 8; ++c)
                    out[r * 8 + c] = ref[size_t(yy) * cw
                                         + clampi(bx + c, 0, cw - 1)];
            }
        }
        return;
    }
    for (int r = 0; r < 8; ++r) {
        const int y0c = clampi(by + r, 0, ch - 1);
        const int y1c = clampi(by + r + 1, 0, ch - 1);
        for (int c = 0; c < 8; ++c) {
            const int x0c = clampi(bx + c, 0, cw - 1);
            const int x1c = clampi(bx + c + 1, 0, cw - 1);
            const int a = ref[size_t(y0c) * cw + x0c];
            const int b = ref[size_t(y0c) * cw + x1c];
            const int cc = ref[size_t(y1c) * cw + x0c];
            const int d = ref[size_t(y1c) * cw + x1c];
            out[r * 8 + c] = uint8_t(((8 - xf) * (8 - yf) * a
                                      + xf * (8 - yf) * b
                                      + (8 - xf) * yf * cc
                                      + xf * yf * d + 32) >> 6);
        }
    }
}

// se(v) Exp-Golomb bit length, for the mvd rate term of the search cost.
static inline int se_bits(int v) {
    const uint32_t cn = v > 0 ? uint32_t(2 * v - 1) : uint32_t(-2 * v);
    int b = 0;
    for (uint32_t t = cn + 1; t > 1; t >>= 1) ++b;
    return 2 * b + 1;
}

// Integer-pel block-matching search for one 16x16 luma partition:
// candidate seeds (skip MV, predictor, left/up neighbors, zero) followed
// by a greedy small-diamond refinement, costed as SAD + lambda * mvd
// bits. Returns a quarter-pel MV (multiple of 4) in out. Early-exits on
// an exact skip match (SAD 0 at the skip MV: the MB becomes a P_Skip).
static void motion_search(const uint8_t* src, const uint8_t* ref,
                          int width, int height, int x0, int y0,
                          const int16_t mvskip[2], const int16_t mvp[2],
                          const MvCtx& m, int mx, int my,
                          int range_px, int lam, int16_t out[2]) {
    const uint8_t* s0 = src + size_t(y0) * width + x0;
    const int r4 = range_px * 4;

    auto sad_at = [&](int qx, int qy) -> int32_t {
        int32_t acc = 0;
        if ((qx | qy) & 3) {
            uint8_t pred[256];
            pred_luma_16x16(ref, width, height, x0, y0, qx, qy, pred);
            for (int rr = 0; rr < 16; ++rr)
                for (int cc = 0; cc < 16; ++cc)
                    acc += std::abs(int32_t(s0[rr * width + cc])
                                    - int32_t(pred[rr * 16 + cc]));
            return acc;
        }
        const int bx = x0 + (qx >> 2), by = y0 + (qy >> 2);
        if (bx >= 0 && by >= 0 && bx + 16 <= width && by + 16 <= height) {
            const uint8_t* r = ref + size_t(by) * width + bx;
            for (int rr = 0; rr < 16; ++rr)
                for (int cc = 0; cc < 16; ++cc)
                    acc += std::abs(int32_t(s0[rr * width + cc])
                                    - int32_t(r[rr * width + cc]));
            return acc;
        }
        for (int rr = 0; rr < 16; ++rr) {
            const int yy = clampi(by + rr, 0, height - 1);
            for (int cc = 0; cc < 16; ++cc)
                acc += std::abs(
                    int32_t(s0[rr * width + cc])
                    - int32_t(ref[size_t(yy) * width
                                  + clampi(bx + cc, 0, width - 1)]));
        }
        return acc;
    };
    auto cost_at = [&](int qx, int qy) -> int64_t {
        return int64_t(sad_at(qx, qy))
               + int64_t(lam) * (se_bits(qx - mvp[0]) + se_bits(qy - mvp[1]));
    };

    // skip MV first: an exact match short-circuits everything
    if (sad_at(mvskip[0], mvskip[1]) == 0) {
        out[0] = mvskip[0];
        out[1] = mvskip[1];
        return;
    }

    const MvNb A = mv_neighbor(m, mx - 1, my);
    const MvNb B = mv_neighbor(m, mx, my - 1);
    const int16_t cands[5][2] = {
        {0, 0},
        {mvp[0], mvp[1]},
        {mvskip[0], mvskip[1]},
        {A.mv[0], A.mv[1]},
        {B.mv[0], B.mv[1]},
    };
    int bx = 0, by = 0;
    int64_t best = cost_at(0, 0);
    for (int i = 1; i < 5; ++i) {
        const int cx = clampi(cands[i][0], -r4, r4) & ~3;
        const int cy = clampi(cands[i][1], -r4, r4) & ~3;
        if (cx == bx && cy == by) continue;
        const int64_t c = cost_at(cx, cy);
        if (c < best) { best = c; bx = cx; by = cy; }
    }
    // greedy diamond, 1 px steps, bounded by the search range
    for (int it = 0; it < 2 * range_px; ++it) {
        int nbx = bx, nby = by;
        int64_t nbest = best;
        static const int kD[4][2] = {{4, 0}, {-4, 0}, {0, 4}, {0, -4}};
        for (const auto& d : kD) {
            const int cx = bx + d[0], cy = by + d[1];
            if (cx < -r4 || cx > r4 || cy < -r4 || cy > r4) continue;
            const int64_t c = cost_at(cx, cy);
            if (c < nbest) { nbest = c; nbx = cx; nby = cy; }
        }
        if (nbx == bx && nby == by) break;
        bx = nbx; by = nby; best = nbest;
    }
    out[0] = int16_t(bx);
    out[1] = int16_t(by);
}

// Sub-pel refinement around an integer-pel winner: half (step 2), then
// quarter (step 1) — each tests the 8 surrounding positions. Runs ONLY
// on macroblocks whose integer-MV residual survives quantization (the
// ones that pay bits); skip-bound MBs never reach here. The decision
// metric is SATD (Hadamard-domain), not SAD: the interpolation acts as
// a low-pass filter, so on noisy content a fractional MV often has
// LOWER SAD while its structured residual costs MORE bits after the
// transform — SAD-based sub-pel picks blur, bloats P frames and breaks
// the skip chain on integer motion (measured: even-pan P frames 2.4x
// larger under SAD-decided sub-pel).
static void subpel_refine(const uint8_t* src, const uint8_t* ref,
                          int width, int height, int x0, int y0,
                          const int16_t mvp[2], int range_px, int subpel,
                          int lam, int16_t mv[2]) {
    const uint8_t* s0 = src + size_t(y0) * width + x0;
    const int r4 = range_px * 4;
    auto scost_at = [&](int qx, int qy) -> int64_t {
        uint8_t pred[256];
        pred_luma_16x16(ref, width, height, x0, y0, qx, qy, pred);
        int64_t acc = 0;
        for (int b = 0; b < 16; ++b) {
            const int px = (b & 3) * 4, pyr = (b >> 2) * 4;
            int32_t blk[16], tr[16];
            for (int rr = 0; rr < 4; ++rr)
                for (int cc = 0; cc < 4; ++cc)
                    blk[4 * rr + cc] =
                        int32_t(s0[(pyr + rr) * width + px + cc])
                        - int32_t(pred[(pyr + rr) * 16 + px + cc]);
            hadamard4x4(blk, tr);
            for (int i = 0; i < 16; ++i) acc += std::abs(tr[i]);
        }
        return ((acc + 1) >> 1)
               + int64_t(lam) * (se_bits(qx - mvp[0])
                                 + se_bits(qy - mvp[1]));
    };
    int bx = mv[0], by = mv[1];
    int64_t sbest = scost_at(bx, by);
    for (int step = 2; step >= 1; --step) {
        if (subpel < 3 - step) break;
        int nbx = bx, nby = by;
        int64_t nbest = sbest;
        for (int dy = -step; dy <= step; dy += step)
            for (int dx = -step; dx <= step; dx += step) {
                if (!dx && !dy) continue;
                const int cx = bx + dx, cy = by + dy;
                if (cx < -r4 || cx > r4 || cy < -r4 || cy > r4) continue;
                const int64_t c = scost_at(cx, cy);
                if (c < nbest) { nbest = c; nbx = cx; nby = cy; }
            }
        bx = nbx; by = nby; sbest = nbest;
    }
    mv[0] = int16_t(bx);
    mv[1] = int16_t(by);
}

// One P slice: MB rows [my0, my1). Each macroblock predicts from the
// reference picture at a motion vector chosen by the integer-pel search
// (me_range 0 = zero-motion tier: every MV is (0,0) and the bitstream is
// identical to the pre-search encoder, since all predictors collapse to
// zero). A macroblock whose residual quantizes to zero AND whose MV
// equals the P_Skip-derived MV (8.4.1.1) is a P_Skip; anything else is
// coded as P_L0_16x16 with mvd against the median predictor (8.4.1.3)
// and plain 4x4 luma residuals (no Intra_16x16 DC split in inter MBs),
// with the per-MB I_PCM rewind fallback (mb_type 30 in P slices)
// bounding the worst case. ref_* must not alias the recon planes
// (residuals read the reference after earlier MBs already
// reconstructed).
static void encode_slice_p(const uint8_t* y, const uint8_t* u,
                           const uint8_t* v, const uint8_t* ref_y,
                           const uint8_t* ref_u, const uint8_t* ref_v,
                           int width, int height, int cw, int mbs_x,
                           int my0, int my1,
                           const QuantParams& q, int qp, int frame_num,
                           PlaneCtx py, PlaneCtx pu, PlaneCtx pv,
                           int pcm_mode, MvCtx mctx, int me_range,
                           int me_subpel, int lam, BitWriter& w) {
    const int ch = height / 2;
    uint8_t* ry = py.recon;
    int16_t* nnz_y = py.nnz;
    // slice header (7.3.3): non-IDR reference picture, one L0 reference
    w.put_ue(uint32_t(my0 * mbs_x));      // first_mb_in_slice
    w.put_ue(5);                          // slice_type: P (all slices)
    w.put_ue(0);                          // pic_parameter_set_id
    w.put_bits(uint32_t(frame_num & 15), 4);  // frame_num (log2 max = 4)
    w.put_bit(0);                         // num_ref_idx_active_override
    w.put_bit(0);                         // ref_pic_list_modification_l0
    w.put_bit(0);                         // adaptive_ref_pic_marking (sliding)
    w.put_se(qp - 26);                    // slice_qp_delta
    w.put_ue(1);                          // disable_deblocking_filter_idc

    uint32_t skip_run = 0;
    for (int my = my0; my < my1; ++my) {
        for (int mx = 0; mx < mbs_x; ++mx) {
            const int x0 = mx * 16, y0 = my * 16;
            const int cx0 = mx * 8, cy0 = my * 8;
            const int mb_idx = my * mbs_x + mx;

            // ---- motion vector: skip-derived, predictor, search ----
            int16_t mvskip[2], mvp[2], mv[2] = {0, 0};
            mv_skip(mctx, mx, my, mvskip);
            mv_pred_16x16(mctx, mx, my, mvp);
            if (me_range > 0)
                motion_search(y, ref_y, width, height, x0, y0, mvskip,
                              mvp, mctx, mx, my, me_range, lam, mv);

            // prediction + residuals at the current MV, recomputable (the
            // sub-pel pass below may move the MV once)
            uint8_t predY[256], predU[64], predV[64];
            int32_t wq[16][16];
            bool any_luma;
            uint32_t luma_mask;  // bit b: block b has a nonzero level
            const uint8_t* srcs[2] = {u, v};
            const uint8_t* preds[2] = {predU, predV};
            PlaneCtx* pcs[2] = {&pu, &pv};
            int32_t cwq[2][4][16];
            int32_t cdcq[2][4];
            bool c_any_ac, c_any_dc;
            uint32_t cac_mask[2];
            int cbp_chroma;

            auto compute_residuals = [&]() {
                pred_luma_16x16(ref_y, width, height, x0, y0, mv[0], mv[1],
                                predY);
                pred_chroma_8x8(ref_u, cw, ch, cx0, cy0, mv[0], mv[1],
                                predU);
                pred_chroma_8x8(ref_v, cw, ch, cx0, cy0, mv[0], mv[1],
                                predV);

                // luma: 16 plain 4x4 blocks vs the prediction
                any_luma = false;
                luma_mask = 0;
                for (int b = 0; b < 16; ++b) {
                    const int bx = kBlkX[b], by = kBlkY[b];
                    const uint8_t* s =
                        y + (y0 + by * 4) * width + x0 + bx * 4;
                    const uint8_t* p = predY + by * 4 * 16 + bx * 4;
                    int32_t blk[16], tr[16], orr = 0;
                    for (int r = 0; r < 4; ++r)
                        for (int c = 0; c < 4; ++c) {
                            int32_t d = int32_t(s[r * width + c])
                                        - int32_t(p[r * 16 + c]);
                            blk[4 * r + c] = d;
                            orr |= d;
                        }
                    if (!orr) {
                        memset(wq[b], 0, sizeof(wq[b]));
                        continue;
                    }
                    fwd4x4(blk, tr);
                    if (quant_block_full(tr, q, wq[b])) {
                        any_luma = true;
                        luma_mask |= 1u << b;
                    }
                }

                // chroma: 2x2 DC Hadamard + AC, vs the prediction
                c_any_ac = c_any_dc = false;
                cac_mask[0] = cac_mask[1] = 0;
                for (int comp = 0; comp < 2; ++comp) {
                    int32_t cdc_raw[4];
                    for (int b = 0; b < 4; ++b) {
                        const int sx = (b & 1) * 4, sy = (b >> 1) * 4;
                        const uint8_t* s =
                            srcs[comp] + (cy0 + sy) * cw + cx0 + sx;
                        const uint8_t* p = preds[comp] + sy * 8 + sx;
                        int32_t blk[16], tr[16], orr = 0;
                        for (int r = 0; r < 4; ++r)
                            for (int c = 0; c < 4; ++c) {
                                int32_t d = int32_t(s[r * cw + c])
                                            - int32_t(p[r * 8 + c]);
                                blk[4 * r + c] = d;
                                orr |= d;
                            }
                        if (!orr) {
                            cdc_raw[b] = 0;
                            memset(cwq[comp][b], 0, sizeof(cwq[comp][b]));
                            continue;
                        }
                        fwd4x4(blk, tr);
                        cdc_raw[b] = tr[0];
                        if (quant_block_ac(tr, q, cwq[comp][b])) {
                            c_any_ac = true;
                            cac_mask[comp] |= 1u << b;
                        }
                    }
                    int32_t h0 =
                        cdc_raw[0] + cdc_raw[1] + cdc_raw[2] + cdc_raw[3];
                    int32_t h1 =
                        cdc_raw[0] - cdc_raw[1] + cdc_raw[2] - cdc_raw[3];
                    int32_t h2 =
                        cdc_raw[0] + cdc_raw[1] - cdc_raw[2] - cdc_raw[3];
                    int32_t h3 =
                        cdc_raw[0] - cdc_raw[1] - cdc_raw[2] + cdc_raw[3];
                    int32_t hs[4] = {h0, h1, h2, h3};
                    for (int i = 0; i < 4; ++i) {
                        int32_t lv = (std::abs(hs[i]) * kMF[q.mod][0]
                                      + 2 * q.f_intra) >> (q.qbits + 1);
                        cdcq[comp][i] = hs[i] < 0 ? -lv : lv;
                        if (cdcq[comp][i]) c_any_dc = true;
                    }
                }
                cbp_chroma = c_any_ac ? 2 : (c_any_dc ? 1 : 0);
            };
            compute_residuals();

            // sub-pel pass: only for macroblocks that will pay bits at
            // the integer MV (skip-bound MBs — the static bulk — never
            // pay the interpolation cost)
            if ((any_luma || cbp_chroma) && me_range > 0 && me_subpel > 0) {
                int16_t mv2[2] = {mv[0], mv[1]};
                subpel_refine(y, ref_y, width, height, x0, y0, mvp,
                              me_range, me_subpel, lam, mv2);
                if (mv2[0] != mv[0] || mv2[1] != mv[1]) {
                    mv[0] = mv2[0];
                    mv[1] = mv2[1];
                    compute_residuals();
                }
            }

            // ---- P_Skip: zero residual at the skip-derived MV ----
            if (!any_luma && !cbp_chroma && mv[0] == mvskip[0]
                && mv[1] == mvskip[1]) {
                ++skip_run;
                for (int r = 0; r < 16; ++r)
                    memcpy(ry + (y0 + r) * width + x0, predY + r * 16, 16);
                for (int r = 0; r < 8; ++r) {
                    memcpy(pu.recon + (cy0 + r) * cw + cx0, predU + r * 8, 8);
                    memcpy(pv.recon + (cy0 + r) * cw + cx0, predV + r * 8, 8);
                }
                for (int z = 0; z < 16; ++z)
                    nnz_y[(my * 4 + kBlkY[z]) * py.blk_w
                          + mx * 4 + kBlkX[z]] = 0;
                for (int b = 0; b < 4; ++b) {
                    const int bx = mx * 2 + (b & 1);
                    const int by = my * 2 + (b >> 1);
                    pu.nnz[by * pu.blk_w + bx] = 0;
                    pv.nnz[by * pv.blk_w + bx] = 0;
                }
                mctx.ok[mb_idx] = 1;
                mctx.mv[2 * mb_idx] = mv[0];
                mctx.mv[2 * mb_idx + 1] = mv[1];
                continue;
            }

            // ---- coded MB: skip run, then P_L0_16x16 with its mvd ----
            w.put_ue(skip_run);
            skip_run = 0;
            // snapshot AFTER the skip run: the I_PCM rewind keeps it
            const long snap_pos = w.pos;
            const int snap_bit = w.bit;
            const uint32_t snap_acc = w.acc;

            // luma cbp restricted to {0, 15}: when any block has levels,
            // all four 8x8s are coded (an empty 4x4 costs one coeff_token),
            // keeping emitted cbp inside the anchor set of kInterCbpCode
            const int luma_bits = any_luma ? 15 : 0;
            const int cbp = luma_bits | (cbp_chroma << 4);
            w.put_ue(0);               // mb_type: P_L0_16x16
            w.put_se(mv[0] - mvp[0]);  // mvd_l0 x
            w.put_se(mv[1] - mvp[1]);  // mvd_l0 y
            w.put_ue(kInterCbpCode[cbp]);
            if (cbp) w.put_se(0);  // mb_qp_delta
            if (luma_bits) {
                for (int b = 0; b < 16; ++b) {
                    const int bx4 = mx * 4 + kBlkX[b];
                    const int by4 = my * 4 + kBlkY[b];
                    int32_t scan[16];
                    for (int i = 0; i < 16; ++i)
                        scan[i] = wq[b][kZigzag[i]];
                    int tc = write_block(w, scan, 16, pred_nc(py, bx4, by4));
                    nnz_y[by4 * py.blk_w + bx4] = int16_t(tc);
                }
            } else {
                for (int z = 0; z < 16; ++z)
                    nnz_y[(my * 4 + kBlkY[z]) * py.blk_w
                          + mx * 4 + kBlkX[z]] = 0;
            }
            if (cbp_chroma) {
                for (int comp = 0; comp < 2; ++comp)
                    write_block(w, cdcq[comp], 4, -1);
            }
            for (int comp = 0; comp < 2; ++comp) {
                PlaneCtx& pc = *pcs[comp];
                for (int b = 0; b < 4; ++b) {
                    const int bx = mx * 2 + (b & 1);
                    const int by = my * 2 + (b >> 1);
                    if (cbp_chroma == 2) {
                        int32_t scan[15];
                        for (int i = 1; i < 16; ++i)
                            scan[i - 1] = cwq[comp][b][kZigzag[i]];
                        int tc = write_block(w, scan, 15, pred_nc(pc, bx, by));
                        pc.nnz[by * pc.blk_w + bx] = int16_t(tc);
                    } else {
                        pc.nnz[by * pc.blk_w + bx] = 0;
                        for (int i = 1; i < 16; ++i) cwq[comp][b][i] = 0;
                    }
                }
                if (cbp_chroma < 1)
                    for (int i = 0; i < 4; ++i) cdcq[comp][i] = 0;
            }

            // ---- per-MB I_PCM fallback (mb_type 30 in P slices) ----
            const long mb_bits = (w.pos - snap_pos) * 8 + (w.bit - snap_bit);
            bool use_pcm = pcm_mode == 2;
            if (pcm_mode == 1) {
                const long ipcm_bits =
                    9 + ((8 - ((snap_bit + 9) & 7)) & 7) + 384 * 8;
                use_pcm = mb_bits > ipcm_bits;
            }
            if (use_pcm) {
                w.pos = snap_pos; w.bit = snap_bit; w.acc = snap_acc;
                w.put_ue(30);         // mb_type: I_PCM (P slice: 5 + 25)
                w.byte_align_zero();
                for (int r = 0; r < 16; ++r)
                    w.put_bytes(y + (y0 + r) * width + x0, 16);
                for (int r = 0; r < 8; ++r)
                    w.put_bytes(u + (cy0 + r) * cw + cx0, 8);
                for (int r = 0; r < 8; ++r)
                    w.put_bytes(v + (cy0 + r) * cw + cx0, 8);
                for (int z = 0; z < 16; ++z)
                    nnz_y[(my * 4 + kBlkY[z]) * py.blk_w
                          + mx * 4 + kBlkX[z]] = 16;
                for (int b = 0; b < 4; ++b) {
                    const int bx = mx * 2 + (b & 1);
                    const int by = my * 2 + (b >> 1);
                    pu.nnz[by * pu.blk_w + bx] = 16;
                    pv.nnz[by * pv.blk_w + bx] = 16;
                }
                for (int r = 0; r < 16; ++r)
                    memcpy(ry + (y0 + r) * width + x0,
                           y + (y0 + r) * width + x0, 16);
                for (int r = 0; r < 8; ++r) {
                    memcpy(pu.recon + (cy0 + r) * cw + cx0,
                           u + (cy0 + r) * cw + cx0, 8);
                    memcpy(pv.recon + (cy0 + r) * cw + cx0,
                           v + (cy0 + r) * cw + cx0, 8);
                }
                // I_PCM is intra: unavailable for MV prediction (treated
                // as refIdx -1, mv (0,0) by the neighbor derivations)
                mctx.ok[mb_idx] = 0;
                mctx.mv[2 * mb_idx] = 0;
                mctx.mv[2 * mb_idx + 1] = 0;
                continue;
            }

            mctx.ok[mb_idx] = 1;
            mctx.mv[2 * mb_idx] = mv[0];
            mctx.mv[2 * mb_idx + 1] = mv[1];

            // ---- reconstruction (decoder-identical) ----
            for (int b = 0; b < 16; ++b) {
                const int bx = kBlkX[b], by = kBlkY[b];
                uint8_t* rb = ry + (y0 + by * 4) * width + x0 + bx * 4;
                const uint8_t* pb = predY + by * 4 * 16 + bx * 4;
                if (!(luma_mask & (1u << b))) {
                    for (int r = 0; r < 4; ++r)
                        memcpy(rb + r * width, pb + r * 16, 4);
                    continue;
                }
                int32_t d[16], res[16];
                d[0] = dequant_ac(wq[b][0], 0, q);
                dequant_block_ac(wq[b], q, d);
                inv4x4(d, res);
                for (int r = 0; r < 4; ++r)
                    for (int c = 0; c < 4; ++c)
                        rb[r * width + c] = clip255(
                            int32_t(pb[r * 16 + c]) + res[4 * r + c]);
            }
            for (int comp = 0; comp < 2; ++comp) {
                uint8_t* rec = pcs[comp]->recon;
                const uint8_t* pred = preds[comp];
                int32_t c0 = cdcq[comp][0], c1 = cdcq[comp][1];
                int32_t c2 = cdcq[comp][2], c3 = cdcq[comp][3];
                int32_t f0 = c0 + c1 + c2 + c3;
                int32_t f1 = c0 - c1 + c2 - c3;
                int32_t f2c = c0 + c1 - c2 - c3;
                int32_t f3 = c0 - c1 - c2 + c3;
                int32_t ls = 16 * kV[q.mod][0];
                int32_t dcd[4] = {
                    ((f0 * ls) << (q.qp / 6)) >> 5,
                    ((f1 * ls) << (q.qp / 6)) >> 5,
                    ((f2c * ls) << (q.qp / 6)) >> 5,
                    ((f3 * ls) << (q.qp / 6)) >> 5,
                };
                for (int b = 0; b < 4; ++b) {
                    const int sx = (b & 1) * 4, sy = (b >> 1) * 4;
                    uint8_t* rb = rec + (cy0 + sy) * cw + cx0 + sx;
                    const uint8_t* pb = pred + sy * 8 + sx;
                    if (dcd[b] == 0
                        && (cbp_chroma < 2
                            || !(cac_mask[comp] & (1u << b)))) {
                        for (int r = 0; r < 4; ++r)
                            memcpy(rb + r * cw, pb + r * 8, 4);
                        continue;
                    }
                    int32_t d[16], res[16];
                    d[0] = dcd[b];
                    dequant_block_ac(cwq[comp][b], q, d);
                    inv4x4(d, res);
                    for (int r = 0; r < 4; ++r)
                        for (int c = 0; c < 4; ++c)
                            rb[r * cw + c] = clip255(
                                int32_t(pb[r * 8 + c]) + res[4 * r + c]);
                }
            }
        }
    }
    if (skip_run) w.put_ue(skip_run);  // trailing skipped macroblocks
    w.rbsp_trailing();
}

}  // namespace

extern "C" {

// Encode one I420 frame as annex-B [SPS][PPS][IDR slice xN], all
// Intra_16x16 DC-predicted with CAVLC residuals at the given QP (clamped
// to [10, 29]). n_slices > 1 splits the picture into horizontal bands of
// MB rows encoded in parallel threads (the loop filter is off and
// prediction is slice-local, so decoder output still equals the
// reconstruction bit-for-bit; the bitstream depends only on the slice
// count, not on scheduling). recon_y/u/v (optional, may be NULL) receive
// the spec-exact reconstruction. Returns bytes written or -1.
long vptpu_h264_cavlc_encode_mt(const uint8_t* y, const uint8_t* u,
                                const uint8_t* v, int width, int height,
                                int qp, int idr_pic_id, int n_slices,
                                uint8_t* scratch, long scratch_cap,
                                uint8_t* out, long out_cap,
                                uint8_t* recon_y, uint8_t* recon_u,
                                uint8_t* recon_v) {
    if (width % 16 || height % 16) return -1;
    if (qp < 10) qp = 10;
    if (qp > 29) qp = 29;
    const int mbs_x = width / 16, mbs_y = height / 16;
    const int cw = width / 2, ch = height / 2;
    const QuantParams q = make_qp(qp);        // luma and (qp<30) chroma alike
    if (n_slices < 1) n_slices = 1;
    if (n_slices > mbs_y) n_slices = mbs_y;

    // reconstruction planes + nnz maps live in heap scratch
    uint8_t* ry = recon_y ? recon_y : (uint8_t*)malloc(size_t(width) * height);
    uint8_t* ru = recon_u ? recon_u : (uint8_t*)malloc(size_t(cw) * ch);
    uint8_t* rv = recon_v ? recon_v : (uint8_t*)malloc(size_t(cw) * ch);
    int16_t* nnz_y = (int16_t*)calloc(size_t(mbs_x * 4) * (mbs_y * 4), 2);
    int16_t* nnz_u = (int16_t*)calloc(size_t(mbs_x * 2) * (mbs_y * 2), 2);
    int16_t* nnz_v = (int16_t*)calloc(size_t(mbs_x * 2) * (mbs_y * 2), 2);
    // Intra_4x4 block-mode map (-1 = not I_4x4) for the cross-MB mode
    // prediction context; VPTPU_I4=0 disables the I_4x4 mode entirely
    // (pure Intra_16x16-DC, the pre-round-3 behavior), VPTPU_I4_MODEMASK
    // restricts the candidate prediction modes (debug aid).
    static const bool i4_on = [] {
        const char* p = getenv("VPTPU_I4");
        return !(p && p[0] == '0');
    }();
    static const uint32_t i4_mask = [] {
        const char* p = getenv("VPTPU_I4_MODEMASK");
        return p ? uint32_t(strtoul(p, nullptr, 0)) : 0x1FFu;
    }();
    int8_t* imodes =
        i4_on ? (int8_t*)malloc(size_t(mbs_x * 4) * (mbs_y * 4)) : nullptr;
    if (imodes) memset(imodes, -1, size_t(mbs_x * 4) * (mbs_y * 4));
    // SAD lambda ~ 0.85 * 2^((qp-12)/3), the standard SAD-domain rate
    // weight, for the mode-bit terms of the I4/I16 decision
    int lam = 1;
    for (int e = 0; e < (qp - 12) / 3; ++e) lam *= 2;
    lam = qp >= 12 ? (lam * 87 + 50) / 100 : 1;
    if (lam < 1) lam = 1;
    // per-MB I_PCM fallback policy (read per call so tests can toggle):
    // default auto (rewind any MB whose coded size beats raw samples)
    int pcm_mode = 1;
    if (const char* pe = getenv("VPTPU_PCM")) {
        if (pe[0] == '0') pcm_mode = 0;
        else if (!strcmp(pe, "force")) pcm_mode = 2;
    }
    long rc = -1;
    long off = -1;
    if (!ry || !ru || !rv || !nnz_y || !nnz_v || !nnz_u
        || (i4_on && !imodes)) goto done;

    off = vptpu::emit_sps_pps(out, out_cap, 0, scratch, scratch_cap,
                              mbs_x, mbs_y);
    if (off < 0) goto done;

    {
        // worst-case CAVLC escape coding stays under ~1.4 KB/MB; 2 KB/MB
        // of per-slice RBSP scratch leaves a wide margin (BitWriter drops
        // bits at capacity rather than overrunning; the pos >= cap check
        // below catches that case)
        std::vector<long> caps(n_slices), my0s(n_slices), my1s(n_slices);
        std::vector<uint8_t*> bufs(n_slices, nullptr);
        std::vector<BitWriter> ws(n_slices);
        bool alloc_ok = true;
        for (int s = 0; s < n_slices; ++s) {
            my0s[s] = long(mbs_y) * s / n_slices;
            my1s[s] = long(mbs_y) * (s + 1) / n_slices;
            caps[s] = (my1s[s] - my0s[s]) * long(mbs_x) * 2048 + 4096;
            bufs[s] = (uint8_t*)malloc(size_t(caps[s]));
            if (!bufs[s]) alloc_ok = false;
        }
        if (alloc_ok) {
            auto run = [&](int s) {
                ws[s] = BitWriter{bufs[s], caps[s]};
                int m0 = int(my0s[s]), m1 = int(my1s[s]);
                PlaneCtx py{ry, width, nnz_y, mbs_x * 4, m0 * 4};
                PlaneCtx pu{ru, cw, nnz_u, mbs_x * 2, m0 * 2};
                PlaneCtx pv{rv, cw, nnz_v, mbs_x * 2, m0 * 2};
                encode_slice(y, u, v, width, cw, mbs_x, m0, m1, q, qp,
                             idr_pic_id, py, pu, pv, imodes, i4_mask, lam,
                             pcm_mode, ws[s]);
            };
            std::vector<std::thread> threads;
            for (int s = 1; s < n_slices; ++s) threads.emplace_back(run, s);
            run(0);
            for (auto& t : threads) t.join();

            long o = off;
            for (int s = 0; s < n_slices && o >= 0; ++s) {
                if (ws[s].pos >= caps[s]) { o = -1; break; }
                o = vptpu::emit_nal(out, out_cap, o, 3, 5, bufs[s],
                                    ws[s].pos);
            }
            if (o >= 0) rc = o;
        }
        for (int s = 0; s < n_slices; ++s) free(bufs[s]);
    }

done:
    if (!recon_y) free(ry);
    if (!recon_u) free(ru);
    if (!recon_v) free(rv);
    free(nnz_y); free(nnz_u); free(nnz_v);
    free(imodes);
    return rc;
}

// Encode one I420 frame as a P picture (annex-B [P slice xN]) against the
// previous frame's reconstruction ref_y/u/v. Unchanged macroblocks become
// P_Skip runs; moving content is chased by an integer-pel block-matching
// search (VPTPU_ME range, default 24 px; 0 = the zero-motion tier) and
// coded as P_L0_16x16 with spec median-predicted mvd (the reference's
// x264 path emits inter frames for the same debug-bitrate reason,
// reference src/rtpstreamer.cpp:62-93). frame_num
// is the 4-bit reference-frame counter (IDR resets to 0; callers pass
// prev+1 mod 16). No SPS/PPS/IDR is emitted. recon_y/u/v (required)
// receive the spec-exact reconstruction for chaining and MUST be distinct
// buffers from ref_y/u/v. Returns bytes written or -1.
long vptpu_h264_cavlc_encode_p(const uint8_t* y, const uint8_t* u,
                               const uint8_t* v, int width, int height,
                               int qp, int frame_num, int n_slices,
                               const uint8_t* ref_y, const uint8_t* ref_u,
                               const uint8_t* ref_v,
                               uint8_t* out, long out_cap,
                               uint8_t* recon_y, uint8_t* recon_u,
                               uint8_t* recon_v) {
    if (width % 16 || height % 16) return -1;
    if (!ref_y || !ref_u || !ref_v || !recon_y || !recon_u || !recon_v)
        return -1;
    if (recon_y == ref_y || recon_u == ref_u || recon_v == ref_v) return -1;
    if (qp < 10) qp = 10;
    if (qp > 29) qp = 29;
    const int mbs_x = width / 16, mbs_y = height / 16;
    const int cw = width / 2;
    // inter rounding offset f = 2^qbits / 6 (vs /3 intra, 8.5.9 note)
    QuantParams q = make_qp(qp);
    q.f_intra = (1 << q.qbits) / 6;
    if (n_slices < 1) n_slices = 1;
    if (n_slices > mbs_y) n_slices = mbs_y;

    int16_t* nnz_y = (int16_t*)calloc(size_t(mbs_x * 4) * (mbs_y * 4), 2);
    int16_t* nnz_u = (int16_t*)calloc(size_t(mbs_x * 2) * (mbs_y * 2), 2);
    int16_t* nnz_v = (int16_t*)calloc(size_t(mbs_x * 2) * (mbs_y * 2), 2);
    // per-MB motion state (quarter-pel MVs + refIdx-0 validity) for the
    // slice-local MV prediction contexts
    int16_t* mvs = (int16_t*)calloc(size_t(mbs_x) * mbs_y * 2, 2);
    uint8_t* mv_ok = (uint8_t*)calloc(size_t(mbs_x) * mbs_y, 1);
    int pcm_mode = 1;
    if (const char* pe = getenv("VPTPU_PCM")) {
        if (pe[0] == '0') pcm_mode = 0;
        else if (!strcmp(pe, "force")) pcm_mode = 2;
    }
    // integer-pel motion search range in pixels (read per call so tests
    // can toggle): VPTPU_ME=0 restores the zero-motion tier, whose
    // bitstream the unified path reproduces exactly (all predictors
    // collapse to zero when every stored MV is zero)
    int me_range = 24;
    if (const char* me = getenv("VPTPU_ME")) {
        me_range = atoi(me);
        if (me_range < 0) me_range = 0;
        if (me_range > 64) me_range = 64;
    }
    // sub-pel refinement depth: 0 = integer-pel only, 1 = half-pel,
    // 2 = quarter-pel (default; the spec 6-tap/bilinear interpolation is
    // applied identically in prediction and reconstruction)
    int me_subpel = 2;
    if (const char* sp = getenv("VPTPU_SUBPEL")) {
        me_subpel = atoi(sp);
        if (me_subpel < 0) me_subpel = 0;
        if (me_subpel > 2) me_subpel = 2;
    }
    // SAD-domain rate weight for the mvd bits term, as in the intra path
    int lam = 1;
    for (int e = 0; e < (qp - 12) / 3; ++e) lam *= 2;
    lam = qp >= 12 ? (lam * 87 + 50) / 100 : 1;
    if (lam < 1) lam = 1;
    long rc = -1;
    if (!nnz_y || !nnz_u || !nnz_v || !mvs || !mv_ok) goto done;

    {
        std::vector<long> caps(n_slices), my0s(n_slices), my1s(n_slices);
        std::vector<uint8_t*> bufs(n_slices, nullptr);
        std::vector<BitWriter> ws(n_slices);
        bool alloc_ok = true;
        for (int s = 0; s < n_slices; ++s) {
            my0s[s] = long(mbs_y) * s / n_slices;
            my1s[s] = long(mbs_y) * (s + 1) / n_slices;
            caps[s] = (my1s[s] - my0s[s]) * long(mbs_x) * 2048 + 4096;
            bufs[s] = (uint8_t*)malloc(size_t(caps[s]));
            if (!bufs[s]) alloc_ok = false;
        }
        if (alloc_ok) {
            auto run = [&](int s) {
                ws[s] = BitWriter{bufs[s], caps[s]};
                int m0 = int(my0s[s]), m1 = int(my1s[s]);
                PlaneCtx py{recon_y, width, nnz_y, mbs_x * 4, m0 * 4};
                PlaneCtx pu{recon_u, cw, nnz_u, mbs_x * 2, m0 * 2};
                PlaneCtx pv{recon_v, cw, nnz_v, mbs_x * 2, m0 * 2};
                MvCtx mctx{mvs, mv_ok, mbs_x, m0};
                encode_slice_p(y, u, v, ref_y, ref_u, ref_v, width, height,
                               cw, mbs_x, m0, m1, q, qp, frame_num,
                               py, pu, pv, pcm_mode, mctx, me_range,
                               me_subpel, lam, ws[s]);
            };
            std::vector<std::thread> threads;
            for (int s = 1; s < n_slices; ++s) threads.emplace_back(run, s);
            run(0);
            for (auto& t : threads) t.join();

            long o = 0;
            for (int s = 0; s < n_slices && o >= 0; ++s) {
                if (ws[s].pos >= caps[s]) { o = -1; break; }
                // non-IDR coded slice (NAL type 1), used as a reference
                o = vptpu::emit_nal(out, out_cap, o, 2, 1, bufs[s],
                                    ws[s].pos);
            }
            if (o >= 0) rc = o;
        }
        for (int s = 0; s < n_slices; ++s) free(bufs[s]);
    }

done:
    free(nnz_y); free(nnz_u); free(nnz_v);
    free(mvs); free(mv_ok);
    return rc;
}

// Single-slice form (original ABI).
long vptpu_h264_cavlc_encode(const uint8_t* y, const uint8_t* u,
                             const uint8_t* v, int width, int height,
                             int qp, int idr_pic_id,
                             uint8_t* scratch, long scratch_cap,
                             uint8_t* out, long out_cap,
                             uint8_t* recon_y, uint8_t* recon_u,
                             uint8_t* recon_v) {
    return vptpu_h264_cavlc_encode_mt(y, u, v, width, height, qp,
                                      idr_pic_id, 1, scratch, scratch_cap,
                                      out, out_cap, recon_y, recon_u,
                                      recon_v);
}

}  // extern "C"
