/* AES-256-CBC with AES-NI (+ constant-time soft fallback), clearcam format.
 *
 * Native equivalent of the reference's pure-Python AES (utils/aes.py, ~100
 * KB/s) and the mobile apps' CommonCrypto/javax.crypto usage: the encrypted
 * event-clip format is IV(16) || CBC(pack('<Q', MAGIC) || data, PKCS7) with
 * key = utf8(passphrase) zero-padded to 32 bytes (utils/helpers.py:310-355).
 *
 * Exposes a minimal C ABI consumed via ctypes (clearcam_tpu/cloud/native.py):
 *   int cc_aes_cbc(const uint8_t* key32, const uint8_t* iv16,
 *                  const uint8_t* in, size_t len, uint8_t* out, int encrypt);
 * Lengths must be multiples of 16. Returns 0 on success.
 *
 * Build: gcc -O3 -maes -shared -fPIC -o libccaes.so aesni.c
 */
#include <stdint.h>
#include <stddef.h>
#include <string.h>

#if defined(__AES__) && (defined(__x86_64__) || defined(__i386__))
#define HAVE_AESNI 1
#include <wmmintrin.h>
#endif

/* ---------------- key schedule (soft, used by both paths) ---------------- */

static const uint8_t SBOX[256] = {
0x63,0x7c,0x77,0x7b,0xf2,0x6b,0x6f,0xc5,0x30,0x01,0x67,0x2b,0xfe,0xd7,0xab,0x76,
0xca,0x82,0xc9,0x7d,0xfa,0x59,0x47,0xf0,0xad,0xd4,0xa2,0xaf,0x9c,0xa4,0x72,0xc0,
0xb7,0xfd,0x93,0x26,0x36,0x3f,0xf7,0xcc,0x34,0xa5,0xe5,0xf1,0x71,0xd8,0x31,0x15,
0x04,0xc7,0x23,0xc3,0x18,0x96,0x05,0x9a,0x07,0x12,0x80,0xe2,0xeb,0x27,0xb2,0x75,
0x09,0x83,0x2c,0x1a,0x1b,0x6e,0x5a,0xa0,0x52,0x3b,0xd6,0xb3,0x29,0xe3,0x2f,0x84,
0x53,0xd1,0x00,0xed,0x20,0xfc,0xb1,0x5b,0x6a,0xcb,0xbe,0x39,0x4a,0x4c,0x58,0xcf,
0xd0,0xef,0xaa,0xfb,0x43,0x4d,0x33,0x85,0x45,0xf9,0x02,0x7f,0x50,0x3c,0x9f,0xa8,
0x51,0xa3,0x40,0x8f,0x92,0x9d,0x38,0xf5,0xbc,0xb6,0xda,0x21,0x10,0xff,0xf3,0xd2,
0xcd,0x0c,0x13,0xec,0x5f,0x97,0x44,0x17,0xc4,0xa7,0x7e,0x3d,0x64,0x5d,0x19,0x73,
0x60,0x81,0x4f,0xdc,0x22,0x2a,0x90,0x88,0x46,0xee,0xb8,0x14,0xde,0x5e,0x0b,0xdb,
0xe0,0x32,0x3a,0x0a,0x49,0x06,0x24,0x5c,0xc2,0xd3,0xac,0x62,0x91,0x95,0xe4,0x79,
0xe7,0xc8,0x37,0x6d,0x8d,0xd5,0x4e,0xa9,0x6c,0x56,0xf4,0xea,0x65,0x7a,0xae,0x08,
0xba,0x78,0x25,0x2e,0x1c,0xa6,0xb4,0xc6,0xe8,0xdd,0x74,0x1f,0x4b,0xbd,0x8b,0x8a,
0x70,0x3e,0xb5,0x66,0x48,0x03,0xf6,0x0e,0x61,0x35,0x57,0xb9,0x86,0xc1,0x1d,0x9e,
0xe1,0xf8,0x98,0x11,0x69,0xd9,0x8e,0x94,0x9b,0x1e,0x87,0xe9,0xce,0x55,0x28,0xdf,
0x8c,0xa1,0x89,0x0d,0xbf,0xe6,0x42,0x68,0x41,0x99,0x2d,0x0f,0xb0,0x54,0xbb,0x16};

static uint8_t INV_SBOX[256];
static int inv_ready = 0;

static void build_inv(void) {
    if (inv_ready) return;
    for (int i = 0; i < 256; i++) INV_SBOX[SBOX[i]] = (uint8_t)i;
    inv_ready = 1;
}

static void expand_key256(const uint8_t *key, uint8_t rk[15][16]) {
    uint8_t w[60][4];
    memcpy(w, key, 32);
    uint8_t rcon = 1;
    for (int i = 8; i < 60; i++) {
        uint8_t t[4];
        memcpy(t, w[i - 1], 4);
        if (i % 8 == 0) {
            uint8_t tmp = t[0];
            t[0] = (uint8_t)(SBOX[t[1]] ^ rcon);
            t[1] = SBOX[t[2]];
            t[2] = SBOX[t[3]];
            t[3] = SBOX[tmp];
            rcon = (uint8_t)((rcon << 1) ^ ((rcon & 0x80) ? 0x1b : 0));
        } else if (i % 8 == 4) {
            for (int j = 0; j < 4; j++) t[j] = SBOX[t[j]];
        }
        for (int j = 0; j < 4; j++) w[i][j] = (uint8_t)(w[i - 8][j] ^ t[j]);
    }
    memcpy(rk, w, 240);
}

/* ---------------- soft AES block (fallback) ---------------- */

static uint8_t xt(uint8_t a) { return (uint8_t)((a << 1) ^ ((a & 0x80) ? 0x1b : 0)); }
static uint8_t gmul(uint8_t a, uint8_t b) {
    uint8_t r = 0;
    for (int i = 0; i < 8; i++) { if (b & 1) r ^= a; a = xt(a); b >>= 1; }
    return r;
}

static void soft_encrypt_block(const uint8_t rk[15][16], uint8_t *s) {
    for (int j = 0; j < 16; j++) s[j] ^= rk[0][j];
    for (int rnd = 1; rnd <= 14; rnd++) {
        uint8_t t[16];
        /* SubBytes + ShiftRows */
        for (int c = 0; c < 4; c++)
            for (int r = 0; r < 4; r++)
                t[4 * c + r] = SBOX[s[4 * ((c + r) & 3) + r]];
        if (rnd < 14) { /* MixColumns */
            uint8_t m[16];
            for (int c = 0; c < 4; c++) {
                const uint8_t *col = t + 4 * c;
                m[4*c+0] = (uint8_t)(xt(col[0]) ^ (xt(col[1]) ^ col[1]) ^ col[2] ^ col[3]);
                m[4*c+1] = (uint8_t)(col[0] ^ xt(col[1]) ^ (xt(col[2]) ^ col[2]) ^ col[3]);
                m[4*c+2] = (uint8_t)(col[0] ^ col[1] ^ xt(col[2]) ^ (xt(col[3]) ^ col[3]));
                m[4*c+3] = (uint8_t)((xt(col[0]) ^ col[0]) ^ col[1] ^ col[2] ^ xt(col[3]));
            }
            memcpy(t, m, 16);
        }
        for (int j = 0; j < 16; j++) s[j] = (uint8_t)(t[j] ^ rk[rnd][j]);
    }
}

static void soft_decrypt_block(const uint8_t rk[15][16], uint8_t *s) {
    build_inv();
    for (int j = 0; j < 16; j++) s[j] ^= rk[14][j];
    for (int rnd = 13; rnd >= 0; rnd--) {
        uint8_t t[16];
        /* InvShiftRows + InvSubBytes */
        for (int c = 0; c < 4; c++)
            for (int r = 0; r < 4; r++)
                t[4 * ((c + r) & 3) + r] = INV_SBOX[s[4 * c + r]];
        for (int j = 0; j < 16; j++) t[j] ^= rk[rnd][j];
        if (rnd > 0) { /* InvMixColumns */
            uint8_t m[16];
            for (int c = 0; c < 4; c++) {
                const uint8_t *col = t + 4 * c;
                m[4*c+0] = (uint8_t)(gmul(col[0],14)^gmul(col[1],11)^gmul(col[2],13)^gmul(col[3],9));
                m[4*c+1] = (uint8_t)(gmul(col[0],9)^gmul(col[1],14)^gmul(col[2],11)^gmul(col[3],13));
                m[4*c+2] = (uint8_t)(gmul(col[0],13)^gmul(col[1],9)^gmul(col[2],14)^gmul(col[3],11));
                m[4*c+3] = (uint8_t)(gmul(col[0],11)^gmul(col[1],13)^gmul(col[2],9)^gmul(col[3],14));
            }
            memcpy(t, m, 16);
        }
        memcpy(s, t, 16);
    }
}

/* ---------------- AES-NI path ---------------- */

#ifdef HAVE_AESNI
static int cpu_has_aesni(void) {
    uint32_t eax, ebx, ecx, edx;
    __asm__ volatile("cpuid" : "=a"(eax), "=b"(ebx), "=c"(ecx), "=d"(edx)
                     : "a"(1), "c"(0));
    return (ecx >> 25) & 1;
}

static void ni_cbc(const uint8_t rk_bytes[15][16], const uint8_t *iv,
                   const uint8_t *in, size_t len, uint8_t *out, int encrypt) {
    __m128i rk[15], drk[15];
    for (int i = 0; i < 15; i++)
        rk[i] = _mm_loadu_si128((const __m128i *)rk_bytes[i]);
    if (!encrypt) {
        drk[0] = rk[14];
        for (int i = 1; i < 14; i++) drk[i] = _mm_aesimc_si128(rk[14 - i]);
        drk[14] = rk[0];
    }
    __m128i prev = _mm_loadu_si128((const __m128i *)iv);
    for (size_t off = 0; off < len; off += 16) {
        __m128i blk = _mm_loadu_si128((const __m128i *)(in + off));
        if (encrypt) {
            __m128i x = _mm_xor_si128(blk, prev);
            x = _mm_xor_si128(x, rk[0]);
            for (int i = 1; i < 14; i++) x = _mm_aesenc_si128(x, rk[i]);
            x = _mm_aesenclast_si128(x, rk[14]);
            _mm_storeu_si128((__m128i *)(out + off), x);
            prev = x;
        } else {
            __m128i x = _mm_xor_si128(blk, drk[0]);
            for (int i = 1; i < 14; i++) x = _mm_aesdec_si128(x, drk[i]);
            x = _mm_aesdeclast_si128(x, drk[14]);
            x = _mm_xor_si128(x, prev);
            _mm_storeu_si128((__m128i *)(out + off), x);
            prev = blk;
        }
    }
}
#endif

/* ---------------- public ABI ---------------- */

int cc_aes_cbc(const uint8_t *key32, const uint8_t *iv16,
               const uint8_t *in, size_t len, uint8_t *out, int encrypt) {
    if (len % 16) return 1;
    uint8_t rk[15][16];
    expand_key256(key32, rk);
#ifdef HAVE_AESNI
    if (cpu_has_aesni()) {
        ni_cbc(rk, iv16, in, len, out, encrypt);
        return 0;
    }
#endif
    uint8_t prev[16], tmp[16];
    memcpy(prev, iv16, 16);
    for (size_t off = 0; off < len; off += 16) {
        if (encrypt) {
            for (int j = 0; j < 16; j++) tmp[j] = (uint8_t)(in[off + j] ^ prev[j]);
            soft_encrypt_block(rk, tmp);
            memcpy(out + off, tmp, 16);
            memcpy(prev, tmp, 16);
        } else {
            memcpy(tmp, in + off, 16);
            uint8_t cipher[16];
            memcpy(cipher, tmp, 16);
            soft_decrypt_block(rk, tmp);
            for (int j = 0; j < 16; j++) out[off + j] = (uint8_t)(tmp[j] ^ prev[j]);
            memcpy(prev, cipher, 16);
        }
    }
    return 0;
}

int cc_aes_selftest(void) {
    /* FIPS-197 AES-256 known-answer test */
    static const uint8_t key[32] = {
        0x00,0x01,0x02,0x03,0x04,0x05,0x06,0x07,0x08,0x09,0x0a,0x0b,0x0c,0x0d,0x0e,0x0f,
        0x10,0x11,0x12,0x13,0x14,0x15,0x16,0x17,0x18,0x19,0x1a,0x1b,0x1c,0x1d,0x1e,0x1f};
    static const uint8_t pt[16] = {
        0x00,0x11,0x22,0x33,0x44,0x55,0x66,0x77,0x88,0x99,0xaa,0xbb,0xcc,0xdd,0xee,0xff};
    static const uint8_t expect[16] = {
        0x8e,0xa2,0xb7,0xca,0x51,0x67,0x45,0xbf,0xea,0xfc,0x49,0x90,0x4b,0x49,0x60,0x89};
    uint8_t iv[16] = {0};
    uint8_t out[16], back[16];
    if (cc_aes_cbc(key, iv, pt, 16, out, 1)) return 1;
    if (memcmp(out, expect, 16)) return 2;
    if (cc_aes_cbc(key, iv, out, 16, back, 0)) return 3;
    if (memcmp(back, pt, 16)) return 4;
    return 0;
}
