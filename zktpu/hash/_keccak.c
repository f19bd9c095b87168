/* Keccak-256 (legacy 0x01 padding, as used by the Rust `sha3` crate's
 * Keccak256 type and by Ethereum) -- native host hashing for the Fiat-Shamir
 * transcript and Merkle tree.
 *
 * The transcript absorbs entire evaluation tables (e.g. 32 MiB for a 2^20-entry
 * sumcheck, see /root/reference/sum_check/src/sum_check_protocol.rs:27), so the
 * host hash must be fast; pure Python keccak-f is ~1000x too slow.
 *
 * Build: gcc -O3 -shared -fPIC -o libzkkeccak.so _keccak.c
 * Exposed API (ctypes):
 *   void keccak256(const uint8_t *in, size_t len, uint8_t out[32]);
 *   void keccak256_batch(const uint8_t *in, size_t msg_len, size_t n,
 *                        uint8_t *out);  // n messages of equal msg_len
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

#define ROTL64(x, n) (((x) << (n)) | ((x) >> (64 - (n))))

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int RHO[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55, 20, 3,  10, 43,
                            25, 39, 41, 45, 15, 21, 8,  18, 2,  61, 56, 14};

static void keccak_f(uint64_t st[25]) {
  uint64_t bc[5], t;
  for (int round = 0; round < 24; round++) {
    /* theta */
    for (int i = 0; i < 5; i++)
      bc[i] = st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20];
    for (int i = 0; i < 5; i++) {
      t = bc[(i + 4) % 5] ^ ROTL64(bc[(i + 1) % 5], 1);
      for (int j = 0; j < 25; j += 5) st[j + i] ^= t;
    }
    /* rho + pi */
    uint64_t tmp[25];
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) {
        /* dest lane (y, 2x+3y) in (x,y)-indexing; flat index = x + 5*y */
        int xi = x, yi = y;
        int nx = yi, ny = (2 * xi + 3 * yi) % 5;
        tmp[nx + 5 * ny] = ROTL64(st[xi + 5 * yi], RHO[xi + 5 * yi]);
      }
    /* chi */
    for (int y = 0; y < 5; y++)
      for (int x = 0; x < 5; x++)
        st[x + 5 * y] =
            tmp[x + 5 * y] ^ ((~tmp[(x + 1) % 5 + 5 * y]) & tmp[(x + 2) % 5 + 5 * y]);
    /* iota */
    st[0] ^= RC[round];
  }
}

#define RATE 136 /* Keccak-256 rate in bytes */

void keccak256(const uint8_t *in, size_t len, uint8_t *out) {
  uint64_t st[25];
  memset(st, 0, sizeof(st));
  /* absorb full blocks */
  while (len >= RATE) {
    for (int i = 0; i < RATE / 8; i++) {
      uint64_t w;
      memcpy(&w, in + 8 * i, 8);
      st[i] ^= w;
    }
    keccak_f(st);
    in += RATE;
    len -= RATE;
  }
  /* final block with 0x01 ... 0x80 padding (legacy Keccak, NOT SHA-3) */
  uint8_t block[RATE];
  memset(block, 0, RATE);
  memcpy(block, in, len);
  block[len] = 0x01;
  block[RATE - 1] |= 0x80;
  for (int i = 0; i < RATE / 8; i++) {
    uint64_t w;
    memcpy(&w, block + 8 * i, 8);
    st[i] ^= w;
  }
  keccak_f(st);
  memcpy(out, st, 32);
}

void keccak256_batch(const uint8_t *in, size_t msg_len, size_t n, uint8_t *out) {
  for (size_t i = 0; i < n; i++)
    keccak256(in + i * msg_len, msg_len, out + i * 32);
}
