// Native MiMC-91 engine over BN254 Fr (sequencer host hot path).
//
// The reference sequencer hashes the account SMT with a BigUint-based MiMC
// (core/src/sequencer/storage/account_tree.rs:46-125): every transaction
// walks 32 tree levels x 91 rounds x ~4 modmuls. This C++ module is the
// framework's native equivalent: 4x64-bit Montgomery arithmetic, exposed
// through a C ABI consumed via ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -shared -fPIC -o libzelana_mimc.so mimc.cpp
//
// Conventions match the reference exactly:
//   round constant c_i = (i+1)^3 + (i+1), 91 rounds, x -> (x+k+c)^7,
//   sponge: state=0; state = permute(state + input) per input,
//   hash_n = sponge([n, x1..xn]); byte I/O is 32-byte big-endian
//   (account_tree.rs:188-204).

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = __uint128_t;

namespace {

// BN254 Fr modulus, little-endian u64 limbs
static const u64 MOD[4] = {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                           0xb85045b68181585dULL, 0x30644e72e131a029ULL};
// -MOD^{-1} mod 2^64
static const u64 INV = 0xc2e1f593efffffffULL;
// R^2 mod p (R = 2^256)
static const u64 R2[4] = {0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
                          0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL};

struct Fr {
  u64 v[4];
};

static inline bool geq(const u64 a[4], const u64 b[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return true;
}

static inline void sub4(u64 a[4], const u64 b[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - b[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

static inline void add_mod(Fr &a, const Fr &b) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    a.v[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || geq(a.v, MOD)) sub4(a.v, MOD);
}

// CIOS Montgomery multiplication
static void mont_mul(Fr &out, const Fr &a, const Fr &b) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (u64)cur;
    t[5] = (u64)(cur >> 64);

    u64 m = t[0] * INV;
    carry = ((u128)t[0] + (u128)m * MOD[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 cur2 = (u128)t[j] + (u128)m * MOD[j] + carry;
      t[j - 1] = (u64)cur2;
      carry = cur2 >> 64;
    }
    u128 cur3 = (u128)t[4] + carry;
    t[3] = (u64)cur3;
    t[4] = t[5] + (u64)(cur3 >> 64);
  }
  if (t[4] || geq(t, MOD)) sub4(t, MOD);
  std::memcpy(out.v, t, 32);
}

static Fr to_mont(const Fr &a) {
  Fr r, r2;
  std::memcpy(r2.v, R2, 32);
  mont_mul(r, a, r2);
  return r;
}

static Fr from_mont(const Fr &a) {
  Fr one = {{1, 0, 0, 0}}, r;
  mont_mul(r, a, one);
  return r;
}

static Fr from_u64(u64 x) {
  Fr a = {{x, 0, 0, 0}};
  return to_mont(a);
}

// 91 round constants, Montgomery form, computed once
static Fr RC[91];
static bool rc_init_done = false;

static void rc_init() {
  if (rc_init_done) return;
  for (u64 i = 0; i < 91; ++i) {
    u64 idx = i + 1;
    // (i+1)^3 + (i+1) fits u64 for idx <= 91
    u64 c = idx * idx * idx + idx;
    RC[i] = from_u64(c);
  }
  rc_init_done = true;
}

// x -> (x + c)^7, key 0, then permute chain
static Fr mimc_permute(Fr x) {
  rc_init();
  Fr s = x;
  for (int i = 0; i < 91; ++i) {
    Fr t = s;
    add_mod(t, RC[i]);
    Fr t2, t4, t6;
    mont_mul(t2, t, t);
    mont_mul(t4, t2, t2);
    mont_mul(t6, t4, t2);
    mont_mul(s, t6, t);
  }
  return s;  // key = 0: no final addition
}

static Fr sponge(const Fr *inputs, int n) {
  Fr state = {{0, 0, 0, 0}};
  for (int i = 0; i < n; ++i) {
    add_mod(state, inputs[i]);
    state = mimc_permute(state);
  }
  return state;
}

static Fr read_be(const uint8_t *bytes) {
  // 32-byte big-endian -> Fr (mod p) -> Montgomery
  Fr a = {{0, 0, 0, 0}};
  for (int i = 0; i < 32; ++i) {
    int limb = (31 - i) / 8;
    int shift = ((31 - i) % 8) * 8;
    a.v[limb] |= (u64)bytes[i] << shift;
  }
  // reduce mod p (input < 2^256 < 2p^... need up to 2 subs? 2^256/p ~ 5.8)
  while (geq(a.v, MOD)) sub4(a.v, MOD);
  return to_mont(a);
}

static void write_be(const Fr &a_mont, uint8_t *bytes) {
  Fr a = from_mont(a_mont);
  for (int i = 0; i < 32; ++i) {
    int limb = (31 - i) / 8;
    int shift = ((31 - i) % 8) * 8;
    bytes[i] = (uint8_t)(a.v[limb] >> shift);
  }
}

}  // namespace

extern "C" {

// hash_n with numeric-arity domain: out = sponge([n, in_0..in_{n-1}])
// ins: n*32 bytes big-endian; out: 32 bytes big-endian
void zelana_mimc_hash_n(const uint8_t *ins, int n, uint8_t *out) {
  Fr buf[16];
  buf[0] = from_u64((u64)n);
  for (int i = 0; i < n && i < 15; ++i) buf[i + 1] = read_be(ins + 32 * i);
  Fr r = sponge(buf, n + 1);
  write_be(r, out);
}

// account leaf: sponge([4, 1, pk, balance, nonce])  (account_tree.rs:109-124)
void zelana_mimc_account_leaf(const uint8_t *pk, u64 balance, u64 nonce,
                              uint8_t *out) {
  Fr buf[5];
  buf[0] = from_u64(4);
  buf[1] = from_u64(1);
  buf[2] = read_be(pk);
  buf[3] = from_u64(balance);
  buf[4] = from_u64(nonce);
  Fr r = sponge(buf, 5);
  write_be(r, out);
}

// batched hash_2 over pairs: k pairs of (left, right), 32B BE each
void zelana_mimc_hash2_batch(const uint8_t *lefts, const uint8_t *rights,
                             int k, uint8_t *outs) {
  for (int i = 0; i < k; ++i) {
    Fr buf[3];
    buf[0] = from_u64(2);
    buf[1] = read_be(lefts + 32 * i);
    buf[2] = read_be(rights + 32 * i);
    Fr r = sponge(buf, 3);
    write_be(r, outs + 32 * i);
  }
}

// Merkle path recompute: walk 32 levels; dirs[i] = 1 if current is right
// child. leaf/sibs 32B BE; returns root.
void zelana_mimc_merkle_root(const uint8_t *leaf, const uint8_t *sibs,
                             const uint8_t *dirs, int depth, uint8_t *out) {
  Fr two = from_u64(2);
  Fr cur = read_be(leaf);
  for (int i = 0; i < depth; ++i) {
    Fr sib = read_be(sibs + 32 * i);
    Fr buf[3];
    buf[0] = two;
    if (dirs[i]) {
      buf[1] = sib;
      buf[2] = cur;
    } else {
      buf[1] = cur;
      buf[2] = sib;
    }
    cur = sponge(buf, 3);
  }
  write_be(cur, out);
}

}  // extern "C"
