// Native R1CS synthesis for the fixed-shape MiMC chunk circuit.
//
// Faithful C++ port of circuits/batch_mimc.py over r1cs/system.py: same
// variable-allocation order, same constraint emission, same constant-folding
// semantics (FpVar constants propagate without constraints), so the produced
// (A, B, C, z) system is element-for-element the one the Python layer
// builds -- tests/test_chunk_native.py proves equality at small shapes.
//
// Why native: the production chunk shape (8/4/4, depth 32 -- the one key
// the whole prover network shares, forge zelana_batch/main.nr:27-30) is
// ~1.2M constraints; pure-Python synthesis + satisfaction check + the three
// sparse matvecs cost ~minutes PER PROVE, dominating the TPU time. This
// engine produces CSR matrices + assignment in ~1s and also evaluates
// A.z/B.z/C.z and the QAP Lagrange accumulation natively.
//
// Conventions:
//   - Field values cross the ABI as canonical little-endian 4xu64.
//   - CSR coefficient entries are indices into a deduplicated constant
//     pool (most coefficients are +-1, powers of two, or MiMC constants).
//   - Variable ids are global: 0 = ONE, 1..7 = public inputs, 8+ = witness.
//
// Build: g++ -O3 -shared -fPIC -o libzelana_chunk.so chunk_synth.cpp

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

using u64 = uint64_t;
using i64 = int64_t;
using i32 = int32_t;
using u128 = __uint128_t;

namespace {

// ---------------------------------------------------------------------------
// BN254 Fr, 4x64 Montgomery (same engine as mimc.cpp)
// ---------------------------------------------------------------------------

static const u64 MOD[4] = {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                           0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 INV = 0xc2e1f593efffffffULL;
static const u64 R2[4] = {0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
                          0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL};

struct Fr {
  u64 v[4];
  bool operator==(const Fr &o) const {
    return !std::memcmp(v, o.v, 32);
  }
};

static inline bool geq(const u64 a[4], const u64 b[4]) {
  for (int i = 3; i >= 0; --i)
    if (a[i] != b[i]) return a[i] > b[i];
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

static inline Fr add_mod(Fr a, const Fr &b) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    a.v[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || geq(a.v, MOD)) sub4(a.v, MOD);
  return a;
}

static inline Fr sub_mod(Fr a, const Fr &b) {
  u128 borrow = 0;
  u64 out[4];
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    out[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)out[i] + MOD[i] + carry;
      out[i] = (u64)s;
      carry = s >> 64;
    }
  }
  std::memcpy(a.v, out, 32);
  return a;
}

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

static inline Fr mul(const Fr &a, const Fr &b) {
  Fr r;
  mont_mul(r, a, b);
  return r;
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

static Fr fr_zero() { return Fr{{0, 0, 0, 0}}; }

static Fr from_u64(u64 x) {
  Fr a = {{x, 0, 0, 0}};
  return to_mont(a);
}

static bool is_zero(const Fr &a) {
  return !(a.v[0] | a.v[1] | a.v[2] | a.v[3]);
}

// a^e for canonical exponent e (little-endian limbs), a in Montgomery form
static Fr pow_fr(const Fr &a, const u64 e[4]) {
  Fr result = from_u64(1);
  Fr base = a;
  for (int limb = 0; limb < 4; ++limb) {
    u64 bits = e[limb];
    for (int i = 0; i < 64; ++i) {
      if ((bits >> i) & 1) result = mul(result, base);
      base = mul(base, base);
    }
  }
  return result;
}

static Fr inv_fr(const Fr &a) {
  u64 e[4];
  std::memcpy(e, MOD, 32);
  e[0] -= 2;  // p - 2 (p odd, no borrow)
  return pow_fr(a, e);
}

static Fr pow7(const Fr &x) {
  Fr x2 = mul(x, x);
  Fr x4 = mul(x2, x2);
  Fr x6 = mul(x4, x2);
  return mul(x6, x);
}

// ---------------------------------------------------------------------------
// constraint system (mirrors r1cs/system.py)
// ---------------------------------------------------------------------------

struct FrHash {
  size_t operator()(const Fr &a) const {
    u64 h = 1469598103934665603ULL;
    for (int i = 0; i < 4; ++i) {
      h ^= a.v[i];
      h *= 1099511628211ULL;
    }
    return (size_t)h;
  }
};

struct Term {
  i32 var;    // global variable id
  Fr coeff;   // Montgomery form, nonzero
};

using LC = std::vector<Term>;

struct Synth {
  i32 num_instance = 1;  // the constant ONE
  std::vector<Fr> instance_values;  // Montgomery
  std::vector<Fr> witness_values;   // Montgomery
  // CSR under construction: per matrix, flat terms + per-constraint offsets
  std::vector<i64> aptr{0}, bptr{0}, cptr{0};
  std::vector<i32> aidx, bidx, cidx, acoe, bcoe, ccoe;
  std::vector<Fr> pool;                              // Montgomery
  std::unordered_map<Fr, i32, FrHash> pool_map;
  int rc = 0;  // first error

  Synth() { instance_values.push_back(from_u64(1)); }

  i32 coeff_id(const Fr &c) {
    auto it = pool_map.find(c);
    if (it != pool_map.end()) return it->second;
    i32 id = (i32)pool.size();
    pool.push_back(c);
    pool_map.emplace(c, id);
    return id;
  }

  void push_lc(const LC &lc, std::vector<i32> &idx, std::vector<i32> &coe,
               std::vector<i64> &ptr) {
    for (const Term &t : lc) {
      idx.push_back(t.var);
      coe.push_back(coeff_id(t.coeff));
    }
    ptr.push_back((i64)idx.size());
  }
};

// FpVar: constant (lc empty, is_const) or linear combination
struct Var {
  bool is_const;
  Fr value;  // Montgomery
  LC lc;
};

struct CS {
  Synth &s;
  Fr one_m, zero_m;
  explicit CS(Synth &sy) : s(sy) {
    one_m = from_u64(1);
    zero_m = fr_zero();
  }

  Var constant(const Fr &v) { return Var{true, v, {}}; }
  Var constant_u64(u64 x) { return constant(from_u64(x)); }

  Var new_input(const Fr &v) {
    i32 idx = s.num_instance++;
    s.instance_values.push_back(v);
    Var out{false, v, {}};
    out.lc.push_back({idx, one_m});
    return out;
  }

  Var new_witness(const Fr &v) {
    i32 idx = 8 + (i32)s.witness_values.size();  // num_instance = 8 fixed
    s.witness_values.push_back(v);
    Var out{false, v, {}};
    out.lc.push_back({idx, one_m});
    return out;
  }

  // as_lc semantics: constant -> {var0: value} (empty when zero)
  LC as_lc(const Var &a) const {
    if (!a.is_const) return a.lc;
    if (is_zero(a.value)) return {};
    LC lc;
    lc.push_back({0, a.value});
    return lc;
  }

  void enforce(const Var &a, const Var &b, const Var &c) {
    s.push_lc(as_lc(a), s.aidx, s.acoe, s.aptr);
    s.push_lc(as_lc(b), s.bidx, s.bcoe, s.bptr);
    s.push_lc(as_lc(c), s.cidx, s.ccoe, s.cptr);
  }

  // merge: out = a + scale * b, dropping zero coefficients
  static LC merge(const LC &a, const LC &b, const Fr &bscale) {
    LC out = a;
    for (const Term &t : b) {
      Fr c = mul(t.coeff, bscale);
      bool found = false;
      for (Term &o : out) {
        if (o.var == t.var) {
          o.coeff = add_mod(o.coeff, c);
          found = true;
          break;
        }
      }
      if (!found) out.push_back({t.var, c});
    }
    LC res;
    res.reserve(out.size());
    for (const Term &t : out)
      if (!is_zero(t.coeff)) res.push_back(t);
    return res;
  }

  Var add(const Var &a, const Var &b) const {
    Fr v = add_mod(a.value, b.value);
    if (a.is_const && b.is_const) return Var{true, v, {}};
    return Var{false, v, merge(as_lc(a), as_lc(b), one_m)};
  }

  Var sub(const Var &a, const Var &b) const {
    Fr v = sub_mod(a.value, b.value);
    if (a.is_const && b.is_const) return Var{true, v, {}};
    Fr neg1 = sub_mod(fr_zero(), one_m);
    return Var{false, v, merge(as_lc(a), as_lc(b), neg1)};
  }

  Var scale(const Var &a, const Fr &k) const {
    Fr v = mul(a.value, k);
    if (a.is_const) return Var{true, v, {}};
    LC lc;
    lc.reserve(a.lc.size());
    for (const Term &t : a.lc) {
      Fr c = mul(t.coeff, k);
      if (!is_zero(c)) lc.push_back({t.var, c});
    }
    return Var{false, v, lc};
  }

  Var mul_var(const Var &a, const Var &b) {
    if (a.is_const) return scale(b, a.value);
    if (b.is_const) return scale(a, b.value);
    Var product = new_witness(mul(a.value, b.value));
    enforce(a, b, product);
    return product;
  }

  Var pow7_var(const Var &x) {
    if (x.is_const) return Var{true, pow7(x.value), {}};
    Var x2 = mul_var(x, x);
    Var x4 = mul_var(x2, x2);
    Var x6 = mul_var(x4, x2);
    return mul_var(x6, x);
  }

  void enforce_equal(const Var &a, const Var &b) {
    if (a.is_const && b.is_const) {
      if (!(a.value == b.value)) s.rc = 10;  // constant equality violated
      return;
    }
    Var diff = sub(a, b);
    Var onev{false, one_m, {}};
    onev.lc.push_back({0, one_m});
    enforce(diff, onev, constant(fr_zero()));
  }
};

// ---------------------------------------------------------------------------
// circuit gadgets (mirrors circuits/batch_mimc.py)
// ---------------------------------------------------------------------------

// 91 MiMC round constants (i+1)^3 + (i+1), Montgomery
static std::vector<Fr> mimc_rc() {
  std::vector<Fr> rc;
  rc.reserve(91);
  for (u64 i = 0; i < 91; ++i) {
    u64 idx = i + 1;
    rc.push_back(from_u64(idx * idx * idx + idx));
  }
  return rc;
}

struct Gadgets {
  CS &cs;
  std::vector<Fr> rc;
  explicit Gadgets(CS &c) : cs(c), rc(mimc_rc()) {}

  Var mimc_permute(Var x) {
    for (const Fr &c : rc) {
      Var t = cs.add(x, cs.constant(c));
      x = cs.pow7_var(t);
    }
    return x;
  }

  Var sponge(const std::vector<Var> &inputs) {
    Var state = cs.constant(fr_zero());
    for (const Var &inp : inputs) state = mimc_permute(cs.add(state, inp));
    return state;
  }

  Var hash2(const Var &a, const Var &b) {
    return sponge({cs.constant_u64(2), a, b});
  }
  Var hash3(const Var &a, const Var &b, const Var &c) {
    return sponge({cs.constant_u64(3), a, b, c});
  }
  Var hash4(const Var &a, const Var &b, const Var &c, const Var &d) {
    return sponge({cs.constant_u64(4), a, b, c, d});
  }
  Var account_leaf(const Var &pk, const Var &bal, const Var &nonce) {
    return sponge({cs.constant_u64(4), cs.constant_u64(1), pk, bal, nonce});
  }

  Var merkle_root(Var current, const std::vector<Var> &path,
                  const std::vector<Var> &indices) {
    for (size_t i = 0; i < path.size(); ++i) {
      const Var &sib = path[i];
      const Var &idx = indices[i];
      Var left = cs.add(cs.mul_var(idx, cs.sub(sib, current)), current);
      Var right = cs.add(cs.mul_var(idx, cs.sub(current, sib)), sib);
      current = hash2(left, right);
    }
    return current;
  }

  Var select(const Var &cond, const Var &a, const Var &b) {
    return cs.add(cs.mul_var(cond, cs.sub(a, b)), b);
  }

  void gated_assert_eq(const Var &valid, const Var &a, const Var &b) {
    cs.enforce(valid, cs.sub(a, b), cs.constant(fr_zero()));
  }

  void gated_range_check_geq(const Var &valid, const Var &balance,
                             const Var &amount, int bits = 64) {
    Var diff = cs.mul_var(valid, cs.sub(balance, amount));
    Fr canon = from_mont(diff.value);
    bool small = canon.v[1] == 0 && canon.v[2] == 0 && canon.v[3] == 0;
    Var acc = cs.constant(fr_zero());
    Fr two = from_u64(2);
    Fr p2 = from_u64(1);  // 2^i, Montgomery
    for (int i = 0; i < bits; ++i) {
      u64 bitval = small ? (canon.v[0] >> i) & 1 : 0;
      Var bit = cs.new_witness(from_u64(bitval));
      cs.enforce(bit, cs.sub(bit, cs.constant_u64(1)),
                 cs.constant(fr_zero()));
      acc = cs.add(acc, cs.scale(bit, p2));
      p2 = mul(p2, two);
    }
    cs.enforce_equal(acc, diff);
  }

  Var bool_witness(bool flag) {
    Var b = cs.new_witness(from_u64(flag ? 1 : 0));
    cs.enforce(b, cs.sub(b, cs.constant_u64(1)), cs.constant(fr_zero()));
    return b;
  }
};

// read one canonical field value, advance cursor
static Fr next_fr(const u64 *&p) {
  Fr a;
  std::memcpy(a.v, p, 32);
  p += 4;
  return to_mont(a);
}

struct Handle {
  Synth synth;
};

}  // namespace

extern "C" {

// Synthesize the chunk circuit. All inputs are canonical LE 4xu64 field
// values, laid out in the exact order the Python circuit reads them:
//   pub7:       pre_state, post_state, pre_shielded, post_shielded,
//               wd_root, batch_hash, batch_id
//   transfers:  per slot: is_valid, sender_pk, sender_bal, sender_nonce,
//               recv_pk, recv_bal, recv_nonce, amount, signature,
//               spath[d], sidx[d], rpath[d], ridx[d]        (9 + 4d values)
//   withdrawals: is_valid, sender_pk, sender_bal, sender_nonce,
//               l1_recipient, amount, signature, spath[d], sidx[d] (7 + 2d)
//   shielded:   is_valid, skip, in_owner, in_value, in_blinding,
//               in_position, spending_key, out_owner, out_value,
//               out_blinding, out_cm_given, nullifier, ipath[d], iidx[d]
//                                                           (12 + 2d)
//   finals:     num_transfers, num_withdrawals, num_shielded
// Returns a handle (or null on error).
void *zelana_chunk_synth(const u64 *pub7, const u64 *transfers,
                         const u64 *withdrawals, const u64 *shielded,
                         const u64 *finals, i32 max_t, i32 max_w, i32 max_s,
                         i32 depth) {
  Handle *h = new Handle();
  Synth &sy = h->synth;
  CS cs(sy);
  Gadgets g(cs);
  const int d = depth;

  const u64 *p = pub7;
  Var pre_state = cs.new_input(next_fr(p));
  Var post_state = cs.new_input(next_fr(p));
  Var pre_shielded = cs.new_input(next_fr(p));
  Var post_shielded = cs.new_input(next_fr(p));
  Var wd_root_pub = cs.new_input(next_fr(p));
  Var batch_hash_pub = cs.new_input(next_fr(p));
  Var batch_id = cs.new_input(next_fr(p));

  Var current_state = pre_state;
  Var current_shielded = pre_shielded;
  Var batch_acc = g.hash2(cs.constant_u64(4), batch_id);
  Var wd_acc = g.hash2(cs.constant_u64(5), batch_id);

  auto path_vars = [&](const u64 *&q, std::vector<Var> &pv,
                       std::vector<Var> &iv) {
    pv.clear();
    iv.clear();
    for (int i = 0; i < d; ++i) pv.push_back(cs.new_witness(next_fr(q)));
    for (int i = 0; i < d; ++i) {
      Var x = cs.new_witness(next_fr(q));
      cs.enforce(x, cs.sub(x, cs.constant_u64(1)), cs.constant(fr_zero()));
      iv.push_back(x);
    }
  };

  // -- transfers --
  for (int t = 0; t < max_t; ++t) {
    const u64 *q = transfers + (i64)t * (9 + 4 * d) * 4;
    Fr valid_f = next_fr(q);
    Var valid = g.bool_witness(!is_zero(valid_f));
    Var sender_pk = cs.new_witness(next_fr(q));
    Var sender_bal = cs.new_witness(next_fr(q));
    Var sender_nonce = cs.new_witness(next_fr(q));
    Var recv_pk = cs.new_witness(next_fr(q));
    Var recv_bal = cs.new_witness(next_fr(q));
    Var recv_nonce = cs.new_witness(next_fr(q));
    Var amount = cs.new_witness(next_fr(q));
    Fr sig_f = next_fr(q);
    Var signature = cs.new_witness(sig_f);
    std::vector<Var> spath, sidx, rpath, ridx;
    path_vars(q, spath, sidx);
    path_vars(q, rpath, ridx);

    Var sender_leaf = g.account_leaf(sender_pk, sender_bal, sender_nonce);
    Var computed_root = g.merkle_root(sender_leaf, spath, sidx);
    g.gated_assert_eq(valid, computed_root, current_state);

    g.gated_range_check_geq(valid, sender_bal, amount);

    Var tx_hash = g.hash4(sender_pk, recv_pk, amount, sender_nonce);
    Var sig_inv = cs.new_witness(is_zero(sig_f) ? fr_zero() : inv_fr(sig_f));
    g.gated_assert_eq(valid, cs.mul_var(signature, sig_inv),
                      cs.constant_u64(1));

    Var new_sender_leaf = g.account_leaf(
        sender_pk, cs.sub(sender_bal, amount),
        cs.add(sender_nonce, cs.constant_u64(1)));
    Var root_after_debit = g.merkle_root(new_sender_leaf, spath, sidx);

    Var recv_leaf = g.account_leaf(recv_pk, recv_bal, recv_nonce);
    Var recv_root = g.merkle_root(recv_leaf, rpath, ridx);
    g.gated_assert_eq(valid, recv_root, root_after_debit);

    Var new_recv_leaf = g.account_leaf(recv_pk, cs.add(recv_bal, amount),
                                       recv_nonce);
    Var root_after_credit = g.merkle_root(new_recv_leaf, rpath, ridx);

    current_state = g.select(valid, root_after_credit, current_state);
    batch_acc = g.select(valid, g.hash3(batch_acc, tx_hash, amount),
                         batch_acc);
  }

  // -- withdrawals --
  for (int w = 0; w < max_w; ++w) {
    const u64 *q = withdrawals + (i64)w * (7 + 2 * d) * 4;
    Fr valid_f = next_fr(q);
    Var valid = g.bool_witness(!is_zero(valid_f));
    Var sender_pk = cs.new_witness(next_fr(q));
    Var sender_bal = cs.new_witness(next_fr(q));
    Var sender_nonce = cs.new_witness(next_fr(q));
    Var l1_recipient = cs.new_witness(next_fr(q));
    Var amount = cs.new_witness(next_fr(q));
    Fr sig_f = next_fr(q);
    Var signature = cs.new_witness(sig_f);
    std::vector<Var> spath, sidx;
    path_vars(q, spath, sidx);

    Var sender_leaf = g.account_leaf(sender_pk, sender_bal, sender_nonce);
    Var computed_root = g.merkle_root(sender_leaf, spath, sidx);
    g.gated_assert_eq(valid, computed_root, current_state);

    g.gated_range_check_geq(valid, sender_bal, amount);

    Var sig_inv = cs.new_witness(is_zero(sig_f) ? fr_zero() : inv_fr(sig_f));
    g.gated_assert_eq(valid, cs.mul_var(signature, sig_inv),
                      cs.constant_u64(1));

    Var new_leaf = g.account_leaf(sender_pk, cs.sub(sender_bal, amount),
                                  cs.add(sender_nonce, cs.constant_u64(1)));
    Var new_root = g.merkle_root(new_leaf, spath, sidx);
    current_state = g.select(valid, new_root, current_state);

    Var wd_hash = g.hash3(l1_recipient, amount, sender_pk);
    wd_acc = g.select(valid, g.hash2(wd_acc, wd_hash), wd_acc);
    batch_acc = g.select(valid, g.hash3(batch_acc, wd_hash, amount),
                         batch_acc);
  }

  // -- shielded --
  for (int si = 0; si < max_s; ++si) {
    const u64 *q = shielded + (i64)si * (12 + 2 * d) * 4;
    Fr valid_f = next_fr(q);
    Var valid = g.bool_witness(!is_zero(valid_f));
    Fr skip_f = next_fr(q);
    Var skip = g.bool_witness(!is_zero(skip_f));
    Var in_owner = cs.new_witness(next_fr(q));
    Var in_value = cs.new_witness(next_fr(q));
    Var in_blinding = cs.new_witness(next_fr(q));
    Var in_position = cs.new_witness(next_fr(q));
    Var spending_key = cs.new_witness(next_fr(q));
    Var out_owner = cs.new_witness(next_fr(q));
    Var out_value = cs.new_witness(next_fr(q));
    Var out_blinding = cs.new_witness(next_fr(q));
    Var out_cm_given = cs.new_witness(next_fr(q));
    Var nullifier = cs.new_witness(next_fr(q));
    std::vector<Var> ipath, iidx;
    path_vars(q, ipath, iidx);

    Var full = cs.mul_var(valid, cs.sub(cs.constant_u64(1), skip));
    Var input_cm = g.hash3(in_owner, in_value, in_blinding);
    Var computed_root = g.merkle_root(input_cm, ipath, iidx);
    g.gated_assert_eq(full, computed_root, current_shielded);

    Var computed_nf = g.sponge({cs.constant_u64(4), cs.constant_u64(3),
                                spending_key, input_cm, in_position});
    g.gated_assert_eq(full, computed_nf, nullifier);
    g.gated_assert_eq(full, in_value, out_value);

    Var out_cm_full = g.hash3(out_owner, out_value, out_blinding);
    Var out_cm = g.select(skip, out_cm_given, out_cm_full);

    Var new_shielded = g.hash2(current_shielded, out_cm);
    current_shielded = g.select(valid, new_shielded, current_shielded);
    batch_acc = g.select(valid, g.hash3(batch_acc, nullifier, out_cm),
                         batch_acc);
  }

  // -- finalize --
  const u64 *f = finals;
  Var n_t = cs.new_witness(next_fr(f));
  Var n_w = cs.new_witness(next_fr(f));
  Var n_s = cs.new_witness(next_fr(f));
  Var final_batch = g.hash4(batch_acc, n_t, n_w, n_s);
  Var final_wd = g.hash2(wd_acc, n_w);

  cs.enforce_equal(current_state, post_state);
  cs.enforce_equal(current_shielded, post_shielded);
  cs.enforce_equal(final_wd, wd_root_pub);
  cs.enforce_equal(final_batch, batch_hash_pub);

  return h;
}

// sizes[7]: num_instance, num_witness, num_constraints, nnzA, nnzB, nnzC,
//           pool size
void zelana_chunk_sizes(void *hp, i64 *sizes) {
  Synth &s = ((Handle *)hp)->synth;
  sizes[0] = s.num_instance;
  sizes[1] = (i64)s.witness_values.size();
  sizes[2] = (i64)s.aptr.size() - 1;
  sizes[3] = (i64)s.aidx.size();
  sizes[4] = (i64)s.bidx.size();
  sizes[5] = (i64)s.cidx.size();
  sizes[6] = (i64)s.pool.size();
}

// Export: z (canonical, (ni+nw)*4 u64), CSR ptr/idx/coe per matrix, pool
// (canonical). Buffers are caller-allocated per zelana_chunk_sizes.
void zelana_chunk_export(void *hp, u64 *z, i64 *aptr, i32 *aidx, i32 *acoe,
                         i64 *bptr, i32 *bidx, i32 *bcoe, i64 *cptr,
                         i32 *cidx, i32 *ccoe, u64 *pool) {
  Synth &s = ((Handle *)hp)->synth;
  i64 k = 0;
  for (const Fr &v : s.instance_values) {
    Fr c = from_mont(v);
    std::memcpy(z + 4 * k++, c.v, 32);
  }
  for (const Fr &v : s.witness_values) {
    Fr c = from_mont(v);
    std::memcpy(z + 4 * k++, c.v, 32);
  }
  std::memcpy(aptr, s.aptr.data(), s.aptr.size() * 8);
  std::memcpy(bptr, s.bptr.data(), s.bptr.size() * 8);
  std::memcpy(cptr, s.cptr.data(), s.cptr.size() * 8);
  std::memcpy(aidx, s.aidx.data(), s.aidx.size() * 4);
  std::memcpy(bidx, s.bidx.data(), s.bidx.size() * 4);
  std::memcpy(cidx, s.cidx.data(), s.cidx.size() * 4);
  std::memcpy(acoe, s.acoe.data(), s.acoe.size() * 4);
  std::memcpy(bcoe, s.bcoe.data(), s.bcoe.size() * 4);
  std::memcpy(ccoe, s.ccoe.data(), s.ccoe.size() * 4);
  for (size_t i = 0; i < s.pool.size(); ++i) {
    Fr c = from_mont(s.pool[i]);
    std::memcpy(pool + 4 * i, c.v, 32);
  }
}

void zelana_chunk_free(void *hp) { delete (Handle *)hp; }

// ---------------------------------------------------------------------------
// stateless CSR helpers (prove/keygen host hot paths)
// ---------------------------------------------------------------------------

// out[r] = sum_j pool[coe[j]] * z[idx[j]] mod p. Canonical input; output
// canonical, or Montgomery form when mont_out != 0 (the device NTT
// consumes Montgomery limb planes -- skips a 6M-element host conversion).
void zelana_csr_matvec(const i64 *ptr, const i32 *idx, const i32 *coe,
                       const u64 *pool, i64 npool, const u64 *z, i64 nz,
                       i64 rows, u64 *out, i32 mont_out) {
  std::vector<Fr> pm((size_t)npool), zm((size_t)nz);
  for (i64 i = 0; i < npool; ++i) {
    Fr a;
    std::memcpy(a.v, pool + 4 * i, 32);
    pm[i] = to_mont(a);
  }
  for (i64 i = 0; i < nz; ++i) {
    Fr a;
    std::memcpy(a.v, z + 4 * i, 32);
    zm[i] = to_mont(a);
  }
  for (i64 r = 0; r < rows; ++r) {
    Fr acc = fr_zero();
    for (i64 j = ptr[r]; j < ptr[r + 1]; ++j)
      acc = add_mod(acc, mul(pm[coe[j]], zm[idx[j]]));
    Fr c = mont_out ? acc : from_mont(acc);
    std::memcpy(out + 4 * r, c.v, 32);
  }
}

// Montgomery -> canonical batch conversion ((n, 4) u64 limbs in place-able:
// in and out may alias). Used to decode device NTT output without a
// per-element Python pass.
void zelana_from_mont_batch(const u64 *in, i64 n, u64 *out) {
  for (i64 i = 0; i < n; ++i) {
    Fr a;
    std::memcpy(a.v, in + 4 * i, 32);
    Fr c = from_mont(a);
    std::memcpy(out + 4 * i, c.v, 32);
  }
}

// Generic-modulus CIOS Montgomery multiply (ANY odd 256-bit modulus; the
// MSM point pools and keygen tails are over Fq, not the baked-in Fr).
// mod: canonical limbs; inv = -mod^{-1} mod 2^64.
static void mmul_any(const u64 a[4], const u64 b[4], const u64 *mod,
                     u64 inv, u64 res[4]) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)t[j] + (u128)a[i] * b[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (u64)cur;
    t[5] = (u64)(cur >> 64);
    u64 m = t[0] * inv;
    carry = ((u128)t[0] + (u128)m * mod[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 cur2 = (u128)t[j] + (u128)m * mod[j] + carry;
      t[j - 1] = (u64)cur2;
      carry = cur2 >> 64;
    }
    u128 cur3 = (u128)t[4] + carry;
    t[3] = (u64)cur3;
    t[4] = t[5] + (u64)(cur3 >> 64);
  }
  bool ge = t[4] != 0;
  if (!ge) {
    ge = true;
    for (int i = 3; i >= 0; --i) {
      if (t[i] != mod[i]) { ge = t[i] > mod[i]; break; }
    }
  }
  if (ge) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
      u128 d = (u128)t[i] - mod[i] - borrow;
      t[i] = (u64)d;
      borrow = (d >> 64) & 1;
    }
  }
  std::memcpy(res, t, 32);
}

// Generic-modulus Montgomery encode: out[i] = in[i] * 2^256 mod m
// (Python's per-element encode_mont is minutes at a production key's
// 5.7M points). mod/r2: canonical limbs; inv = -mod^{-1} mod 2^64.
void zelana_mont_encode_any(const u64 *in, i64 n, const u64 *mod,
                            const u64 *r2, u64 inv, u64 *out) {
  for (i64 i = 0; i < n; ++i) mmul_any(in + 4 * i, r2, mod, inv, out + 4 * i);
}

static void add_any(const u64 a[4], const u64 b[4], const u64 *mod,
                    u64 res[4]) {
  u64 t[4];
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a[i] + b[i] + carry;
    t[i] = (u64)s;
    carry = s >> 64;
  }
  bool ge = carry != 0;
  if (!ge) {
    ge = true;
    for (int i = 3; i >= 0; --i) {
      if (t[i] != mod[i]) { ge = t[i] > mod[i]; break; }
    }
  }
  if (ge) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
      u128 d = (u128)t[i] - mod[i] - borrow;
      t[i] = (u64)d;
      borrow = (d >> 64) & 1;
    }
  }
  std::memcpy(res, t, 32);
}

static void neg_any(const u64 a[4], const u64 *mod, u64 res[4]) {
  bool zero = !(a[0] | a[1] | a[2] | a[3]);
  if (zero) {
    std::memset(res, 0, 32);
    return;
  }
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)mod[i] - a[i] - borrow;
    res[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

// Batch projective -> affine over Fq2 = Fq[u]/(u^2+1) (BN254 G2).
// Coordinates are (c0, c1) pairs of Montgomery Fq limbs laid out as
// (n, 8) u64 per coordinate array. Fq2 inversion routes through ONE
// batched Fq inversion of the norms c0^2 + c1^2.
void zelana_proj_affine_fq2(const u64 *xs, const u64 *ys, const u64 *zs,
                            i64 n, const u64 *mod, const u64 *r2, u64 inv,
                            u64 *out_xy, unsigned char *out_inf) {
  u64 one_cl[4] = {1, 0, 0, 0};
  u64 one_m[4];
  mmul_any(one_cl, r2, mod, inv, one_m);
  auto is_zero2 = [](const u64 *v) {
    return !(v[0] | v[1] | v[2] | v[3] | v[4] | v[5] | v[6] | v[7]);
  };
  // norms of the non-zero Zs (Montgomery domain)
  std::vector<u64> norm(n * 4);
  for (i64 i = 0; i < n; ++i) {
    const u64 *z = zs + 8 * i;
    if (is_zero2(z)) {
      std::memcpy(norm.data() + 4 * i, one_m, 32);
      continue;
    }
    u64 a2[4], b2[4];
    mmul_any(z, z, mod, inv, a2);
    mmul_any(z + 4, z + 4, mod, inv, b2);
    add_any(a2, b2, mod, norm.data() + 4 * i);
  }
  // batch-invert the norms (prefix products + one exponentiation)
  std::vector<u64> prefix((n + 1) * 4);
  std::memcpy(prefix.data(), one_m, 32);
  for (i64 i = 0; i < n; ++i)
    mmul_any(prefix.data() + 4 * i, norm.data() + 4 * i, mod, inv,
             prefix.data() + 4 * (i + 1));
  u64 e[4];
  std::memcpy(e, mod, 32);
  e[0] -= 2;
  u64 acc[4], base[4];
  std::memcpy(acc, one_m, 32);
  std::memcpy(base, prefix.data() + 4 * n, 32);
  for (int bit = 255; bit >= 0; --bit) {
    mmul_any(acc, acc, mod, inv, acc);
    if ((e[bit / 64] >> (bit % 64)) & 1) mmul_any(acc, base, mod, inv, acc);
  }
  std::vector<u64> ninv(n * 4);
  for (i64 i = n - 1; i >= 0; --i) {
    mmul_any(acc, prefix.data() + 4 * i, mod, inv, ninv.data() + 4 * i);
    mmul_any(acc, norm.data() + 4 * i, mod, inv, acc);
  }
  // zinv = (z0 * ninv, -z1 * ninv); affine = coord * zinv (Fq2 mul);
  // then Montgomery -> canonical
  for (i64 i = 0; i < n; ++i) {
    const u64 *z = zs + 8 * i;
    u64 *out = out_xy + 16 * i;
    if (is_zero2(z)) {
      out_inf[i] = 1;
      std::memset(out, 0, 128);
      continue;
    }
    out_inf[i] = 0;
    u64 zi0[4], zi1[4], t[4];
    mmul_any(z, ninv.data() + 4 * i, mod, inv, zi0);
    mmul_any(z + 4, ninv.data() + 4 * i, mod, inv, t);
    neg_any(t, mod, zi1);
    const u64 *coords[2] = {xs + 8 * i, ys + 8 * i};
    for (int c = 0; c < 2; ++c) {
      const u64 *v = coords[c];
      // (v0 + v1 u)(zi0 + zi1 u) = (v0 zi0 - v1 zi1) + (v0 zi1 + v1 zi0) u
      u64 p00[4], p11[4], p01[4], p10[4], r0[4], r1[4], n11[4];
      mmul_any(v, zi0, mod, inv, p00);
      mmul_any(v + 4, zi1, mod, inv, p11);
      mmul_any(v, zi1, mod, inv, p01);
      mmul_any(v + 4, zi0, mod, inv, p10);
      neg_any(p11, mod, n11);
      add_any(p00, n11, mod, r0);
      add_any(p01, p10, mod, r1);
      mmul_any(r0, one_cl, mod, inv, out + 8 * c);
      mmul_any(r1, one_cl, mod, inv, out + 8 * c + 4);
    }
  }
}

// Batch projective -> affine over ANY modulus: Montgomery-domain inputs
// (X, Y, Z as (n,4) u64 limbs), canonical affine outputs (n, 8) +
// infinity mask. ONE modular inversion total (Montgomery batch
// inversion); this is the keygen host tail that was per-element Python
// bigints over ~7M points at the production chunk shape.
void zelana_proj_affine_any(const u64 *xs, const u64 *ys, const u64 *zs,
                            i64 n, const u64 *mod, const u64 *r2, u64 inv,
                            u64 *out_xy, unsigned char *out_inf) {
  u64 one_cl[4] = {1, 0, 0, 0};
  u64 one_m[4]; // R mod p = mont(1)
  mmul_any(one_cl, r2, mod, inv, one_m);
  auto is_zero = [](const u64 *v) {
    return !(v[0] | v[1] | v[2] | v[3]);
  };
  // prefix products of the non-zero Zs
  std::vector<u64> prefix((n + 1) * 4);
  std::memcpy(prefix.data(), one_m, 32);
  for (i64 i = 0; i < n; ++i) {
    const u64 *z = zs + 4 * i;
    const u64 *use = is_zero(z) ? one_m : z;
    mmul_any(prefix.data() + 4 * i, use, mod, inv, prefix.data() + 4 * (i + 1));
  }
  // invert the total: acc = total^(p-2) via square-and-multiply (the
  // exponent is the canonical modulus minus 2)
  u64 e[4];
  std::memcpy(e, mod, 32);
  // e = mod - 2 (mod is odd so no deep borrow)
  e[0] -= 2;
  u64 acc[4], base[4];
  std::memcpy(acc, one_m, 32);
  std::memcpy(base, prefix.data() + 4 * n, 32);
  for (int bit = 255; bit >= 0; --bit) {
    mmul_any(acc, acc, mod, inv, acc);
    if ((e[bit / 64] >> (bit % 64)) & 1) mmul_any(acc, base, mod, inv, acc);
  }
  // walk back: zinv_i = acc * prefix_i; acc *= z_i
  std::vector<u64> zinv(n * 4);
  for (i64 i = n - 1; i >= 0; --i) {
    const u64 *z = zs + 4 * i;
    const u64 *use = is_zero(z) ? one_m : z;
    mmul_any(acc, prefix.data() + 4 * i, mod, inv, zinv.data() + 4 * i);
    mmul_any(acc, use, mod, inv, acc);
  }
  for (i64 i = 0; i < n; ++i) {
    const u64 *z = zs + 4 * i;
    if (is_zero(z)) {
      out_inf[i] = 1;
      std::memset(out_xy + 8 * i, 0, 64);
      continue;
    }
    out_inf[i] = 0;
    u64 xm[4], ym[4];
    mmul_any(xs + 4 * i, zinv.data() + 4 * i, mod, inv, xm);
    mmul_any(ys + 4 * i, zinv.data() + 4 * i, mod, inv, ym);
    // Montgomery -> canonical: multiply by 1
    mmul_any(xm, one_cl, mod, inv, out_xy + 8 * i);
    mmul_any(ym, one_cl, mod, inv, out_xy + 8 * i + 4);
  }
}

// out[j] = scale * t^j for j < m (keygen h_query scalars), canonical I/O.
void zelana_powers_scaled(const u64 *t_in, const u64 *scale_in, i64 m,
                          u64 *out) {
  Fr t, scale;
  std::memcpy(t.v, t_in, 32);
  std::memcpy(scale.v, scale_in, 32);
  t = to_mont(t);
  scale = to_mont(scale);
  Fr acc = scale;
  for (i64 j = 0; j < m; ++j) {
    Fr c = from_mont(acc);
    std::memcpy(out + 4 * j, c.v, 32);
    acc = mul(acc, t);
  }
}

// out[i] = (beta*a[i] + alpha*b[i] + c[i]) * scale (keygen l/abc scalars),
// canonical I/O.
void zelana_abc_combine(const u64 *a, const u64 *b, const u64 *c,
                        const u64 *beta_in, const u64 *alpha_in,
                        const u64 *scale_in, i64 n, u64 *out) {
  Fr beta, alpha, scale;
  std::memcpy(beta.v, beta_in, 32);
  std::memcpy(alpha.v, alpha_in, 32);
  std::memcpy(scale.v, scale_in, 32);
  beta = to_mont(beta);
  alpha = to_mont(alpha);
  scale = to_mont(scale);
  for (i64 i = 0; i < n; ++i) {
    Fr av, bv, cv;
    std::memcpy(av.v, a + 4 * i, 32);
    std::memcpy(bv.v, b + 4 * i, 32);
    std::memcpy(cv.v, c + 4 * i, 32);
    av = to_mont(av);
    bv = to_mont(bv);
    cv = to_mont(cv);
    Fr s = add_mod(add_mod(mul(beta, av), mul(alpha, bv)), cv);
    Fr o = from_mont(mul(s, scale));
    std::memcpy(out + 4 * i, o.v, 32);
  }
}

// R1CS satisfaction: returns -1 if satisfied, else first violated row.
i64 zelana_csr_check(const i64 *aptr, const i32 *aidx, const i32 *acoe,
                     const i64 *bptr, const i32 *bidx, const i32 *bcoe,
                     const i64 *cptr, const i32 *cidx, const i32 *ccoe,
                     const u64 *pool, i64 npool, const u64 *z, i64 nz,
                     i64 rows) {
  std::vector<Fr> pm((size_t)npool), zm((size_t)nz);
  for (i64 i = 0; i < npool; ++i) {
    Fr a;
    std::memcpy(a.v, pool + 4 * i, 32);
    pm[i] = to_mont(a);
  }
  for (i64 i = 0; i < nz; ++i) {
    Fr a;
    std::memcpy(a.v, z + 4 * i, 32);
    zm[i] = to_mont(a);
  }
  auto row_eval = [&](const i64 *ptr, const i32 *idx, const i32 *coe,
                      i64 r) {
    Fr acc = fr_zero();
    for (i64 j = ptr[r]; j < ptr[r + 1]; ++j)
      acc = add_mod(acc, mul(pm[coe[j]], zm[idx[j]]));
    return acc;
  };
  for (i64 r = 0; r < rows; ++r) {
    Fr av = row_eval(aptr, aidx, acoe, r);
    Fr bv = row_eval(bptr, bidx, bcoe, r);
    Fr cv = row_eval(cptr, cidx, ccoe, r);
    if (!(mul(av, bv) == cv)) return r;
  }
  return -1;
}

// QAP evaluation at t: accumulates coeff * u[row] into per-variable sums.
// u: Lagrange coefficients u_r(t), canonical, length >= rows.
// out: num_vars canonical values (caller-zeroed not required).
void zelana_qap_accumulate(const i64 *ptr, const i32 *idx, const i32 *coe,
                           const u64 *pool, i64 npool, const u64 *u,
                           i64 rows, i64 num_vars, u64 *out) {
  std::vector<Fr> pm((size_t)npool), um((size_t)rows);
  for (i64 i = 0; i < npool; ++i) {
    Fr a;
    std::memcpy(a.v, pool + 4 * i, 32);
    pm[i] = to_mont(a);
  }
  for (i64 i = 0; i < rows; ++i) {
    Fr a;
    std::memcpy(a.v, u + 4 * i, 32);
    um[i] = to_mont(a);
  }
  std::vector<Fr> acc((size_t)num_vars, fr_zero());
  for (i64 r = 0; r < rows; ++r) {
    const Fr &ur = um[r];
    for (i64 j = ptr[r]; j < ptr[r + 1]; ++j)
      acc[idx[j]] = add_mod(acc[idx[j]], mul(pm[coe[j]], ur));
  }
  for (i64 i = 0; i < num_vars; ++i) {
    Fr c = from_mont(acc[i]);
    std::memcpy(out + 4 * i, c.v, 32);
  }
}

// Lagrange coefficients u_r(t) = Z(t) * m_inv * w^r / (t - w^r) over a
// radix-2 domain of size m with generator w (all canonical I/O). If t is
// in the domain, u is the Kronecker delta. zt_out receives Z(t).
void zelana_lagrange_at(const u64 *group_gen, const u64 *size_inv,
                        const u64 *t_in, i64 m, u64 *u, u64 *zt_out) {
  Fr w, minv, t;
  std::memcpy(w.v, group_gen, 32);
  std::memcpy(minv.v, size_inv, 32);
  std::memcpy(t.v, t_in, 32);
  w = to_mont(w);
  minv = to_mont(minv);
  t = to_mont(t);
  // Z(t) = t^m - 1
  u64 e[4] = {(u64)m, 0, 0, 0};
  Fr tm = pow_fr(t, e);
  Fr zt = sub_mod(tm, from_u64(1));
  {
    Fr c = from_mont(zt);
    std::memcpy(zt_out, c.v, 32);
  }
  if (is_zero(zt)) {
    Fr wr = from_u64(1);
    for (i64 r = 0; r < m; ++r) {
      Fr c = (wr == t) ? Fr{{1, 0, 0, 0}} : fr_zero();
      std::memcpy(u + 4 * r, c.v, 32);
      wr = mul(wr, w);
    }
    return;
  }
  // batch inversion of (t - w^r)
  std::vector<Fr> diffs((size_t)m), prefix((size_t)m + 1);
  Fr wr = from_u64(1);
  prefix[0] = from_u64(1);
  for (i64 r = 0; r < m; ++r) {
    diffs[r] = sub_mod(t, wr);
    prefix[r + 1] = mul(prefix[r], diffs[r]);
    wr = mul(wr, w);
  }
  Fr inv_total = inv_fr(prefix[m]);
  std::vector<Fr> invs((size_t)m);
  for (i64 r = m - 1; r >= 0; --r) {
    invs[r] = mul(inv_total, prefix[r]);
    inv_total = mul(inv_total, diffs[r]);
  }
  Fr zm = mul(zt, minv);
  wr = from_u64(1);
  for (i64 r = 0; r < m; ++r) {
    Fr val = mul(mul(zm, wr), invs[r]);
    Fr c = from_mont(val);
    std::memcpy(u + 4 * r, c.v, 32);
    wr = mul(wr, w);
  }
}

}  // extern "C"
