// Native MSM tape builder (prover host hot path).
//
// Builds the uniform-step pair-reduction tape consumed by
// zelana_tpu/ops/msm_fast.py::_run_tape: counting sort of (window, digit)
// keys, round-0 pairing of original points (the mixed-kernel prefix), then
// a GREEDY dataflow schedule for everything after -- later reduction
// levels and the bucket bit-subset phase share steps with no per-round
// barrier, so general steps are ~fully packed instead of ~80% (each round
// otherwise pads its tail step). A pair is eligible for the current step
// only if both operands were written in strictly earlier steps (slot <
// the step's output base); too-fresh items defer to a later pass, which
// only ever bites on the last few lanes of a level. Mixed prefix and
// general phase each pad to a multiple of 4 steps so program shapes
// repeat across proves.
//
// Pairing differs from the numpy fallback builder only in which equal-key
// items pair together and in step packing; any pairing is algebraically
// equivalent (point addition is commutative/associative).
//
// Build: g++ -O3 -shared -fPIC -o libzelana_tape.so msm_tape.cpp
//
// Reference counterpart: the bucket scheduling inside ark-groth16's
// Pippenger MSM (SURVEY.md section 2.1, "Groth16 prove engine").

#include <cstdint>
#include <cstring>
#include <vector>

using i32 = int32_t;
using i64 = int64_t;

namespace {

struct Emitter {
  i32 *idx;          // (max_steps, 2, S)
  int S;
  int max_steps;
  int steps = 0;
  i64 base;          // next output slot (== a0 + steps * S)
  int lane = 0;      // lanes filled in the current (partial) step
  bool overflow = false;

  explicit Emitter(i32 *idx_, int S_, int max_steps_, i64 a0)
      : idx(idx_), S(S_), max_steps(max_steps_), base(a0) {}

  // Append one (a, b) pair; returns the output slot id.
  i64 pair(i64 a, i64 b) {
    if (lane == 0) {
      if (steps >= max_steps) {
        overflow = true;
        return 0;
      }
      std::memset(idx + (i64)steps * 2 * S, 0, sizeof(i32) * 2 * S);
    }
    i64 out = base + (i64)lane;
    i32 *row = idx + (i64)steps * 2 * S;
    row[lane] = (i32)a;
    row[S + lane] = (i32)b;
    if (++lane == S) {
      lane = 0;
      steps += 1;
      base += S;
    }
    return out;
  }

  // Close the current round: pad the partial step, advance to a step edge.
  void close_round() {
    if (lane > 0) {
      lane = 0;
      steps += 1;
      base += S;
    }
  }

  // Pad with no-op steps until (steps - from) % 4 == 0.
  void pad(int from) {
    while ((steps - from) % 4 != 0) {
      if (steps >= max_steps) {
        overflow = true;
        return;
      }
      std::memset(idx + (i64)steps * 2 * S, 0, sizeof(i32) * 2 * S);
      steps += 1;
      base += S;
    }
  }

  void noop_step() {
    if (steps >= max_steps) {
      overflow = true;
      return;
    }
    std::memset(idx + (i64)steps * 2 * S, 0, sizeof(i32) * 2 * S);
    steps += 1;
    base += S;
  }
};

// One pair-reduction pass over key-sorted (keys, items). Survivors replace
// the input arrays (still sorted). Returns true if any pair was emitted.
bool reduce_iter(std::vector<i32> &keys, std::vector<i64> &items,
                 Emitter &em) {
  size_t m = keys.size();
  size_t w = 0;
  bool any = false;
  size_t i = 0;
  while (i < m) {
    size_t j = i;
    while (j + 1 < m && keys[j + 1] == keys[i]) ++j;  // run [i, j]
    size_t len = j - i + 1;
    for (size_t k = 0; k + 1 < len; k += 2) {
      i64 out = em.pair(items[i + k], items[i + k + 1]);
      keys[w] = keys[i];
      items[w] = out;
      ++w;
      any = true;
    }
    if (len & 1) {
      keys[w] = keys[i];
      items[w] = items[j];
      ++w;
    }
    i = j + 1;
  }
  keys.resize(w);
  items.resize(w);
  if (any) em.close_round();
  return any;
}

// One pair-reduction pass WITHOUT a round barrier: equal-key items pair
// greedily, but a pair is emitted only when both operands come from
// strictly earlier steps (slot < em.base, the current step's first output
// slot); fresher items survive to a later pass. Emitting pairs can wrap
// the step and raise em.base, so eligibility is rechecked per item.
bool greedy_iter(std::vector<i32> &keys, std::vector<i64> &items,
                 Emitter &em) {
  size_t m = keys.size();
  size_t w = 0;
  bool any = false;
  size_t i = 0;
  while (i < m) {
    size_t j = i;
    while (j + 1 < m && keys[j + 1] == keys[i]) ++j;  // run [i, j]
    i64 pending = -1;
    for (size_t k = i; k <= j; ++k) {
      i64 it = items[k];
      if (it >= em.base) {  // written in the current step: not yet readable
        keys[w] = keys[i];
        items[w] = it;
        ++w;
        continue;
      }
      if (pending < 0) {
        pending = it;
        continue;
      }
      i64 out = em.pair(pending, it);
      keys[w] = keys[i];
      items[w] = out;
      ++w;
      any = true;
      pending = -1;
    }
    if (pending >= 0) {
      keys[w] = keys[i];
      items[w] = pending;
      ++w;
    }
    i = j + 1;
  }
  keys.resize(w);
  items.resize(w);
  return any;
}

// Greedily reduce until every key is unique. If a pass makes no progress
// (all remaining duplicates were written in the current partial step),
// close the step so they become readable; with an empty partial step every
// item is readable, so each iteration either pairs or advances.
void reduce_greedy(std::vector<i32> &keys, std::vector<i64> &items,
                   Emitter &em) {
  while (!em.overflow) {
    bool dup = false;
    for (size_t k = 1; k < keys.size(); ++k)
      if (keys[k] == keys[k - 1]) {
        dup = true;
        break;
      }
    if (!dup) return;
    if (!greedy_iter(keys, items, em)) em.close_round();
  }
}

}  // namespace

extern "C" {

// digits: (w, n) int32 row-major, values in [0, n_buckets).
// idx_out: caller-allocated (max_steps, 2, S) int32.
// finals_out: (window_bits * w) int32.
// meta_out: [steps, mixed_steps, base_end].
// Returns 0 on success, -1 on overflow (idx_out too small).
int zelana_build_tape(const i32 *digits, int w, int n, int n_buckets,
                      int window_bits, int S, i64 a0, i32 *idx_out,
                      int max_steps, i32 *finals_out, i64 *meta_out) {
  const i64 total = (i64)w * n;
  // counting sort by key = win * n_buckets + digit (zero digits dropped)
  const i64 n_keys = (i64)w * n_buckets;
  std::vector<i64> counts(n_keys + 1, 0);
  for (i64 e = 0; e < total; ++e) {
    i32 d = digits[e];
    if (d != 0) counts[(e / n) * n_buckets + d + 1]++;
  }
  for (i64 k = 0; k < n_keys; ++k) counts[k + 1] += counts[k];
  std::vector<i32> keys(counts[n_keys]);
  std::vector<i64> items(counts[n_keys]);
  {
    std::vector<i64> cursor(counts.begin(), counts.end() - 1);
    for (i64 e = 0; e < total; ++e) {
      i32 d = digits[e];
      if (d == 0) continue;
      i64 key = (e / n) * n_buckets + d;
      i64 pos = cursor[key]++;
      keys[pos] = (i32)key;
      items[pos] = (e % n) + 1;  // slot of input point e%n
    }
  }

  Emitter em(idx_out, S, max_steps, a0);

  // bucket round 0: all-original pairs -> the mixed-kernel tape prefix
  reduce_iter(keys, items, em);
  em.pad(0);
  int mixed_steps = em.steps;
  reduce_greedy(keys, items, em);

  // bucket -> slot map
  std::vector<i64> bucket_slot(n_keys, 0);
  for (size_t k = 0; k < keys.size(); ++k) bucket_slot[keys[k]] = items[k];

  // bit-subset phase: group g = t * w + win sums buckets with bit t set
  std::vector<i32> gkeys;
  std::vector<i64> gitems;
  gkeys.reserve(keys.size() * window_bits / 2 + window_bits * w);
  gitems.reserve(gkeys.capacity());
  for (int t = 0; t < window_bits; ++t) {
    for (int win = 0; win < w; ++win) {
      size_t before = gitems.size();
      for (int d = 1 << t; d < n_buckets; d = (d + 1) | (1 << t)) {
        i64 s = bucket_slot[(i64)win * n_buckets + d];
        if (s != 0) {
          gkeys.push_back(t * w + win);
          gitems.push_back(s);
        }
      }
      if (gitems.size() == before) {  // empty subset: identity
        gkeys.push_back(t * w + win);
        gitems.push_back(0);
      }
    }
  }
  reduce_greedy(gkeys, gitems, em);
  for (int g = 0; g < window_bits * w; ++g) finals_out[g] = 0;
  for (size_t k = 0; k < gkeys.size(); ++k)
    finals_out[gkeys[k]] = (i32)gitems[k];

  // general phase padding; guarantee at least 4 general steps
  em.close_round();
  em.pad(mixed_steps);
  if (em.steps == mixed_steps)
    for (int r = 0; r < 4; ++r) em.noop_step();

  if (em.overflow) return -1;
  meta_out[0] = em.steps;
  meta_out[1] = mixed_steps;
  meta_out[2] = em.base;
  return 0;
}

}  // extern "C"
