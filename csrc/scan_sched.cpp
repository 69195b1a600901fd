// Native schedule builder for the run-scan MSM (ops/msm_scan.py).
//
// Replaces the numpy build_schedule hot path: counting sort of the
// (window, digit) keys (stable, one pass), column-major lane layout with
// run flags, emit-position accounting, and the K-layer dense bucket
// placement -- all in one sweep over the sorted stream. ~5-10x the numpy
// builder at 2^16 x 32 window digits, which matters because the host
// schedule must hide under the device scan + upload in the pipelined
// steady state (docs/DEVNOTES.md link numbers).
//
// Layout contract (must match msm_scan.Schedule):
//   perm[(r, l)]      uint16 point id; bit 15 = run flag when fold_bit15
//   flag_bits[(r, w)] uint32 bitmap, bit (l % 32) of word l / 32
//   dense_idx[k, key] int32 emit position of the k-th partial of bucket
//                     `key` (= w * 256 + digit); 0 = the identity slot
//   flush row R: all flags set, pid 0
//
// Build: g++ -O3 -shared -fPIC -o libzelana_sched.so scan_sched.cpp

#include <cstdint>
#include <cstring>
#include <vector>

using i32 = int32_t;
using i64 = int64_t;
using u16 = uint16_t;
using u32 = uint32_t;

extern "C" int zelana_build_scan_schedule(
    const i32* digits,  // (w, n) row-major window digits in [0, nb)
    i32 w, i32 n, i32 nb, i32 lanes, i32 R, i32 fold_bit15,
    u16* perm,       // (R+1) * lanes, caller-allocated
    u32* flag_bits,  // (R+1) * (lanes / 32), caller-zeroed
    i32* dense_idx,  // kmax * (w * nb), caller-zeroed
    i32 kmax,
    i64* meta)  // out: meta[0] = K (layers used)
{
    const i32 NB = nb;
    if ((i64)w * NB > 0xFFFF) return 3;  // keys must fit uint16
    const i32 nbuckets = w * NB;
    const i64 nw = (i64)w * n;
    const i64 total = (i64)R * lanes;
    if (total < nw || lanes % 32 != 0) return 1;

    // counting sort by key (stable: iterate stream in original order)
    std::vector<i64> offset(nbuckets + 1, 0);
    for (i32 wi = 0; wi < w; ++wi) {
        const i32* row = digits + (i64)wi * n;
        const i32 base = wi * NB;
        for (i32 i = 0; i < n; ++i) offset[base + row[i] + 1]++;
    }
    for (i32 k = 0; k < nbuckets; ++k) offset[k + 1] += offset[k];

    std::vector<i32> spid(total);
    std::vector<u16> skey(total);
    for (i64 s = nw; s < total; ++s) {  // sentinel padding
        spid[s] = 0;
        skey[s] = 0xFFFF;
    }
    std::vector<i64> cursor(offset.begin(), offset.end() - 1);
    for (i32 wi = 0; wi < w; ++wi) {
        const i32* row = digits + (i64)wi * n;
        const i32 base = wi * NB;
        for (i32 i = 0; i < n; ++i) {
            i64 pos = cursor[base + row[i]]++;
            spid[pos] = i;
            skey[pos] = (u16)(base + row[i]);
        }
    }

    // lane sweep: perm + flags + emit accounting + dense layering.
    // stream position of (row r, lane l) is l*R + r (column-major).
    std::vector<i32> occ(nbuckets, 0);
    i32 K = 1;
    const i32 words = lanes / 32;
    const u16 fbit = fold_bit15 ? 0x8000 : 0;
    for (i32 l = 0; l < lanes; ++l) {
        u16 prev = 0;
        for (i32 r = 0; r < R; ++r) {
            u16 k = skey[(i64)l * R + r];
            bool flag = (r == 0) || (k != prev);
            if (flag && r > 0 && prev != 0xFFFF && (prev % NB) != 0) {
                i32 o = occ[prev]++;
                if (o >= kmax) return 2;
                if (o + 1 > K) K = o + 1;
                dense_idx[(i64)o * nbuckets + prev] = (i32)((i64)r * lanes + l);
            }
            perm[(i64)r * lanes + l] =
                (u16)(spid[(i64)l * R + r] | (flag ? fbit : 0));
            if (flag)
                flag_bits[(i64)r * words + l / 32] |= (u32)1 << (l % 32);
            prev = k;
        }
        // flush row R emits the run ending at R-1
        if (prev != 0xFFFF && (prev % NB) != 0) {
            i32 o = occ[prev]++;
            if (o >= kmax) return 2;
            if (o + 1 > K) K = o + 1;
            dense_idx[(i64)o * nbuckets + prev] = (i32)((i64)R * lanes + l);
        }
        perm[(i64)R * lanes + l] = fbit;
        flag_bits[(i64)R * words + l / 32] |= (u32)1 << (l % 32);
    }
    meta[0] = K;
    return 0;
}

// Two-level schedule: level 1 as above, but instead of a K-layer dense
// merge of the per-lane partials, the partials become a SECOND key-sorted
// stream (the "level-2 run-scan"): all partials of a bucket are contiguous,
// so one projective run-scan pass reduces them to <= ceil(span/R2) + 1
// per bucket, after which the dense merge needs only K2 (small) layers.
// This is what makes windows wider than 8 bits viable: a degenerate top
// window (254 mod c bits) concentrates ~n/2 stream elements into one
// bucket -> hundreds of per-lane partials -> K explodes; level 2 absorbs
// them as ONE long run (docs/DEVNOTES.md "window-size trap").
//
// Outputs (in addition to level-1 perm/flag_bits):
//   pos2[(r2, l2)]     i32 position into the level-1 emit buffer
//                      ((R+1)*lanes entries); bit 31 = run flag; padding
//                      entries point at position 0 (the identity slot)
//   dense_idx2[k, key] i32 position into the level-2 emit buffer
//   meta: [0] = K2, [1] = R2 (rows used, caller passes capacity)
extern "C" int zelana_build_scan_schedule2(
    const i32* digits, i32 w, i32 n, i32 nb, i32 lanes, i32 R,
    i32 fold_bit15, i32 lanes2, i32 R2cap,
    u16* perm, u32* flag_bits,
    i32* pos2,        // (R2cap + 1) * lanes2, caller-zeroed
    i32* dense_idx2,  // kmax * (w * nb), caller-zeroed
    i32 kmax, i64* meta)
{
    const i32 NB = nb;
    if ((i64)w * NB > 0xFFFF) return 3;
    const i32 nbuckets = w * NB;
    const i64 nw = (i64)w * n;
    const i64 total = (i64)R * lanes;
    if (total < nw || lanes % 32 != 0) return 1;

    std::vector<i64> offset(nbuckets + 1, 0);
    for (i32 wi = 0; wi < w; ++wi) {
        const i32* row = digits + (i64)wi * n;
        const i32 base = wi * NB;
        for (i32 i = 0; i < n; ++i) offset[base + row[i] + 1]++;
    }
    for (i32 k = 0; k < nbuckets; ++k) offset[k + 1] += offset[k];

    std::vector<i32> spid(total);
    std::vector<u16> skey(total);
    for (i64 s = nw; s < total; ++s) {
        spid[s] = 0;
        skey[s] = 0xFFFF;
    }
    std::vector<i64> cursor(offset.begin(), offset.end() - 1);
    for (i32 wi = 0; wi < w; ++wi) {
        const i32* row = digits + (i64)wi * n;
        const i32 base = wi * NB;
        for (i32 i = 0; i < n; ++i) {
            i64 pos = cursor[base + row[i]]++;
            spid[pos] = i;
            skey[pos] = (u16)(base + row[i]);
        }
    }

    // level-1 lane sweep; collect (key, emit position) pairs per bucket.
    // Emits arrive lane-major; within a bucket that IS stream order (a
    // bucket's elements occupy a contiguous stream range, so its lane
    // spans are consecutive lanes and the flush-row emits follow).
    std::vector<std::vector<i32>> emits(nbuckets);
    const i32 words = lanes / 32;
    const u16 fbit = fold_bit15 ? 0x8000 : 0;
    for (i32 l = 0; l < lanes; ++l) {
        u16 prev = 0;
        for (i32 r = 0; r < R; ++r) {
            u16 k = skey[(i64)l * R + r];
            bool flag = (r == 0) || (k != prev);
            if (flag && r > 0 && prev != 0xFFFF && (prev % NB) != 0)
                emits[prev].push_back((i32)((i64)r * lanes + l));
            perm[(i64)r * lanes + l] =
                (u16)(spid[(i64)l * R + r] | (flag ? fbit : 0));
            if (flag)
                flag_bits[(i64)r * words + l / 32] |= (u32)1 << (l % 32);
            prev = k;
        }
        if (prev != 0xFFFF && (prev % NB) != 0)
            emits[prev].push_back((i32)((i64)R * lanes + l));
        perm[(i64)R * lanes + l] = fbit;
        flag_bits[(i64)R * words + l / 32] |= (u32)1 << (l % 32);
    }

    // level-2 stream: per-bucket partial lists concatenated in key order,
    // column-major over lanes2 x R2, run flag in bit 31.
    i64 p2 = 0;
    for (i32 k = 0; k < nbuckets; ++k) p2 += (i64)emits[k].size();
    i32 R2 = (i32)((p2 + lanes2 - 1) / lanes2);
    if (R2 < 1) R2 = 1;
    if (R2 > R2cap) return 4;

    // fill column-major: stream index s -> (row s % R2, lane s / R2)
    {
        i64 s = 0;
        for (i32 k = 0; k < nbuckets; ++k) {
            bool first = true;
            for (i32 e : emits[k]) {
                i32 r2 = (i32)(s % R2), l2 = (i32)(s / R2);
                pos2[(i64)r2 * lanes2 + l2] =
                    e | (first ? (i32)0x80000000 : 0);
                first = false;
                ++s;
            }
        }
        // padding: identity position 0, each its own run
        for (; s < (i64)R2 * lanes2; ++s) {
            i32 r2 = (i32)(s % R2), l2 = (i32)(s / R2);
            pos2[(i64)r2 * lanes2 + l2] = (i32)0x80000000;
        }
    }

    // level-2 emit accounting (same sweep shape as level 1): lane l2's
    // stream slice is [l2*R2, (l2+1)*R2); a flag at row r2 emits the run
    // ending at r2-1; the flush row R2 emits the last runs. Padding runs
    // (key SENT) are skipped via a parallel key walk.
    std::vector<i32> key2((i64)R2 * lanes2, -1);
    {
        i64 s = 0;
        for (i32 k = 0; k < nbuckets; ++k)
            for (size_t j = 0; j < emits[k].size(); ++j) key2[s++] = k;
    }
    std::vector<i32> occ2(nbuckets, 0);
    i32 K2 = 1;
    for (i32 l2 = 0; l2 < lanes2; ++l2) {
        i32 prev = -2;
        for (i32 r2 = 0; r2 < R2; ++r2) {
            i64 s = (i64)l2 * R2 + r2;
            i32 k = key2[s];
            bool flag = (pos2[(i64)r2 * lanes2 + l2] & 0x80000000) != 0
                        || r2 == 0;
            if (flag && r2 > 0 && prev >= 0) {
                i32 o = occ2[prev]++;
                if (o >= kmax) return 2;
                if (o + 1 > K2) K2 = o + 1;
                dense_idx2[(i64)o * nbuckets + prev] =
                    (i32)((i64)r2 * lanes2 + l2);
            }
            // row 0 implicitly starts a run even without bit 31 set
            // (lane boundary); make the flag explicit for the kernel
            if (r2 == 0)
                pos2[(i64)r2 * lanes2 + l2] |= (i32)0x80000000;
            prev = k;
        }
        if (prev >= 0) {
            i32 o = occ2[prev]++;
            if (o >= kmax) return 2;
            if (o + 1 > K2) K2 = o + 1;
            dense_idx2[(i64)o * nbuckets + prev] =
                (i32)((i64)R2 * lanes2 + l2);
        }
        pos2[(i64)R2 * lanes2 + l2] = (i32)0x80000000;
    }
    meta[0] = K2;
    meta[1] = R2;
    return 0;
}
