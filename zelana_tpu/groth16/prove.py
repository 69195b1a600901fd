"""Groth16 prover -- the TPU compute path.

Pipeline (mirrors ark-groth16 `create_random_proof` semantics, reference hot
loop at core/src/sequencer/settlement/prover.rs:408):

  1. synthesize circuit -> matrices + full assignment z (host)
  2. witness map: evaluate A.z, B.z, C.z over the domain, iFFT to coeffs,
     coset-FFT, pointwise (A.z * B.z - C.z) / Z on the coset, coset-iFFT
     -> h(x) coefficients            [TPU NTT kernels, ops/ntt.py]
  3. five MSMs over the proving-key queries      [TPU, ops/msm_scan.py]
  4. final assembly A = alpha + <a,z> + r*delta, B = beta + <b,z> + s*delta,
     C = <l,w> + <h_query,h> + s*A + r*B - rs*delta        (host, tiny)

Randomness: r, s drawn from the rand 0.8-compatible StdRng seeded by
batch_id (stdrng.py), reproducing the reference's
`StdRng::seed_from_u64(batch_id)` + `Fr::rand` stream bit-for-bit
(core/src/sequencer/settlement/prover.rs:354).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..curves import g1 as G1, g2 as G2
from ..fields.bn254 import R as FR
from ..ops import limbs as L
from ..ops import ntt as NTT
from ..ops import msm_scan as MSM
from .keys import Proof, ProvingKey
from .qap import matrix_vector_evals
from .stdrng import StdRng, rand_fp


def witness_map_dispatch(A, B, C, z, num_instance):
    """Dispatch the h(x) computation to the device (asynchronous).

    Returns (h_coeffs device handle, domain size); sync + decode with
    witness_map_collect. The sparse A.z/B.z/C.z evaluation happens host-side
    (one pass over the matrices), the iFFT -> coset-FFT -> pointwise ->
    coset-iFFT chain runs as TPU NTT kernels."""
    from ..poly.domain import Domain

    domain = Domain.new(len(A) + num_instance)
    plan = NTT.make_plan(domain.size)

    a_evals = matrix_vector_evals(A, z, domain, True, num_instance)
    b_evals = matrix_vector_evals(B, z, domain, False, num_instance)
    c_evals = matrix_vector_evals(C, z, domain, False, num_instance)

    dev = [jnp.asarray(L.encode_mont(v, L.FR)) for v in (a_evals, b_evals, c_evals)]
    coeffs = [NTT.intt(x, plan) for x in dev]
    cosets = [NTT.coset_ntt(x, plan) for x in coeffs]

    ab = L.mont_mul(cosets[0], cosets[1], L.FR)
    num = L.sub(ab, cosets[2], L.FR)
    z_inv = pow(domain.evaluate_vanishing_on_coset(), FR - 2, FR)
    z_inv_m = L.broadcast_scalar(L.encode_mont([z_inv], L.FR)[:, 0], num.shape[1:])
    h_evals = L.mont_mul(num, z_inv_m, L.FR)
    h_coeffs = NTT.coset_intt(h_evals, plan)
    return h_coeffs, domain.size


def witness_map_collect(h_coeffs, m):
    out = L.decode_mont(np.asarray(h_coeffs), L.FR)
    return out[: m - 1]


def witness_map_device(A, B, C, z, num_instance):
    """Compute h(x) coefficients on device. Returns list of m-1 ints."""
    return witness_map_collect(*witness_map_dispatch(A, B, C, z, num_instance))


def _mesh_or_none():
    """Multi-chip: shard the MSMs over the device mesh when the runtime has
    more than one accelerator (SURVEY 2.7's intra-prove parallelism axis).

    On the virtual CPU mesh (tests/CI emulate 8 devices on one host) the
    mesh adds compile/dispatch overhead with no parallelism, so the CPU
    backend requires the explicit ZELANA_SHARDED_PROVE=1 opt-in -- the
    driver's dryrun_multichip sets it to validate the production
    prove-through-mesh path."""
    import os

    import jax

    if len(jax.devices()) <= 1:
        return None
    if (jax.default_backend() == "cpu"
            and os.environ.get("ZELANA_SHARDED_PROVE") != "1"):
        return None
    from ..parallel.sharded import make_mesh

    return make_mesh()


def _prepared_queries(pk: ProvingKey, num_instance: int = 0):
    """Device-resident query points, converted once per proving key (the
    query bases are fixed across proves; only the scalars change). On a
    multi-device mesh the query bases are point-sharded instead.

    Single-device layout: the l pool is PREFIX-PADDED with num_instance
    identity slots so it is indexed by the full assignment z -- the a, b1
    and l MSMs then share one segment-schedule set per prove (identity
    slots are generator-backed and corrected at msm_end, msm_scan
    prepare_g1)."""
    cached = getattr(pk, "_prepared_queries", None)
    if cached is None:
        mesh = _mesh_or_none()
        if mesh is not None:
            from ..parallel.sharded import (
                prepare_g1_sharded,
                prepare_g2_sharded,
            )

            cached = {
                "mesh": mesh,
                "a": prepare_g1_sharded(pk.a_query, mesh),
                "b1": prepare_g1_sharded(pk.b_g1_query, mesh),
                "b2": prepare_g2_sharded(pk.b_g2_query, mesh),
                "l": prepare_g1_sharded(pk.l_query, mesh),
                "h": prepare_g1_sharded(pk.h_query, mesh),
            }
        else:
            cached = {
                "mesh": None,
                "a": MSM.prepare_g1(pk.a_query),
                "b1": MSM.prepare_g1(pk.b_g1_query),
                "b2": MSM.prepare_g2(pk.b_g2_query),
                "l": MSM.prepare_g1([None] * num_instance
                                    + list(pk.l_query)),
                "h": MSM.prepare_g1(pk.h_query),
            }
        object.__setattr__(pk, "_prepared_queries", cached)
    return cached


def _h_async(h_dev) -> None:
    """Start the device->host copy of the h coefficients without blocking:
    the transfer then streams back as soon as the NTT chain finishes,
    overlapped under the schedule builds + uploads of the z-query MSMs
    (the h download was a serial ~3-9 s term of the warm chunk prove)."""
    try:
        h_dev.copy_to_host_async()
    except Exception:
        pass  # backend without async copies: the worker thread still
        # overlaps the blocking fetch under the main thread's dispatch


def _msm_begin(q, key, scalars, curve, digits=None):
    if q["mesh"] is not None:
        from ..parallel.sharded import msm_begin_sharded

        return msm_begin_sharded(q[key], scalars, q["mesh"], digits=digits)
    return MSM.msm_begin(q[key], scalars, curve, digits=digits)


def prove(pk: ProvingKey, circuit, batch_id: int = 0,
          check: bool = True) -> Proof:
    """check=False skips the standalone satisfaction pre-pass -- the
    ark-groth16 semantics (create_random_proof does not run is_satisfied;
    an unsatisfied witness simply yields a proof that fails verification).
    The default keeps the pre-pass for the clearer error."""
    import time as _time

    _t0 = _time.time()
    parts = _synthesize_dsl(circuit, check, _t0)
    return _prove_from_parts(pk, parts, batch_id, _t0)


def _synthesize_dsl(circuit, check: bool, _t0=None):
    """Host stage of a DSL prove: synthesis + matrices + assignment.
    Split out so prove_many can run it on a worker thread, overlapping
    the NEXT proof's synthesis under the current proof's device work."""
    import time as _time

    from ..r1cs.system import ConstraintSystem

    if _t0 is None:
        _t0 = _time.time()
    cs = ConstraintSystem()
    circuit.generate_constraints(cs)
    _trace("constraints synthesized (Python DSL)", _t0)
    if check:
        bad = cs.is_satisfied()
        if bad is not None:
            raise ValueError(f"constraint {bad} unsatisfied; witness invalid")
        _trace("satisfaction checked", _t0)
    A, B, C = cs.matrices()
    z = cs.full_assignment()
    _trace("matrices + assignment built", _t0)
    return A, B, C, z, cs.num_instance


def _prove_from_parts(pk: ProvingKey, parts, batch_id: int, _t0) -> Proof:
    A, B, C, z, num_instance = parts

    # ark-groth16 `prove`: r then s, each one `Fr::rand` draw
    rng = StdRng.seed_from_u64(batch_id)
    r = rand_fp(rng, FR)
    s = rand_fp(rng, FR)

    # Pipelined dispatch: the witness map goes to the device first; the
    # schedule builds + uploads (host) all overlap its execution. One
    # SHARED segment-schedule set (built + uploaded once) serves the
    # a/b1/l MSMs -- same scalar vector z, identity pool slots corrected
    # at msm_end -- and a worker thread downloads + decodes the h
    # coefficients while the main thread dispatches, so the h pipeline
    # hides behind the z-query work. msm_end syncs in dispatch order.
    h_dev, m = witness_map_dispatch(A, B, C, z, num_instance)
    _h_async(h_dev)
    _trace("witness map dispatched", _t0)
    q = _prepared_queries(pk, num_instance)
    digits_z = MSM.scalar_digits(z)
    if q["mesh"] is not None:
        t_a = _msm_begin(q, "a", z, "g1", digits=digits_z)
        t_b1 = _msm_begin(q, "b1", z, "g1", digits=digits_z)
        t_b2 = _msm_begin(q, "b2", z, "g2", digits=digits_z)
        t_l = _msm_begin(q, "l", z[num_instance:], "g1",
                         digits=digits_z[:, num_instance:])
        _trace("a/b1/b2/l MSMs in flight", _t0)
        h = witness_map_collect(h_dev, m)
        _trace("h coefficients downloaded", _t0)
        t_h = _msm_begin(q, "h", h, "g1")
    else:
        import concurrent.futures as _cf

        def _h_work():
            h_vals = witness_map_collect(h_dev, m)
            digits_h = MSM.scalar_digits(h_vals)
            return MSM.build_segment_schedules(digits_h), digits_h

        with _cf.ThreadPoolExecutor(1) as _ex:
            h_fut = _ex.submit(_h_work)
            segs_z = MSM.build_segment_schedules(digits_z)
            segs_b2 = MSM.build_segment_schedules(digits_z,
                                                  lanes=MSM.LANES_G2)
            t_a = MSM.msm_begin_scheds(
                q["a"], segs_z, MSM._inf_correction(digits_z, q["a"][1]))
            t_b1 = MSM.msm_begin_scheds(
                q["b1"], segs_z, MSM._inf_correction(digits_z, q["b1"][1]))
            t_l = MSM.msm_begin_scheds(
                q["l"], segs_z, MSM._inf_correction(digits_z, q["l"][1]))
            t_b2 = MSM.msm_begin_scheds(
                q["b2"], segs_b2, MSM._inf_correction(digits_z, q["b2"][1]))
            _trace("a/b1/l (shared schedule) + b2 MSMs in flight", _t0)
            segs_h, digits_h = h_fut.result()
        _trace("h coefficients downloaded + scheduled (worker)", _t0)
        t_h = MSM.msm_begin_scheds(
            q["h"], segs_h, MSM._inf_correction(digits_h, q["h"][1]))
    g_a_sum, g_b1_sum, h_sum, g_b2_sum, l_sum = MSM.msm_end_many(
        [t_a, t_b1, t_h, t_b2, t_l])
    _trace("all five MSMs finished + downloaded", _t0)

    # assembly (host, a handful of point ops)
    g_a = G1.add(G1.add(pk.vk.alpha_g1, g_a_sum), G1.mul(pk.delta_g1, r))
    g_b1 = G1.add(G1.add(pk.beta_g1, g_b1_sum), G1.mul(pk.delta_g1, s))
    g_b2 = G2.add(G2.add(pk.vk.beta_g2, g_b2_sum), G2.mul(pk.vk.delta_g2, s))

    c_pt = G1.add(l_sum, h_sum)
    c_pt = G1.add(c_pt, G1.mul(g_a, s))
    c_pt = G1.add(c_pt, G1.mul(g_b1, r))
    c_pt = G1.add(c_pt, G1.neg(G1.mul(pk.delta_g1, r * s % FR)))

    return Proof(a=g_a, b=g_b2, c=c_pt)


def prove_many(pk: ProvingKey, jobs, check: bool = False) -> list:
    """Pipelined DSL proves: synthesis of proof k+1 runs on a worker
    thread while proof k's device work is in flight -- the sequencer's
    steady-state issue pattern (one batch proving while the next seals;
    reference settlement loop core/src/sequencer/settlement/prover.rs:408).

    jobs: [(circuit, batch_id)]; returns [Proof] in order. Throughput is
    max(host synthesis, device+link) instead of their sum -- the dummy-L2
    bench moved 1.5 -> ~2+ proofs/s with this overlap."""
    import concurrent.futures as _cf
    import time as _time

    out = []
    with _cf.ThreadPoolExecutor(1) as ex:
        nxt = ex.submit(_synthesize_dsl, jobs[0][0], check)
        for i, (_circuit, batch_id) in enumerate(jobs):
            cur = nxt
            if i + 1 < len(jobs):
                nxt = ex.submit(_synthesize_dsl, jobs[i + 1][0], check)
            parts = cur.result()
            out.append(_prove_from_parts(pk, parts, batch_id, _time.time()))
    return out


def witness_map_stage_native(system):
    """Host half of the native witness map: sparse A.z/B.z/C.z matvecs in
    C, limb-PAIR packing (two 16-bit limbs per u32 word -- halves the
    three NTT-input uploads, ~400 -> ~200 MB at the production chunk's
    2^21 domain), and the async device_put. Returns (dev_words, domain
    size) for witness_map_dispatch_native.

    Split out so the batch pipeline can run it on a worker thread for
    chunk k+1 while chunk k's device scans stream (the uploads then fill
    the link's idle gaps instead of serializing on the main thread)."""
    from ..poly.domain import Domain
    from ..r1cs.native_synth import limbs16

    nc, ni = system.num_constraints, system.num_instance
    domain = Domain.new(nc + ni)

    # A gets the identity block over the instance assignment appended
    # (input-consistency rows), same as matrix_vector_evals(input_rows=True)
    inst_cols = np.asarray(
        L.encode_mont(system.instance_ints(), L.FR), dtype=np.uint32)
    a_rows = np.concatenate(
        [limbs16(system.matvec("A", mont=True)), inst_cols], axis=1)
    b_rows = limbs16(system.matvec("B", mont=True))
    c_rows = limbs16(system.matvec("C", mont=True))

    def pad_pack(cols):
        n_have = cols.shape[1]
        if n_have < domain.size:
            cols = np.concatenate(
                [cols, np.zeros((16, domain.size - n_have), np.uint32)],
                axis=1)
        words = (cols[0::2] & 0xFFFF) | ((cols[1::2] & 0xFFFF) << 16)
        return jnp.asarray(words)  # (8, domain) u32, async upload

    return [pad_pack(c) for c in (a_rows, b_rows, c_rows)], domain.size


def _unpack_rows16(words):
    """(8, n) packed words -> (16, n) 16-bit limb rows, on device (the
    inverse of witness_map_stage_native's pad_pack; a few cheap XLA ops
    ahead of the NTT chain)."""
    lo = words & 0xFFFF
    hi = words >> 16
    return jnp.stack([lo, hi], axis=1).reshape(16, words.shape[1])


def witness_map_dispatch_native(system, staged=None):
    """witness_map_dispatch over a r1cs.native_synth.NativeSystem: the
    sparse A.z/B.z/C.z evaluations run in C (Montgomery-form output, so no
    per-element host conversion), then the same device NTT chain.

    `staged`: optional (dev_words, domain_size) from
    witness_map_stage_native run earlier on a worker thread."""
    from ..poly.domain import Domain

    if staged is None:
        staged = witness_map_stage_native(system)
    dev_words, size = staged
    domain = Domain.new(size)  # size is already the rounded pow2
    plan = NTT.make_plan(domain.size)

    dev = [_unpack_rows16(w) for w in dev_words]
    coeffs = [NTT.intt(x, plan) for x in dev]
    cosets = [NTT.coset_ntt(x, plan) for x in coeffs]
    ab = L.mont_mul(cosets[0], cosets[1], L.FR)
    num = L.sub(ab, cosets[2], L.FR)
    z_inv = pow(domain.evaluate_vanishing_on_coset(), FR - 2, FR)
    z_inv_m = L.broadcast_scalar(L.encode_mont([z_inv], L.FR)[:, 0],
                                 num.shape[1:])
    h_evals = L.mont_mul(num, z_inv_m, L.FR)
    h_coeffs = NTT.coset_intt(h_evals, plan)
    # pack limb pairs into u32 words for the download: the h-coefficient
    # fetch is the production prove's one mid-flight transfer (128 MB at
    # the 2^21 domain as 16 sparse u32 rows); two 16-bit limbs per word
    # halves it. Transport encoding only -- unpacked host-side.
    h_packed = (h_coeffs[0::2] & 0xFFFF) | ((h_coeffs[1::2] & 0xFFFF) << 16)
    return h_packed, domain.size


def _unpack_h(h_pk: np.ndarray) -> np.ndarray:
    """(8, n) u32 packed download -> (16, n) u32 16-bit limb planes."""
    out = np.empty((16, h_pk.shape[1]), np.uint32)
    out[0::2] = h_pk & np.uint32(0xFFFF)
    out[1::2] = h_pk >> np.uint32(16)
    return out


_PHASE_LOG = None


def phase_log_start() -> None:
    """Begin collecting (abs_time, +dt_since_prove_start, label) triples
    from every _trace call -- bench tools embed the table in their JSON so
    the committed per-phase accounting comes from the SAME run as the
    headline number (VERDICT r04 weak #1)."""
    global _PHASE_LOG
    _PHASE_LOG = []


def phase_log_take() -> list:
    global _PHASE_LOG
    out, _PHASE_LOG = _PHASE_LOG, None
    return out or []


def _trace(label, t0):
    """Stage timestamps for the production-prove breakdown
    (ZELANA_PROVE_TRACE=1; CHUNK_BENCH.json accounting)."""
    import os
    import sys
    import time

    now = time.time()
    if _PHASE_LOG is not None:
        _PHASE_LOG.append((round(now, 3), round(now - t0, 3), label))
    if os.environ.get("ZELANA_PROVE_TRACE") == "1":
        print(f"    [prove +{now - t0:7.1f}s] {label}",
              file=sys.stderr, flush=True)


def prove_synthesized(pk: ProvingKey, system, batch_id: int = 0,
                      check: bool = True, precomputed: dict = None) -> Proof:
    """prove() over a natively-synthesized system (production chunk path:
    the host side -- synthesis, satisfaction check, matvec, digit
    decomposition -- is C/numpy instead of per-element Python).

    `precomputed` (optional): {"digits_z", "segs_z", "segs_b2", "wm"}
    built ahead of time by Groth16ChunkProver._synth_chunk -- the batch
    pipeline computes the NEXT chunk's digits + segment schedules (and
    starts their uploads, plus the packed witness-map upload "wm") on a
    worker thread while THIS chunk's device scans run."""
    import time as _time

    _t0 = _time.time()
    if check:
        bad = system.check()
        if bad != -1:
            raise ValueError(
                f"constraint {bad} unsatisfied; witness invalid")
    num_instance = system.num_instance

    rng = StdRng.seed_from_u64(batch_id)
    r = rand_fp(rng, FR)
    s = rand_fp(rng, FR)

    _trace("witness checked", _t0)
    h_dev, m = witness_map_dispatch_native(
        system, staged=(precomputed or {}).get("wm"))
    _h_async(h_dev)
    _trace("witness map dispatched (NTT chain queued)", _t0)
    q = _prepared_queries(pk, num_instance)
    _trace("query pools prepared/cached", _t0)
    digits_z = (precomputed["digits_z"] if precomputed is not None
                else MSM.scalar_digits(system.z))
    from ..r1cs.native_synth import fr_ints, from_mont_limbs16

    if q["mesh"] is not None:
        z_ints = system.assignment_ints()
        # h last: the h-coefficient download is the one mid-prove sync;
        # with a/b1/b2/l already in flight only the h query serializes
        # behind it
        t_a = _msm_begin(q, "a", z_ints, "g1", digits=digits_z)
        _trace("a query MSM in flight", _t0)
        t_b1 = _msm_begin(q, "b1", z_ints, "g1", digits=digits_z)
        _trace("b1 query MSM in flight", _t0)
        t_b2 = _msm_begin(q, "b2", z_ints, "g2", digits=digits_z)
        _trace("b2 (G2) query MSM in flight", _t0)
        t_l = _msm_begin(q, "l", z_ints[num_instance:], "g1",
                         digits=digits_z[:, num_instance:])
        _trace("l query MSM in flight", _t0)
        h_u64 = from_mont_limbs16(_unpack_h(np.asarray(h_dev)))[: m - 1]
        _trace("h coefficients downloaded", _t0)
        digits_h = MSM.scalar_digits(h_u64)
        t_h = _msm_begin(q, "h", fr_ints(h_u64), "g1", digits=digits_h)
        _trace("h query MSM in flight", _t0)
    else:
        # The h pipeline (download -> Montgomery decode -> digits ->
        # segment schedules) runs on a WORKER thread: the download
        # streams back as soon as the NTT chain finishes (started above
        # with copy_to_host_async) and the decode + schedule build use
        # the second core while the main thread builds + uploads the
        # z-query schedules. One shared schedule set serves a/b1/l.
        import concurrent.futures as _cf

        def _h_work():
            h_u64 = from_mont_limbs16(_unpack_h(np.asarray(h_dev)))[: m - 1]
            digits_h = MSM.scalar_digits(h_u64)
            segs_h = MSM.build_segment_schedules(digits_h)
            # start the h schedule uploads HERE, interleaved with the
            # main thread's z/b2 uploads: by the time the main thread
            # dispatches the h query its segment buffers are already on
            # (or streaming to) the device, removing the ~4 s tail the
            # round-5 batch phase table showed for "h query MSM in
            # flight" after everything else had overlapped
            MSM.upload_segment_schedules(segs_h)
            return segs_h, digits_h

        with _cf.ThreadPoolExecutor(1) as _ex:
            h_fut = _ex.submit(_h_work)
            if precomputed is not None:
                segs_z = precomputed["segs_z"]
                segs_b2 = precomputed["segs_b2"]
                _trace("z + b2 segment schedules arrived prebuilt", _t0)
            else:
                segs_z = MSM.build_segment_schedules(digits_z)
                _trace("z segment schedules built (shared a/b1/l)", _t0)
                segs_b2 = MSM.build_segment_schedules(digits_z,
                                                      lanes=MSM.LANES_G2)
                _trace("b2 segment schedules built", _t0)
            t_a = MSM.msm_begin_scheds(
                q["a"], segs_z, MSM._inf_correction(digits_z, q["a"][1]))
            _trace("a query MSM in flight", _t0)
            t_b1 = MSM.msm_begin_scheds(
                q["b1"], segs_z, MSM._inf_correction(digits_z, q["b1"][1]))
            _trace("b1 query MSM in flight (schedule reused)", _t0)
            t_l = MSM.msm_begin_scheds(
                q["l"], segs_z, MSM._inf_correction(digits_z, q["l"][1]))
            _trace("l query MSM in flight (schedule reused)", _t0)
            t_b2 = MSM.msm_begin_scheds(
                q["b2"], segs_b2,
                MSM._inf_correction(digits_z, q["b2"][1]))
            _trace("b2 (G2) query MSM in flight", _t0)
            segs_h, digits_h = h_fut.result()
        _trace("h downloaded + decoded + scheduled (worker thread)", _t0)
        t_h = MSM.msm_begin_scheds(
            q["h"], segs_h, MSM._inf_correction(digits_h, q["h"][1]))
        _trace("h query MSM in flight", _t0)
    g_a_sum, g_b1_sum, h_sum, g_b2_sum, l_sum = MSM.msm_end_many(
        [t_a, t_b1, t_h, t_b2, t_l])
    _trace("all five MSMs finished + downloaded", _t0)

    g_a = G1.add(G1.add(pk.vk.alpha_g1, g_a_sum), G1.mul(pk.delta_g1, r))
    g_b1 = G1.add(G1.add(pk.beta_g1, g_b1_sum), G1.mul(pk.delta_g1, s))
    g_b2 = G2.add(G2.add(pk.vk.beta_g2, g_b2_sum), G2.mul(pk.vk.delta_g2, s))

    c_pt = G1.add(l_sum, h_sum)
    c_pt = G1.add(c_pt, G1.mul(g_a, s))
    c_pt = G1.add(c_pt, G1.mul(g_b1, r))
    c_pt = G1.add(c_pt, G1.neg(G1.mul(pk.delta_g1, r * s % FR)))

    return Proof(a=g_a, b=g_b2, c=c_pt)


def public_inputs_of(circuit) -> list:
    """Instance values (excluding the leading ONE) for verification."""
    from ..r1cs.system import ConstraintSystem

    cs = ConstraintSystem()
    circuit.generate_constraints(cs)
    return cs.instance_values[1:]
