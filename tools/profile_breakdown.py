import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/zelana_tpu_xla_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from zelana_tpu.curves import g1 as G1
from zelana_tpu.ops import msm_fast as MF
from zelana_tpu.ops.msm import scalar_digits
from zelana_tpu.fields.bn254 import R as FR

print("devices:", jax.devices(), file=sys.stderr)
N = 1 << 14
rng = np.random.default_rng(0)
# random points: multiples of the generator via double-and-add on host? expensive; reuse bench approach
GENERATOR = None
import zelana_tpu.curves.g1 as g1mod
GENERATOR = g1mod.generator()
pts = [GENERATOR]
for i in range(1, N):
    pts.append(g1mod.add(pts[-1], GENERATOR) if i < 64 else pts[i % 64])
import random as _random
_r = _random.Random(12345)
scalars = [_r.randrange(FR) for _ in range(N)]
prep = MF.prepare_g1(pts)
_ = np.asarray(prep[0][0])  # sync upload

# warm up full path
h = MF.msm_begin(prep, scalars, "g1")
r = MF.msm_end(h)
print("warm result ok", file=sys.stderr)

# breakdown
t0 = time.perf_counter()
digits = scalar_digits(scalars, prep[1])
t1 = time.perf_counter()
tape = MF.build_tape(digits)
t2 = time.perf_counter()
buf, mixed16, hi_mode, gen_steps = MF._pack_tape(tape)
t3 = time.perf_counter()
X, Y = prep[0]
dbuf = jnp.asarray(buf)
np.asarray(dbuf[:1])  # force transfer
t4 = time.perf_counter()
g = MF._run_tape(X, Y, dbuf, "g1", tape.S, tape.a0, tape.total_slots, tape.mixed_steps, gen_steps, mixed16, hi_mode)
gg = np.asarray(g)  # force compute
t5 = time.perf_counter()
res = MF._finish_host(g, "g1")
t6 = time.perf_counter()
print(f"tape bytes: {buf.nbytes}", file=sys.stderr)
print(f"digits: {(t1-t0)*1e3:.1f} ms", file=sys.stderr)
print(f"build_tape: {(t2-t1)*1e3:.1f} ms", file=sys.stderr)
print(f"pack: {(t3-t2)*1e3:.1f} ms", file=sys.stderr)
print(f"upload: {(t4-t3)*1e3:.1f} ms", file=sys.stderr)
print(f"device scans+fetch: {(t5-t4)*1e3:.1f} ms", file=sys.stderr)
print(f"host tail: {(t6-t5)*1e3:.1f} ms", file=sys.stderr)
print(f"steps: mixed={tape.mixed_steps} gen={gen_steps} S={tape.S}", file=sys.stderr)
