"""Measure per-call dispatch overhead vs in-jit scan on the TPU tunnel."""
import os, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', os.path.expanduser('~/.cache/jax_tpu_cache'))
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', os.path.expanduser('~/.cache/jax_tpu_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import mujoco
from mujoco_warp_tpu import benchmarks, io
from mujoco_warp_tpu.pallas import fused

mjm = benchmarks.load_humanoid_benchmark()
m, d = benchmarks.build(mjm, 8192, nconmax={1:8,3:16})
m = fused.prepare(m) if hasattr(fused, 'prepare') else m
st = fused.to_lane(m, d)

step1 = jax.jit(lambda s: fused.step_lane(m, s), donate_argnums=0)
t0=time.perf_counter(); st = jax.block_until_ready(step1(st)); print('jit1', time.perf_counter()-t0, flush=True)
for _ in range(3): st = step1(st)
st = jax.block_until_ready(st)
N=50
t0=time.perf_counter()
for _ in range(N): st = step1(st)
st = jax.block_until_ready(st)
per = (time.perf_counter()-t0)/N
print(f'python-loop per step: {per*1e3:.2f} ms -> {8192/per:,.0f} steps/s', flush=True)

def scan_steps(s, n):
  def body(ss, _):
    return fused.step_lane(m, ss), ()
  out, _ = jax.lax.scan(body, s, None, length=n)
  return out
scan50 = jax.jit(lambda s: scan_steps(s, 50), donate_argnums=0)
t0=time.perf_counter(); st = jax.block_until_ready(scan50(st)); print('jit scan50', time.perf_counter()-t0, flush=True)
t0=time.perf_counter()
for _ in range(4): st = scan50(st)
st = jax.block_until_ready(st)
per = (time.perf_counter()-t0)/(4*50)
print(f'scan50 per step: {per*1e3:.2f} ms -> {8192/per:,.0f} steps/s', flush=True)
