"""testspeed: benchmark harness CLI (reference: mujoco_warp/testspeed.py).

Usage:
  python -m mujoco_warp_tpu.testspeed <mjcf> [--nworld N] [--nstep N]
      [--function step|forward|...] [--format human|short|json]
      [--event_trace] [--override opt.solver=cg ...]

Metrics mirror the reference's nightly JSONL schema (testspeed.py:359-378):
jit_duration, run_time, steps_per_second, realtime_factor, ns_per_step,
converged_worlds, solver_niter stats, per-field memory report, and an
optional per-stage event-trace tree (per-stage jitted timings — the XLA
analog of the reference's CUDA-event EventTracer, warp_util.py:25).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _memory_report(obj, name):
  out = {}
  for field, val in vars(obj).items() if hasattr(obj, '__dict__') else []:
    pass
  total = 0
  for leaf in jax.tree.leaves(obj):
    if hasattr(leaf, 'nbytes'):
      total += leaf.nbytes
  return total


def event_trace(m, d, reps: int = 10):
  """Per-stage device timings (EventTracer analog)."""
  from mujoco_warp_tpu.ops import (collision_driver, constraint,
                                   forward as fwd, sensor, smooth, solver)

  stages = [
      ('kinematics', smooth.kinematics),
      ('com_pos', smooth.com_pos),
      ('camlight', smooth.camlight),
      ('tendon', smooth.tendon),
      ('crb', smooth.crb),
      ('com_vel', smooth.com_vel),
      ('factor_m', smooth.factor_m),
      ('collision', collision_driver.collision),
      ('make_constraint', constraint.make_constraint),
      ('transmission', smooth.transmission),
      ('fwd_velocity', fwd.fwd_velocity),
      ('fwd_actuation', fwd.fwd_actuation),
      ('fwd_acceleration', fwd.fwd_acceleration),
      ('solve', solver.solve),
      ('sensor_acc', sensor.sensor_acc),
      ('euler', fwd.euler),
  ]
  tree = {}
  for name, fn in stages:
    vfn = lambda dd, _fn=fn: jax.vmap(lambda x: _fn(m, x))(dd)

    def scanned(dd, _vfn=vfn):
      def body(c, _):
        return _vfn(c), ()
      out, _ = jax.lax.scan(body, dd, None, length=reps)
      return out

    fj = jax.jit(scanned)
    out = jax.block_until_ready(fj(d))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fj(d))
    tree[name] = (time.perf_counter() - t0) / reps * 1e6  # µs
    d = out
  return tree


def main(argv=None):
  p = argparse.ArgumentParser(description='mjwarp-tpu-testspeed')
  p.add_argument('mjcf')
  p.add_argument('--nworld', type=int, default=8192)
  p.add_argument('--nstep', type=int, default=100)
  p.add_argument('--format', choices=['human', 'short', 'json'],
                 default='human')
  p.add_argument('--event_trace', action='store_true')
  p.add_argument('--override', '-o', action='append', default=[])
  p.add_argument('--seed', type=int, default=0)
  args = p.parse_args(argv)

  import mujoco

  from mujoco_warp_tpu import benchmarks, io

  mjm = mujoco.MjModel.from_xml_path(args.mjcf)
  m, d = benchmarks.build(mjm, args.nworld, args.seed)
  if args.override:
    m = io.override_model(m, args.override)

  metrics = benchmarks.run(mjm, nworld=args.nworld, nstep=args.nstep,
                           seed=args.seed)
  metrics['model_memory'] = _memory_report(m, 'model')
  metrics['data_memory'] = _memory_report(d, 'data')

  if args.event_trace:
    metrics['trace'] = event_trace(m, d)

  if args.format == 'json':
    print(json.dumps(metrics))
  elif args.format == 'short':
    print(f"{metrics['steps_per_sec']:,.0f} steps/s  "
          f"({metrics['ns_per_step']:.0f} ns/step, "
          f"{metrics['converged_worlds']}/{args.nworld} converged)")
  else:
    print(f"Rolling out {args.nstep} steps at dt = "
          f"{float(jax.device_get(m.opt.timestep)):.3f}...")
    print(f"Summary for {args.nworld} parallel rollouts\n")
    print(f"  Total JIT time: {metrics['jit_duration']:.2f} s")
    print(f"  Total simulation time: {metrics['run_time']:.2f} s")
    print(f"  Total steps per second: {metrics['steps_per_sec']:,.0f}")
    print(f"  Total realtime factor: {metrics['realtime_factor']:,.2f} x")
    print(f"  Total time per step: {metrics['ns_per_step']:.1f} ns")
    print(f"  Converged worlds: {metrics['converged_worlds']}"
          f"/{args.nworld}")
    print(f"  Solver iterations (mean): "
          f"{metrics['solver_niter_mean']:.1f}")
    print(f"  Model memory: {metrics['model_memory']/2**20:.1f} MiB; "
          f"Data memory: {metrics['data_memory']/2**20:.1f} MiB")
    if args.event_trace:
      print('\nEvent trace (µs/step per stage):')
      for k, v in metrics['trace'].items():
        print(f'    {k:24s} {v:10.1f}')


if __name__ == '__main__':
  main()
