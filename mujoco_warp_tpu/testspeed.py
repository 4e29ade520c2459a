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


def _memory_report(obj):
  """Per-field device memory (reference: testspeed.py:64-72).

  Returns (total_bytes, {field: bytes} sorted desc, top consumers only).
  """
  import dataclasses
  per_field = {}
  if dataclasses.is_dataclass(obj):
    for f in dataclasses.fields(obj):
      val = getattr(obj, f.name)
      n = sum(leaf.nbytes for leaf in jax.tree.leaves(val)
              if hasattr(leaf, 'nbytes'))
      if n:
        per_field[f.name] = n
  total = sum(leaf.nbytes for leaf in jax.tree.leaves(obj)
              if hasattr(leaf, 'nbytes'))
  per_field = dict(sorted(per_field.items(), key=lambda kv: -kv[1])[:12])
  return total, per_field


def overflow_report(m, d):
  """Decode per-world overflow bits into named counts (reference:
  testspeed.py:266-278 per-world OverflowType flag decode)."""
  from mujoco_warp_tpu import types
  bits = np.asarray(jax.device_get(d.overflow))
  report = {}
  for flag in types.OverflowType:
    n = int(np.sum((bits & int(flag)) != 0))
    if n:
      report[flag.name] = n
  return report


def public_api():
  """Reflected benchmarkable API: public functions with the uniform
  (m: Model, d: Data) -> Data signature (reference: testspeed.py:45-51
  discovers --function targets the same way)."""
  import inspect

  from mujoco_warp_tpu.ops import (collision_driver, constraint,
                                   forward as fwd, inverse, passive,
                                   sensor, smooth, solver)
  api = {}
  for mod in (fwd, smooth, collision_driver, constraint, solver, sensor,
              passive, inverse):
    for name, fn in vars(mod).items():
      if name.startswith('_') or not callable(fn):
        continue
      try:
        params = list(inspect.signature(fn).parameters.values())
      except (TypeError, ValueError):
        continue
      if (len(params) >= 2 and params[0].name == 'm' and
          params[1].name == 'd' and
          all(p.default is not inspect.Parameter.empty
              for p in params[2:])):
        api.setdefault(name, fn)
  return api


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
  p.add_argument('--nstep', type=int, default=1000)
  p.add_argument('--function', default='step',
                 help='public API function to benchmark (reflected; '
                      'see testspeed.public_api())')
  p.add_argument('--measure_alloc', action='store_true',
                 help='report nacon/nefc/solver_niter bucket stats')
  p.add_argument('--replay', default=None,
                 help='NPZ ctrl trajectory to replay (io.load_trajectory)')
  p.add_argument('--format', choices=['human', 'short', 'json'],
                 default='human')
  p.add_argument('--event_trace', action='store_true')
  p.add_argument('--override', '-o', action='append', default=[])
  p.add_argument('--seed', type=int, default=0)
  p.add_argument('--overflow_behavior', choices=['warn', 'error', 'ignore'],
                 default='warn',
                 help='what to do when per-world overflow bits are set '
                      '(reference: testspeed.py --overflow_behavior)')
  args = p.parse_args(argv)

  import mujoco

  from mujoco_warp_tpu import benchmarks, io

  mjm = mujoco.MjModel.from_xml_path(args.mjcf)
  replay_ctrl = None
  if args.replay:
    mjd0 = mujoco.MjData(mjm)
    mujoco.mj_resetData(mjm, mjd0)
    replay_ctrl = io.load_trajectory(args.replay, mjm, mjd0)
    if args.nstep > len(replay_ctrl):
      args.nstep = len(replay_ctrl)
  m, d = benchmarks.build(mjm, args.nworld, args.seed)
  if args.override:
    m = io.override_model(m, args.override)
  if replay_ctrl is not None:
    # replay rollout: broadcast the recorded ctrl across worlds per step
    from mujoco_warp_tpu.ops import forward as fwd
    if args.replay and 'qpos' in np.load(args.replay):
      d = io.put_data(mjm, mjd0, m, nworld=args.nworld)
    step_j = jax.jit(lambda dd, c: fwd.step(m, dd.replace(
        ctrl=jnp.broadcast_to(c, dd.ctrl.shape))))
    c0 = jnp.asarray(replay_ctrl[0], d.qpos.dtype)
    t0 = time.perf_counter()
    out = jax.block_until_ready(step_j(d, c0))
    jit_duration = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = d
    for i in range(args.nstep):
      out = step_j(out, jnp.asarray(replay_ctrl[i], d.qpos.dtype))
    jax.block_until_ready(out)
    run_time = time.perf_counter() - t0
    steps = args.nworld * args.nstep
    metrics = {
        'replay': args.replay,
        'jit_duration': jit_duration,
        'run_time': run_time,
        'steps_per_sec': steps / run_time,
        'realtime_factor': (args.nstep * float(jax.device_get(
            m.opt.timestep))) / run_time * args.nworld,
        'ns_per_step': run_time / steps * 1e9,
        'converged_worlds': int(np.sum(np.all(np.isfinite(
            np.asarray(jax.device_get(out.qpos))), axis=-1))),
        'solver_niter_mean': float(np.mean(np.asarray(
            jax.device_get(out.solver_niter)))),
    }
    d = out
    args.function = '_replayed'

  if args.function == '_replayed':
    pass
  elif args.function != 'step':
    api = public_api()
    if args.function not in api:
      p.error(f'unknown --function {args.function!r}; available: '
              f'{sorted(api)}')
    fn = api[args.function]
    vfn = jax.jit(lambda dd: jax.vmap(lambda x: fn(m, x))(dd))
    t0 = time.perf_counter()
    out = jax.block_until_ready(vfn(d))
    jit_duration = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.nstep):
      out = vfn(out)
    jax.block_until_ready(out)
    run_time = time.perf_counter() - t0
    steps = args.nworld * args.nstep
    metrics = {
        'function': args.function,
        'jit_duration': jit_duration,
        'run_time': run_time,
        'steps_per_sec': steps / run_time,
        'realtime_factor': float('nan'),
        'ns_per_step': run_time / steps * 1e9,
        'converged_worlds': int(np.sum(np.all(np.isfinite(
            np.asarray(jax.device_get(out.qpos))), axis=-1))),
        'solver_niter_mean': float(np.mean(np.asarray(
            jax.device_get(out.solver_niter)))),
    }
    d = out
  else:
    metrics = benchmarks.run(mjm, nworld=args.nworld, nstep=args.nstep,
                             seed=args.seed)
  mt, mf = _memory_report(m)
  dt_, df = _memory_report(d)
  metrics['model_memory'] = mt
  metrics['data_memory'] = dt_
  metrics['model_memory_fields'] = mf
  metrics['data_memory_fields'] = df

  # per-world overflow accounting (m.opt.warn_overflow gates the warn;
  # --overflow_behavior=error aborts, mirroring the reference)
  # (the default 'step' path rolls out inside benchmarks.run and reports
  # overflow_worlds itself; here d holds post-rollout state only for the
  # --function/--replay paths)
  if (args.overflow_behavior != 'ignore' and hasattr(d, 'overflow') and
      'overflow_worlds' not in metrics):
    report = overflow_report(m, d)
    if report:
      metrics['overflow'] = report
      msg = ('overflow bits set: ' +
             ', '.join(f'{k} in {v} worlds' for k, v in report.items()))
      if args.overflow_behavior == 'error':
        print(msg, file=sys.stderr)
        sys.exit(1)
      if m.opt.warn_overflow:
        print('WARNING: ' + msg, file=sys.stderr)
  elif (args.overflow_behavior == 'error' and
        metrics.get('overflow_worlds', 0)):
    print(f"overflow in {metrics['overflow_worlds']} worlds",
          file=sys.stderr)
    sys.exit(1)

  if args.measure_alloc:
    # bucket stats over a fresh rollout tail (reference: testspeed.py
    # --measure_alloc / --measure_solver nacon/nefc/niter buckets)
    from mujoco_warp_tpu.ops import forward as fwd
    step_j = jax.jit(lambda dd: fwd.step(m, dd))
    dd = step_j(d)
    ncon_s, nefc_s, niter_s = [], [], []
    for _ in range(10):
      dd = step_j(dd)
      ncon_s.append(np.asarray(jax.device_get(dd.ncon_active)))
      nefc_s.append(np.asarray(jax.device_get(dd.nefc_active)))
      niter_s.append(np.asarray(jax.device_get(dd.solver_niter)))
    for key, vals in (('nacon', ncon_s), ('nefc', nefc_s),
                      ('solver_niter', niter_s)):
      arr = np.stack(vals)
      metrics[f'{key}_mean'] = float(arr.mean())
      metrics[f'{key}_p95'] = float(np.percentile(arr, 95))
      metrics[f'{key}_max'] = int(arr.max())

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
    top = list(metrics['data_memory_fields'].items())[:5]
    print('  Data memory top fields: ' +
          ', '.join(f'{k} {v/2**20:.1f} MiB' for k, v in top))
    if args.measure_alloc:
      print(f"  nacon mean {metrics['nacon_mean']:.1f} p95 "
            f"{metrics['nacon_p95']:.0f}; nefc mean "
            f"{metrics['nefc_mean']:.1f} p95 {metrics['nefc_p95']:.0f}; "
            f"niter p95 {metrics['solver_niter_p95']:.0f}")
    if args.event_trace:
      print('\nEvent trace (µs/step per stage):')
      for k, v in metrics['trace'].items():
        print(f'    {k:24s} {v:10.1f}')


if __name__ == '__main__':
  main()
