"""Run the benchmark suite (reference: benchmarks/run.py + sweep.py).

  python benchmarks/run.py [--benchmark NAME ...] [--nworld N]
      [--nstep N] [--output results.jsonl]

Emits one JSON line per scene (the reference's nightly JSONL schema).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# `python benchmarks/run.py` puts benchmarks/ itself on sys.path, not the
# repo root — add the root so `import benchmarks` / `import
# mujoco_warp_tpu` resolve regardless of invocation style
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
  sys.path.insert(0, _ROOT)


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument('--benchmark', action='append', default=None)
  p.add_argument('--nworld', type=int, default=None)
  p.add_argument('--nstep', type=int, default=None)
  p.add_argument('--output', default=None)
  p.add_argument('--cpu', action='store_true',
                 help='force the CPU backend (sweep --mock; the axon '
                      'sitecustomize overrides JAX_PLATFORMS env vars, '
                      'so this must be an in-process config flip)')
  args = p.parse_args(argv)

  if args.cpu or os.environ.get('MWTPU_FORCE_CPU'):
    import jax
    jax.config.update('jax_platforms', 'cpu')

  import mujoco

  from benchmarks import BENCHMARKS, REPLAYS
  from mujoco_warp_tpu import benchmarks as harness, io

  names = args.benchmark or list(BENCHMARKS)
  out_f = open(args.output, 'a') if args.output else None
  for name in names:
    path, nworld, nstep, overrides, nconmax = BENCHMARKS[name]
    nworld = args.nworld or nworld
    nstep = args.nstep or nstep
    mjm = mujoco.MjModel.from_xml_path(path)
    try:
      metrics = harness.run(mjm, nworld=nworld, nstep=nstep,
                            nconmax=nconmax, overrides=overrides,
                            replay=REPLAYS.get(name))
    except Exception as e:  # record failures, keep sweeping
      metrics = {'error': f'{type(e).__name__}: {e}'}
    rec = {'benchmark': name, **metrics}
    line = json.dumps(rec)
    print(line, flush=True)
    if out_f:
      out_f.write(line + '\n')
      out_f.flush()
  if out_f:
    out_f.close()


if __name__ == '__main__':
  main()
