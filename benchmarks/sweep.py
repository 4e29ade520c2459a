"""sweep.py: run the benchmark suite across a range of git commits
(reference: benchmarks/sweep.py — the nightly perf-history tool).

Results land in per-benchmark JSONL files under ``benchmarks/history/``,
kept in commit-chronological order; the covered range is tracked in
``benchmarks/history/commit_range.json`` with "from"/"to" SHAs.

Directions:
  forward  - benchmark commits after the last recorded SHA (default HEAD)
  back     - benchmark commits before the earliest recorded SHA

Target: omitted (to HEAD / to root), an integer N (exactly N commits),
or a SHA prefix.

Usage:
  python benchmarks/sweep.py forward                # sweep to HEAD
  python benchmarks/sweep.py forward 5              # 5 commits forward
  python benchmarks/sweep.py back abc123f           # back to a commit
  python benchmarks/sweep.py forward -f humanoid    # filter by name
  python benchmarks/sweep.py forward --mock         # tiny shapes, smoke
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_HISTORY = os.path.join(_REPO, 'benchmarks', 'history')


def _git(*args, cwd=_REPO):
  return subprocess.run(['git', *args], cwd=cwd, capture_output=True,
                        text=True, check=True).stdout.strip()


def _all_commits():
  """Repo commits, oldest first."""
  return _git('rev-list', '--reverse', 'HEAD').splitlines()


def _commit_meta(sha):
  date, subject = _git('show', '-s', '--format=%cI%n%s', sha).split('\n', 1)
  return date, subject


def _load_range():
  p = os.path.join(_HISTORY, 'commit_range.json')
  if os.path.exists(p):
    with open(p) as f:
      return json.load(f)
  return None


def _save_range(rng):
  os.makedirs(_HISTORY, exist_ok=True)
  with open(os.path.join(_HISTORY, 'commit_range.json'), 'w') as f:
    json.dump(rng, f, indent=1)


def _select(direction, target):
  commits = _all_commits()
  rng = _load_range()
  if rng is None:
    # nothing recorded yet: start from HEAD (forward does just HEAD;
    # back walks from HEAD-1)
    todo = commits[-1:] if direction == 'forward' else commits[:-1][::-1]
  elif direction == 'forward':
    known = commits.index(rng['to'])
    todo = commits[known + 1:]
  else:
    known = commits.index(rng['from'])
    todo = commits[:known][::-1]
  if target:
    if target.isdigit():
      todo = todo[:int(target)]
    else:
      cut = [i for i, c in enumerate(todo) if c.startswith(target)]
      if not cut:
        raise SystemExit(f'target {target} not in the {direction} range')
      todo = todo[:cut[0] + 1]
  return commits, todo


def _run_at_commit(sha, names, mock, nworld, nstep):
  """Check the commit out in a temp worktree and run benchmarks/run.py
  there; returns the parsed JSONL records."""
  with tempfile.TemporaryDirectory(prefix='sweep_') as tmp:
    wt = os.path.join(tmp, 'wt')
    _git('worktree', 'add', '--detach', wt, sha)
    try:
      cmd = [sys.executable, os.path.join(wt, 'benchmarks', 'run.py')]
      for n in names or []:
        cmd += ['--benchmark', n]
      if mock:
        cmd += ['--nworld', str(nworld or 8), '--nstep', str(nstep or 3)]
      else:
        if nworld:
          cmd += ['--nworld', str(nworld)]
        if nstep:
          cmd += ['--nstep', str(nstep)]
      env = dict(os.environ)
      env['PYTHONPATH'] = wt + os.pathsep + env.get('PYTHONPATH', '')
      if mock:
        # the axon sitecustomize overrides JAX_PLATFORMS; run.py flips
        # the backend in-process when this is set
        env['MWTPU_FORCE_CPU'] = '1'
      out = subprocess.run(cmd, cwd=wt, capture_output=True, text=True,
                           env=env, timeout=7200)
      recs = []
      for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith('{'):
          try:
            recs.append(json.loads(line))
          except json.JSONDecodeError:
            pass
      if not recs:
        recs = [{'benchmark': '_sweep_error',
                 'error': (out.stderr or 'no output')[-500:]}]
      return recs
    finally:
      _git('worktree', 'remove', '--force', wt)


def _append_history(sha, date, subject, recs):
  """Insert records into per-benchmark JSONL, chronological by date."""
  os.makedirs(_HISTORY, exist_ok=True)
  for rec in recs:
    name = rec.pop('benchmark', 'unknown')
    row = {'sha': sha, 'date': date, 'subject': subject, **rec}
    path = os.path.join(_HISTORY, f'{name}.jsonl')
    rows = []
    if os.path.exists(path):
      with open(path) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    rows = [r for r in rows if r['sha'] != sha] + [row]
    rows.sort(key=lambda r: r['date'])
    with open(path, 'w') as f:
      for r in rows:
        f.write(json.dumps(r) + '\n')


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument('direction', choices=['forward', 'back'])
  p.add_argument('target', nargs='?', default=None,
                 help='N commits or a SHA prefix')
  p.add_argument('-f', '--filter', action='append', default=None,
                 help='benchmark name(s) to run')
  p.add_argument('--mock', action='store_true',
                 help='tiny shapes on CPU — pipeline smoke test')
  p.add_argument('--nworld', type=int, default=None)
  p.add_argument('--nstep', type=int, default=None)
  args = p.parse_args(argv)

  commits, todo = _select(args.direction, args.target)
  if not todo:
    print('nothing to sweep')
    return
  rng = _load_range() or {'from': todo[0], 'to': todo[0]}
  for sha in todo:
    date, subject = _commit_meta(sha)
    print(f'=== {sha[:9]} {date} {subject[:60]}', flush=True)
    recs = _run_at_commit(sha, args.filter, args.mock, args.nworld,
                          args.nstep)
    _append_history(sha, date, subject, recs)
    idx = commits.index(sha)
    if idx > commits.index(rng['to']):
      rng['to'] = sha
    if idx < commits.index(rng['from']):
      rng['from'] = sha
    _save_range(rng)
    for r in recs:
      key = 'steps_per_sec' if 'steps_per_sec' in r else 'error'
      print(f'    {r.get(key)}')


if __name__ == '__main__':
  main()
