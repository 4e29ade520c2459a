"""Unit tests for the convention lint (contrib/kernel_analyzer).

Reference analog: contrib/kernel_analyzer's own test suite — each lint
rule gets a positive (finding) and negative (clean) fixture, plus the
repo itself must lint clean (the CI contract).
"""

import pathlib
import subprocess
import sys
import textwrap

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / 'contrib' / 'kernel_analyzer'))

import analyzer  # noqa: E402


def _lint(tmp_path, name, src):
  p = tmp_path / name
  p.write_text(textwrap.dedent(src))
  return analyzer.check_file(p)


def test_md_order_flagged(tmp_path):
  finds = _lint(tmp_path, 'ops_mod.py', """
      def step(d, m):
        return m, d
      """)
  assert any('precede' in msg for _, msg in finds), finds


def test_md_order_clean(tmp_path):
  finds = _lint(tmp_path, 'ops_mod.py', """
      def step(m, d, flag=False):
        return m, d
      """)
  assert not finds, finds


def test_positional_norm_flagged(tmp_path):
  finds = _lint(tmp_path, 'ops_mod.py', """
      import jax.numpy as jnp

      def f(x):
        return jnp.linalg.norm(x, 2)
      """)
  assert any('axis' in msg for _, msg in finds), finds


def test_pallas_at_update_flagged(tmp_path):
  finds = _lint(tmp_path, 'pallas_mod.py', """
      def kernel(x):
        return x.at[0].set(1.0)
      """)
  assert any('.at[' in msg or 'at' in msg.lower() for _, msg in finds), \
      finds


def test_pallas_xla_glue_exempt(tmp_path):
  finds = _lint(tmp_path, 'pallas_mod.py', """
      def glue(x):
        return x.at[0].set(1.0)  # xla-glue
      """)
  assert not finds, finds


def test_blockspec_memory_space_flagged(tmp_path):
  finds = _lint(tmp_path, 'pallas_mod.py', """
      import jax.experimental.pallas as pl

      def spec():
        return pl.BlockSpec((8, 128), lambda i: (0, i))
      """)
  assert any('memory_space' in msg for _, msg in finds), finds


def test_repo_lints_clean():
  """The engine itself must pass its own lint (the CI contract)."""
  res = subprocess.run(
      [sys.executable, str(REPO / 'contrib' / 'kernel_analyzer' /
                           'analyzer.py'),
       str(REPO / 'mujoco_warp_tpu')],
      capture_output=True, text=True)
  assert res.returncode == 0, res.stdout + res.stderr
