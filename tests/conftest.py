"""Test config: CPU backend, 8 virtual devices, persistent compile cache.

Counterpart of the reference's CPU-backend CI strategy (conftest.py adds
--cpu; ci.yml runs the suite on ubuntu-latest) — kernels are portable, so
correctness CI needs no TPU.  XLA_FLAGS must be set before backend init.
The persistent compilation cache is load-bearing on this 1-core machine:
XLA:CPU compiles are ~100x slower than typical dev boxes, so every jitted
program is cached on disk across test runs.
"""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
  os.environ['XLA_FLAGS'] = (
      _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
# headless OpenGL for renderer-oracle tests (must precede mujoco import)
os.environ.setdefault('MUJOCO_GL', 'egl')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
