"""Test config: run on CPU with 8 virtual devices for sharding tests.

Counterpart of the reference's CPU-backend CI strategy (conftest.py adds
--cpu; ci.yml runs the suite on ubuntu-latest) — kernels are portable, so
correctness CI needs no TPU.  XLA_FLAGS must be set before backend init;
jax_platforms is forced to cpu via config (overrides any site default).
"""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
  os.environ['XLA_FLAGS'] = (
      _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
