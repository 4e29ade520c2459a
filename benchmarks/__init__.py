"""Benchmark suite registry (reference: benchmarks/*/__init__.py).

Each entry: (mjcf path, nworld, nstep, overrides).  Scenes use models
shipped with installed packages (dm_control suite) or this repo — the
reference instead pins external git assets (menagerie etc.), which this
zero-egress environment cannot fetch; equivalents are tracked for later
rounds.
"""

import os

_DMC = '/opt/venv/lib/python3.12/site-packages/dm_control/suite'
_REF = '/root/reference/benchmarks'
_REPO = os.path.join(os.path.dirname(__file__), '..', 'mujoco_warp_tpu',
                     'models')

BENCHMARKS = {
    # flagship: the reference suite's own humanoid scene (27 DoF,
    # Newton+Euler, 8192 worlds) — apples-to-apples with BASELINE.md
    'humanoid': (os.path.join(_REF, 'humanoid/humanoid.xml'), 8192, 100,
                 ()),
    # 81-DoF sparse crossover scene from the reference suite
    'three_humanoids': (os.path.join(_REF, 'humanoid/three_humanoids.xml'),
                        8192, 100, ()),
    'humanoid_dmc': (os.path.join(_DMC, 'humanoid.xml'), 8192, 100, ()),
    'walker': (os.path.join(_DMC, 'walker.xml'), 8192, 100, ()),
    'cheetah': (os.path.join(_DMC, 'cheetah.xml'), 8192, 100, ()),
    'hopper': (os.path.join(_DMC, 'hopper.xml'), 8192, 100, ()),
    # contact-heavy primitive zoo (condim 1/3/4/6)
    'spheres': (os.path.join(_REPO, 'spheres.xml'), 8192, 100, ()),
    # equality/limit/friction + actuators
    'constraints': (os.path.join(_REPO, 'constraints.xml'), 8192, 100, ()),
    # CG solver crossover scene
    'spheres_cg': (os.path.join(_REPO, 'spheres.xml'), 8192, 100,
                   ('opt.solver=cg',)),
    # elliptic cones (jnp solver path)
    'spheres_elliptic': (os.path.join(_REPO, 'spheres.xml'), 4096, 100,
                         ('opt.cone=elliptic',)),
}
