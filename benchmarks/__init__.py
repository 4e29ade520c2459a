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

# entries: (mjcf path, nworld, nstep, overrides, nconmax)
# nconmax: per-world active-contact budget (int or per-condim dict, see
# io.put_model); None = lossless slots — mirrors the reference's
# hand-tuned per-scene nconmax/njmax capacity knobs
BENCHMARKS = {
    # flagship: the reference suite's own humanoid scene (27 DoF,
    # Newton+Euler, 8192 worlds) — apples-to-apples with BASELINE.md
    # scene-tuned budgets (reference: nconmax=24/njmax=64,
    # benchmarks/humanoid/__init__.py:1-9): {1:12, 3:24} is the measured
    # overflow-0 budget over the 1000-step OU rollout at 8192 worlds
    # (driver TPU run 2026-08-19: overflow_worlds=0; tighter budgets
    # {1:6,3:12}/{1:10,3:20} overflow in hundreds of worlds and are not
    # valid configs — numbers count only at overflow_worlds=0)
    'humanoid': (os.path.join(_REF, 'humanoid/humanoid.xml'), 8192, 1000,
                 (), {1: 12, 3: 24}),
    # 81-DoF sparse crossover scene from the reference suite
    'three_humanoids': (os.path.join(_REF, 'humanoid/three_humanoids.xml'),
                        8192, 1000, (), {1: 50, 3: 50}),
    # dm_control humanoid: 34 sensors, all within the fused sensor set
    # (frame/joint/subtree/touch classes) — rides the fused path.
    # Budget ladder (TPU, 2026-08-19): {1:8,3:16} overflowed 21/8192
    # worlds, {1:12,3:24} overflowed 1/8192; {1:16,3:32} is the
    # overflow-0 rung
    'humanoid_dmc': (os.path.join(_DMC, 'humanoid.xml'), 8192, 1000, (),
                     {1: 16, 3: 32}),
    # G1-class stand-in (reference benchmarks/g1: implicitfast humanoid
    # robot; menagerie assets unavailable in this zero-egress image, so
    # the flagship humanoid runs under implicitfast — same integrator
    # class, same fused-path coverage: K4's damped lane factor IS the
    # (M − h·qDeriv) solve for FIXED-gain/NONE-bias actuators)
    'humanoid_implicitfast': (os.path.join(_REF, 'humanoid/humanoid.xml'),
                              8192, 1000, ('opt.integrator=implicitfast',),
                              {1: 12, 3: 24}),
    'walker': (os.path.join(_DMC, 'walker.xml'), 8192, 1000, (), None),
    'cheetah': (os.path.join(_DMC, 'cheetah.xml'), 8192, 1000, (), None),
    'hopper': (os.path.join(_DMC, 'hopper.xml'), 8192, 1000, (), None),
    # contact-heavy primitive zoo (condim 1/3/4/6)
    'spheres': (os.path.join(_REPO, 'spheres.xml'), 8192, 1000, (), None),
    # equality/limit/friction + actuators
    'constraints': (os.path.join(_REPO, 'constraints.xml'), 8192, 1000, (),
                    None),
    # CG solver crossover scene
    'spheres_cg': (os.path.join(_REPO, 'spheres.xml'), 8192, 100,
                   ('opt.solver=cg',), None),
    # elliptic cones (jnp solver path)
    'spheres_elliptic': (os.path.join(_REPO, 'spheres.xml'), 4096, 1000,
                         ('opt.cone=elliptic',), None),
    # cloth: 81-vertex flex grid, edge equality + vertex-plane contacts
    # (toy; CG solver, 243 DoF)
    'cloth': (os.path.join(_REPO, 'cloth.xml'), 32, 1000, (), None),
    # the reference suite's own cloth scene (900-vertex towel over a
    # mannequin, 2706 DoF, CG + pyramidal, selfcollide) — rides the
    # tree-blocked mass matrix + compact-chain EFC representations;
    # contact budget mirrors the reference (nconmax=2200,
    # benchmarks/cloth/__init__.py:6)
    'cloth_ref': (os.path.join(_REF, 'cloth/scene.xml'), 32, 1000, (),
                  {3: 2200}),
    # sleeping payoff class (reference benchmarks/aloha clutter: awake
    # actuated arm + objects that settle and sleep; world-level skip
    # never fires — gains come from masked sleeping rows + the solver's
    # stable-state fast path).  Paired with _nosleep for the on/off line.
    'clutter_arm': (os.path.join(_REPO, 'clutter_arm.xml'), 4096, 1000,
                    (), None),
    'clutter_arm_nosleep': (os.path.join(_REPO, 'clutter_arm.xml'), 4096,
                            1000, ('opt.enableflags=0',), None),
    # mesh manipulation: the reference's aloha_pot test_data scene (204
    # geoms, 134 meshes, 23 DoF, 30,658 candidate pairs) — rides the
    # broadphase-pruned collision path; reference budget nconmax=24 and
    # ctrl REPLAY of the recorded lift (benchmarks/aloha/__init__.py:17-25
    # — replay="lift_pot.npz"); OU noise is applied around the replayed
    # ctrl as the reference's unroll does (cli.py:94-136)
    # condim-4 budget: the 4 gripper-finger geoms (geom_condim=4) put
    # 2588 candidate pairs in the condim-4 class; leaving it lossless
    # allocates a (8192, 2588, nv, 3) contact Jacobian = 43 GB → OOM
    'aloha_pot': (os.path.join('/root/reference/mujoco_warp/test_data',
                               'aloha_pot/scene.xml'), 8192, 100, (),
                  {1: 8, 3: 24, 4: 8}),
}

# optional ctrl-replay NPZ per benchmark (reference: "replay" key in
# benchmarks/*/__init__.py BENCHMARKS entries)
REPLAYS = {
    'aloha_pot': os.path.join(_REF, 'aloha/lift_pot.npz'),
}
