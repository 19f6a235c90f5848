"""Adroit-style five-digit dexterous hand for the hand-manipulation suite.

The reference's pen/relocate/hammer/door run on the external mj_envs
24-DOF Adroit Shadow Hand (README.md:33-35, examples/configs/hand/
pen-v0.yml "In-hand manipulation of a 6-DOF pen with a 24-DOF Shadow
Hand"). This module provides the TPU-native counterpart used by those
tasks: a FIVE-digit hand — four fingers + an opposing thumb-like digit —
with 4 hinge DOF per digit (abduction + three phalanx curls), 20
actuated DOF total, whose fingertips manipulate FREE (quaternion-state)
objects through the compliant contact model in `envs/contact.py` —
actions actuate hand joints only, never the object.

Digit layout (palm plane z = 0, objects rest on / above the palm): four
fingers at (±x_spread, ±y_spread, height) plus the thumb at
(0, -y_spread), segments pointing down and inward so digits on +y
oppose digits on -y like finger/thumb pinch pairs. Abduction (about z)
slides a fingertip along x; the three curls (about x) close the pinch
in the y-z plane — the extra phalanx over round-2's 3-DOF digits deepens
the reachable envelope enough for the full mj_envs ±1 rad pen
orientation targets (envs/pen.py). Segment geometry is a parameter:
the pen hand uses long manipulation segments, the arm-mounted grip hand
(relocate/hammer/door) short cage segments whose neutral tip ring
matches the tuned round-2 grasp cage exactly.

The hand remains smaller than Adroit's 24 hinge DOF (20 vs 24; Adroit
adds 2 wrist DOF and a 5-DOF thumb) but is now in the reference's
morphology class: five digits, per-phalanx articulation, free rigid
objects under gravity actuated only through frictional contact.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..engine import chain as rb

# Manipulation-hand digit geometry (meters): per-phalanx (inward, down)
# reach. Neutral tips land at |y| = Y_SPREAD - 0.042 = 0.021,
# z = HEIGHT - 0.076 = 0.054 — just below the raised-cradle pen center
# (envs/pen.py, center z = 0.072), exactly engaging a resting pen of
# radius 0.012 with tip radius 0.009.
SEGS_PEN = ((0.018, 0.030), (0.014, 0.026), (0.010, 0.020))
X_SPREAD = 0.045
Y_SPREAD = 0.063
HEIGHT = 0.130
TIP_R = 0.009
_SEG_R = 0.008

N_DIGITS = 5
DOF_PER_DIGIT = 4                        # abduction + 3 curls
BODIES_PER_DIGIT = DOF_PER_DIGIT         # one body per hinge
N_HAND_DOF = N_DIGITS * DOF_PER_DIGIT    # 20

# Grip-hand (relocate/hammer/door) segments: total reach (0.034 inward,
# 0.053 down) — identical to the tuned round-2 cage, so the neutral tip
# ring closing onto a ~0.044-radius sphere from the 0.050-radius ring is
# preserved; the 4th DOF and 5th digit only ADD closing envelope.
SEGS_GRIP = ((0.012, 0.020), (0.012, 0.018), (0.010, 0.015))
GRIP_BASES = [(sx * 0.045, s * 0.045, 0.065, s)
              for s in (1.0, -1.0) for sx in (1.0, -1.0)] \
    + [(0.0, -0.0636, 0.065, -1.0)]
PALM_LOCAL = (0.0, 0.0, 0.075)
PALM_R = 0.015


def digit_bases() -> List[Tuple[float, float, float, float]]:
    """(x, y, z, side) for the five knuckles; side = sign(y). The thumb
    sits at x = 0 on the -y side, opposing the +y finger pair across
    the pen's resting line."""
    return [(sx * X_SPREAD, s * Y_SPREAD, HEIGHT, s)
            for s in (1.0, -1.0) for sx in (1.0, -1.0)] \
        + [(0.0, -Y_SPREAD, HEIGHT, -1.0)]


def hand_bodies(parent: int = -1,
                bases: Optional[Sequence[Tuple[float, float, float, float]]]
                = None,
                gear: float = 0.4, damping: float = 0.08,
                armature: float = 0.01,
                segments: Sequence[Tuple[float, float]] = SEGS_PEN
                ) -> Tuple[list, list]:
    """Body dicts for the hand plus per-digit contact metadata.

    Returns (bodies, digits) where each digits entry is
    (distal_body_index, tip_local [3], mid_local [3]) — the two contact
    spheres per digit fed to `engine.chain.points_frame`. Knuckle dicts
    carry a `mount=True` marker; intra-hand parent indices are local
    (relative to the start of the returned list). Callers embedding the
    hand at a nonzero index base must offset the local parents and
    re-parent the marked knuckles (see `arm_hand_bodies`) — the marker,
    not the parent VALUE, distinguishes knuckles, so a digit layout
    whose local indices happen to collide with the mount index cannot
    silently build a wrong topology.
    """
    bodies: list = []
    digits: list = []
    segs = list(segments)
    for (bx, by, bz, s) in bases or digit_bases():
        k = len(bodies)
        bodies.append(dict(
            pos=(bx, by, bz), axis=(0, 0, 1), range=(-0.45, 0.45),
            parent=parent, mount=True, gear=gear, damping=damping,
            armature=armature, geoms=[]))
        # phalanx chain: each link hinges about x at the previous link's
        # endpoint, its capsule reaching (inward, down) = (-s*dy, -dz)
        prev_end = (0.0, 0.0, 0.0)
        for j, (dy, dz) in enumerate(segs):
            r = _SEG_R + 0.001 if j == 0 else _SEG_R
            geoms = [rb.capsule_geom(r, (0, 0, 0, 0, -s * dy, -dz))]
            if j == len(segs) - 1:
                geoms.append(rb.sphere_geom(TIP_R, (0, -s * dy, -dz)))
            bodies.append(dict(
                pos=prev_end, axis=(1, 0, 0), range=(-1.3, 1.3),
                parent=k + j, gear=gear, damping=damping,
                armature=armature, geoms=geoms))
            prev_end = (0.0, -s * dy, -dz)
        dy, dz = segs[-1]
        digits.append((k + len(segs),
                       np.array([0.0, -s * dy, -dz], np.float32),
                       np.array([0.0, -s * dy / 2, -dz / 2], np.float32)))
    return bodies, digits


def arm_hand_bodies(bases=None, arm_gear: float = 8.0,
                    arm_damping: float = 2.0, arm_armature: float = 0.2):
    """3-slide arm (x/y/z translation, z carries a palm plate) with the
    five-digit grip hand mounted on the z-slide — the shared base
    assembly of relocate/hammer/door. Returns (bodies, digits) with
    digit body indices and knuckle parents already offset past the 3 arm
    bodies. All values are numpy/python — no jax arrays, so importing an
    env module never touches the backend; `engine.chain.build_chain`
    runs lazily at make() time."""
    bases = GRIP_BASES if bases is None else bases
    slide_axes = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    bodies = [dict(pos=(0, 0, 0), axis=ax, type="slide",
                   range=(-0.6, 0.6) if i < 2 else (-0.05, 0.5),
                   parent=i - 1, gear=arm_gear, damping=arm_damping,
                   armature=arm_armature,
                   geoms=[] if i < 2 else
                   [rb.box_geom((0.04, 0.04, 0.008), (0, 0, 0.075))])
              for i, ax in enumerate(slide_axes)]
    hand, digits = hand_bodies(parent=2, bases=bases, segments=SEGS_GRIP)
    for b in hand:
        if not b.pop("mount", False):   # knuckles keep the mount parent;
            b["parent"] += 3            # local digit links shift past the arm
    bodies += hand
    return bodies, [(b + 3, tip, mid) for (b, tip, mid) in digits]


def hand_joint_names() -> List[str]:
    """MuJoCo-style joint names for the dyn-randomize name tables."""
    names = []
    for d in range(N_DIGITS):
        names += [f"digit{d}_abduct", f"digit{d}_proximal",
                  f"digit{d}_middle", f"digit{d}_distal"]
    return names
