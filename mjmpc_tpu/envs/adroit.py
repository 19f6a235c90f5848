"""Simplified Adroit-style dexterous hand for the hand-manipulation suite.

The reference's pen/relocate/hammer run on the external mj_envs 24-DOF
Adroit Shadow Hand (README.md:33-35, examples/configs/hand/pen-v0.yml
"In-hand manipulation of a 6-DOF pen with a 24-DOF Shadow Hand"). This
module provides the TPU-native counterpart used by those tasks: a
four-digit hand, 3 hinge DOF per digit (abduction + two curls, 12
actuated DOF), whose fingertips manipulate FREE (quaternion-state)
objects through the compliant contact model in `envs/contact.py` —
actions actuate hand joints only, never the object.

Digit layout (palm plane z = 0, objects rest on / above the palm): four
digits at (±x_spread, ±y_spread, height), segments pointing down and
inward so the digit pair on +y opposes the pair on -y like
finger/thumb pinch pairs. Abduction (about z) slides a fingertip along
x; the two curls (about x) close the pinch in the y-z plane. The digit
geometry constants put the four tip spheres exactly at object-surface
contact in the neutral configuration, so a small curl engages contact
and MPC discovers pinch/roll/lift strategies rather than fighting a
reach problem.

The hand is deliberately small (12 DOF vs Adroit's 24) but the control
problem is the reference's: free rigid objects under gravity, actuated
only through frictional fingertip contact.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..engine import chain as rb

# Digit geometry (meters). Tips land at |y| = Y_SPREAD - Y_REACH = 0.021,
# z = HEIGHT - Z_REACH = 0.012 in the neutral config — exactly touching a
# palm-resting pen capsule of radius 0.012 with tip radius 0.009.
X_SPREAD = 0.045
Y_SPREAD = 0.055
HEIGHT = 0.065
_PROX = (0.020, 0.030)    # (inward, down) reach of the proximal segment
_DIST = (0.014, 0.023)    # distal segment
TIP_R = 0.009
_SEG_R = 0.008

N_DIGITS = 4
DOF_PER_DIGIT = 3
N_HAND_DOF = N_DIGITS * DOF_PER_DIGIT   # 12

# Shared arm-mounted hand config (relocate/hammer/door): the digit cage
# closes onto a ~0.044-radius sphere (ball + tip radius) from a
# 0.050-radius neutral ring below the equator — sized for palm-scale
# objects; palm pad on the z-slide body.
GRIP_BASES = [(sx * 0.045, s * 0.045, 0.065, s)
              for s in (1.0, -1.0) for sx in (1.0, -1.0)]
PALM_LOCAL = (0.0, 0.0, 0.075)
PALM_R = 0.015


def digit_bases() -> List[Tuple[float, float, float, float]]:
    """(x, y, z, side) for the four knuckles; side = sign(y)."""
    return [(sx * X_SPREAD, s * Y_SPREAD, HEIGHT, s)
            for s in (1.0, -1.0) for sx in (1.0, -1.0)]


def hand_bodies(parent: int = -1,
                bases: Optional[Sequence[Tuple[float, float, float, float]]]
                = None,
                gear: float = 0.4, damping: float = 0.08,
                armature: float = 0.01) -> Tuple[list, list]:
    """Body dicts for the hand plus per-digit contact metadata.

    Returns (bodies, digits) where each digits entry is
    (distal_body_index, tip_local [3], mid_local [3]) — the two contact
    spheres per digit fed to `engine.chain.points_frame`. Body indices
    assume the returned dicts are appended starting at index
    len(existing bodies) == 0; callers embedding the hand later must
    offset `parent` handling themselves (indices here are relative to
    the start of the returned list plus `index_base` bookkeeping by the
    caller).
    """
    bodies: list = []
    digits: list = []
    for (bx, by, bz, s) in bases or digit_bases():
        k = len(bodies)
        bodies.append(dict(
            pos=(bx, by, bz), axis=(0, 0, 1), range=(-0.45, 0.45),
            parent=parent, gear=gear, damping=damping, armature=armature,
            geoms=[]))
        bodies.append(dict(
            pos=(0.0, 0.0, 0.0), axis=(1, 0, 0), range=(-1.3, 1.3),
            parent=k, gear=gear, damping=damping, armature=armature,
            geoms=[rb.capsule_geom(
                _SEG_R + 0.001, (0, 0, 0, 0, -s * _PROX[0], -_PROX[1]))]))
        bodies.append(dict(
            pos=(0.0, -s * _PROX[0], -_PROX[1]), axis=(1, 0, 0),
            range=(-1.3, 1.3), parent=k + 1, gear=gear, damping=damping,
            armature=armature,
            geoms=[rb.capsule_geom(
                _SEG_R, (0, 0, 0, 0, -s * _DIST[0], -_DIST[1])),
                rb.sphere_geom(TIP_R, (0, -s * _DIST[0], -_DIST[1]))]))
        digits.append((k + 2,
                       np.array([0.0, -s * _DIST[0], -_DIST[1]], np.float32),
                       np.array([0.0, -s * _DIST[0] / 2, -_DIST[1] / 2],
                                np.float32)))
    return bodies, digits


def arm_hand_bodies(bases=None, arm_gear: float = 8.0,
                    arm_damping: float = 2.0, arm_armature: float = 0.2):
    """3-slide arm (x/y/z translation, z carries a palm plate) with the
    four-digit hand mounted on the z-slide — the shared base assembly of
    relocate/hammer/door. Returns (bodies, digits) with digit body
    indices and knuckle parents already offset past the 3 arm bodies.
    All values are numpy/python — no jax arrays, so importing an env
    module never touches the backend; `engine.chain.build_chain` runs
    lazily at make() time."""
    bases = GRIP_BASES if bases is None else bases
    slide_axes = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    bodies = [dict(pos=(0, 0, 0), axis=ax, type="slide",
                   range=(-0.6, 0.6) if i < 2 else (-0.05, 0.5),
                   parent=i - 1, gear=arm_gear, damping=arm_damping,
                   armature=arm_armature,
                   geoms=[] if i < 2 else
                   [rb.box_geom((0.04, 0.04, 0.008), (0, 0, 0.075))])
              for i, ax in enumerate(slide_axes)]
    hand, digits = hand_bodies(parent=2, bases=bases)
    for b in hand:
        if b["parent"] != 2:
            b["parent"] += 3
    bodies += hand
    return bodies, [(b + 3, tip, mid) for (b, tip, mid) in digits]


def hand_joint_names() -> List[str]:
    """MuJoCo-style joint names for the dyn-randomize name tables."""
    names = []
    for d in range(N_DIGITS):
        names += [f"digit{d}_abduct", f"digit{d}_proximal",
                  f"digit{d}_distal"]
    return names
