"""Trajectory rendering and video dumping.

Replaces the reference's mujoco_py viewer path (helpers.render_trajs /
dump_videos, /root/reference/mjmpc/utils/helpers.py:18-81; skvideo mp4
writer): matplotlib-Agg frames drawn from recorded env-state pytrees —
chain envs render their kinematic skeleton via forward kinematics; the
classic-control envs have analytic sketches. Videos via imageio (mp4
when ffmpeg is present, GIF fallback).
"""
from .render import render_trajectory, dump_videos, SUPPORTED

__all__ = ["render_trajectory", "dump_videos", "SUPPORTED"]
