"""Policy ABC (reference mjmpc/policies/policy.py:6-22)."""
from __future__ import annotations

import abc


class Policy(abc.ABC):
    """Host-side policy interface: the thin stateful shell around the pure
    jitted solve functions, mirroring the reference's Policy ABC so that
    episode drivers are interchangeable."""

    @abc.abstractmethod
    def get_action(self, state):
        ...

    def get_action_seq(self, state, horizon: int):
        raise NotImplementedError

    def reset(self, seed=None):
        ...
