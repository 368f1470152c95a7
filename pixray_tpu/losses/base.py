"""Loss plug-in contract (reference /root/reference/Losses/LossInterface.py).

JAX adaptation: ``get_loss`` runs INSIDE the jitted step, so implementations must
be pure/traceable — all randomness comes from the ``key`` argument, and any
host-side setup (file loading, weight download) happens in ``__init__``.

``cur_cutouts`` is {cut_size: (N, S, S, 3) batch}; ``out`` is the (H, W, C) canvas.
"""

from __future__ import annotations

import argparse


class LossInterface:
    #: optional pytree of model weights; the engine passes it through the jitted
    #: step as an ARGUMENT (closure-captured weights become jaxpr constants and
    #: blow up compile-request sizes on remote-compile setups)
    params = None

    def __init__(self, settings=None):
        self.settings = settings

    def instance_settings(self, arglist):
        """Optional per-instance string args from 'loss->arg1->arg2' specs."""

    @staticmethod
    def add_settings(parser):
        return parser

    def help(self):
        parser = argparse.ArgumentParser()
        parser = self.add_settings(parser)
        return "\n".join(
            f"parameter name: {d.dest}\nHelp: {d.help}" for d in parser._actions
        )

    def add_globals(self, args) -> dict:
        return {}

    def get_loss(self, cur_cutouts, out, args, globals=None, lossGlobals=None, key=None, params=None):
        raise NotImplementedError
