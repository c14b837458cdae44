"""Hydra-compatible config composition engine.

The reference framework (Jinbo-Hu/PSELDNets) drives everything through a Hydra 1.3
config tree (reference: configs/train.yaml:3-24, configs/experiment/*.yaml). This
package reimplements the subset of Hydra semantics that tree uses — defaults-list
composition, ``# @package _global_`` overlays, ``override /group:`` directives, CLI
``group=option`` / ``a.b.c=value`` overrides, and ``${...}`` interpolation — as a
small dependency-free engine, so the reference's experiment configs run unchanged
on the TPU-native stack.
"""

from .compose import Config, compose, parse_cli_overrides, to_dict

__all__ = ["Config", "compose", "parse_cli_overrides", "to_dict"]
