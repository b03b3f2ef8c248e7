"""Differentiable rendering and inverse-render optimization -- the
capability layer the reference lacks entirely (north star, BASELINE.json
config 4)."""

from .inverse import (
    OPTIMIZABLE_FIELDS,
    InverseRenderer,
    apply_params,
    extract_params,
    make_loss,
)
from .render import render_diff

__all__ = [
    "OPTIMIZABLE_FIELDS",
    "InverseRenderer",
    "apply_params",
    "extract_params",
    "make_loss",
    "render_diff",
]
