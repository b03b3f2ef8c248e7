"""Differentiable rendering and inverse-render optimization -- the
capability layer the reference lacks entirely (north star, BASELINE.json
config 4).

Gradient-fidelity boundary (stated plainly): render_diff uses DETACHED
sampling -- directions, RR decisions, and layer choices are
stop-gradiented, and gradients flow through the shading integrand at the
resulting fixed hit assignments. That makes MATERIAL gradients (albedo,
roughness, emission, tint) well-behaved (finite-difference-checked in
tests/test_diff.py) and supports end-to-end material recovery
(PERF.md 2b: Cornell wall albedos to 0.050 MAE from the committed
golden). GEOMETRY parameters (sphere_center, sphere_radius) get
INTERIOR gradients only: the visibility/silhouette term -- which
dominates for large position changes -- is not estimated, so recovering
a displaced object position diverges (measured round 4: a 0.6-unit
center offset walked AWAY under Adam). Radius passes small-perturbation
FD checks because its interior shading signal is strong. Closing this
needs edge-sampling or reparameterized visibility integrands
(Mitsuba-3-style) -- recorded future work, beyond the reference's
(non-differentiable) scope.

Round 5: every diff entry point takes mode="nee" -- the differentiable
next-event estimator (detached light sampling; gradients through BRDF,
emission, cosine, MIS weights) at ~1.8x the step cost of path mode for a
measured 7x lower albedo-gradient variance at equal spp (PERF.md 2b).
Targets must be rendered with the SAME mode: the two estimators converge
to means 0.060 RMS apart (the reference's quirk-pdf bias, README), and
an optimizer facing a mode-mismatched target absorbs that offset into
albedo (measured: walls dim by 0.1-0.2)."""

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
