"""Minimal reproducer for the XLA:TPU fori_loop counter miscompile
(round-5 finding; the reason integrator.trace_paths does not carry the
bounce depth through a lax.fori_loop).

On this machine's tunneled TPU backend (v5e, 'axon' platform, jit), a
scalar int32 counter CARRIED through a fori_loop and compared against a
constant inside the body takes the wrong branch on every iteration:

    def body(_, carry):
        val, depth = carry                      # depth: int32 scalar, +1/iter
        w = jnp.where(depth > 0, 0.009, 1.0)    # expect 1.0 on iter 0
        return (val + w * x, depth + 1)
    fori_loop(0, 3, body, (0.0, int32(0)))      # expect 1.018*x

    measured on TPU jit : 0.027 * x   (the depth>0 branch on ALL iters)
    eager TPU, CPU jit  : 1.018 * x   (correct)
    lax.while_loop with the SAME carried counter in its cond+body: correct

The duplicate-induction-variable pattern (fori's own counter + the
carried one) is the likely trigger. In the renderer this silently broke
every depth-dependent rule in the DIFF path on TPU (Russian-roulette
young-depth survival, the NEE emission MIS weight at depth 0, the clamp
growth): a direct-emitter pixel rendered 0.134 instead of 15.0 --
exactly L_e x the depth>0 MIS weight. Caught by the round-5 unmasked
inverse-render demo (loss floor ~3.8); fixed by Python-unrolling the
bounce loop (trace-time-constant depth; integrator.trace_paths), with
tests/test_diff.py exercising the unrolled path on every run.

Run on the TPU host: python tools/fori_counter_bug.py
Exit 0 = backend correct; exit 1 = bug present (expected on axon).
"""

from __future__ import annotations


def main() -> int:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        def body(_, carry):
            val, depth = carry
            w = jnp.where(depth > 0, jnp.float32(0.009), jnp.float32(1.0))
            return (val + w * x, depth + 1)

        out, _ = jax.lax.fori_loop(
            0, 3, body, (jnp.zeros_like(x), jnp.zeros((), jnp.int32))
        )
        return out

    got = float(f(jnp.ones((8, 128), jnp.float32))[0, 0])
    want = 1.0 + 2 * 0.009
    ok = abs(got - want) < 1e-4
    print(
        f"backend={jax.default_backend()} got={got:.6f} want={want:.6f} "
        f"{'OK' if ok else 'MISCOMPILED (carried fori counter took wrong branch)'}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
