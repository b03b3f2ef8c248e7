"""Round-5 differentiable-NEE evidence (VERDICT r4 #2).

1. GRADIENT-VARIANCE RATIO at equal spp: empirical variance over
   independent keys of d mean(image) / d mat_albedo, path vs nee mode
   (both detached, the production estimator). This is the number that
   justifies plumbing NEE through the diff stack at its ~2x step cost.

2. INVERSE DEMO at 256^2 from the COMMITTED 512^2 golden
   (tests/golden/ours_cornell_512.png, box-downsampled 2x2, linearized,
   clipped-highlight pixels zero-weighted): recover all Cornell material
   albedos + roughness with mode=nee, and a path-mode run with identical
   settings for contrast. Acceptance (VERDICT): white-wall albedo error
   < 0.05 (round 4 bottomed at 0.12 with path mode at 128^2).

   Caveat measured rather than hidden: the committed golden is a
   PATH-mode (reference-estimator) render, and nee converges to a mean
   offset 0.060 RMS from it (README). The white wall is diffuse, where
   the quirk-pdf offset is small; the recovered-albedo tables below
   carry whatever residual it induces.

Writes /tmp/r5_inverse.json + docs/perf_r5/r5_inverse_curve.json.
Run on the TPU host: python tools/r5_inverse.py [--steps N] [--lr X]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gradient_variance_ratio(n_keys: int = 8):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cornelis_tpu.diff import render_diff
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box

    W = 128
    SPP = 8
    scene = compile_scene(cornell_box())

    def albedo_grad(mode, seed):
        def fn(albedo):
            img = render_diff(
                scene._replace(mat_albedo=albedo),
                jax.random.key(seed),
                width=W,
                height=W,
                spp=SPP,
                max_depth=8,
                mode=mode,
            )
            return jnp.mean(img)

        g = jax.jit(jax.grad(fn), static_argnums=())(scene.mat_albedo)
        return np.concatenate([np.asarray(c) for c in g])

    out = {}
    for mode in ("path", "nee"):
        t0 = time.time()
        gs = np.stack([albedo_grad(mode, 1000 + s) for s in range(n_keys)])
        # Mean per-component variance over keys, normalized by the squared
        # mean gradient so the ratio is scale-free.
        var = gs.var(axis=0).mean()
        out[mode] = {
            "var": float(var),
            "mean_abs_grad": float(np.abs(gs.mean(axis=0)).mean()),
            "s": round(time.time() - t0, 1),
        }
        print(f"grad-var {mode}: {out[mode]}", flush=True)
    out["ratio_path_over_nee"] = out["path"]["var"] / out["nee"]["var"]
    print(f"gradient variance ratio path/nee at equal spp: "
          f"{out['ratio_path_over_nee']:.1f}x", flush=True)
    return out


def inverse_demo(mode: str, steps_n: int, lr: float, curve_path: str | None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cornelis_tpu.diff.inverse import InverseRenderer
    from cornelis_tpu.math.color import srgb_decode
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box
    from cornelis_tpu.utils.png import read_png

    W = 256
    golden8 = read_png(os.path.join(REPO, "tests", "golden", "ours_cornell_512.png"))
    lin512 = np.asarray(
        srgb_decode(jnp.asarray(golden8.astype(np.float32) / 255.0), standard=False)
    )
    target = lin512.reshape(W, 2, W, 2, 3).mean(axis=(1, 3))
    clipped = (golden8.max(axis=-1) >= 250).reshape(W, 2, W, 2).max(axis=(1, 3))
    weight = (~clipped).astype(np.float32)

    true_scene = compile_scene(cornell_box())
    true_albedo = np.stack([np.asarray(c) for c in true_scene.mat_albedo], -1)

    start = true_scene._replace(
        mat_albedo=type(true_scene.mat_albedo)(
            x=jnp.clip(true_scene.mat_albedo.x * 0.4 + 0.3, 0.02, 0.95),
            y=jnp.clip(true_scene.mat_albedo.y * 0.4 + 0.3, 0.02, 0.95),
            z=jnp.clip(true_scene.mat_albedo.z * 0.4 + 0.3, 0.02, 0.95),
        ),
        mat_roughness=jnp.full_like(true_scene.mat_roughness, 0.35),
    )

    inv = InverseRenderer(
        start,
        jnp.asarray(target),
        fields=("mat_albedo", "mat_roughness"),
        width=W,
        height=W,
        spp=32,
        max_depth=16,
        learning_rate=lr,
        seed=3,
        weight=jnp.asarray(weight),
        mode=mode,
    )

    # Cornell material order (scene/library.py): 0 default, 1 red,
    # 2 white, 3 green, 4 gold, 5 light. White walls/floor = material 2.
    RED, WHITE, GREEN = 1, 2, 3

    def errors():
        rec = inv.scene()
        rec_albedo = np.stack([np.asarray(c) for c in rec.mat_albedo], -1)
        wall = float(
            np.abs(rec_albedo[[WHITE, GREEN, RED]] - true_albedo[[WHITE, GREEN, RED]]).mean()
        )
        white = float(np.abs(rec_albedo[WHITE] - true_albedo[WHITE]).mean())
        return rec_albedo, wall, white

    curve = []
    t0 = time.time()
    best = None
    for step in range(1, steps_n + 1):
        loss = inv.step()
        if step % 10 == 0 or step == 1:
            rec_albedo, wall, white = errors()
            row = {
                "step": step,
                "loss": round(loss, 6),
                "visible_wall_mae": round(wall, 4),
                "white_wall_mae": round(white, 4),
                "elapsed_s": round(time.time() - t0, 1),
            }
            curve.append(row)
            if best is None or wall < best["visible_wall_mae"]:
                best = dict(row)
            print(f"  [{mode}] step {step}: loss {loss:.3e} wall {wall:.4f} "
                  f"white {white:.4f}", flush=True)
            if curve_path:
                with open(curve_path, "w") as f:
                    json.dump(curve, f, indent=1)

    rec_albedo, wall, white = errors()
    return {
        "mode": mode,
        "shape": "256x256x32spp_d16",
        "steps": steps_n,
        "lr": lr,
        "total_s": round(time.time() - t0, 1),
        "final_visible_wall_mae": round(wall, 4),
        "final_white_wall_mae": round(white, 4),
        "best": best,
        "per_material_albedo": {
            "true": true_albedo.round(3).tolist(),
            "recovered": rec_albedo.round(3).tolist(),
        },
    }


def inverse_demo_float_target(steps_n: int, lr: float, curve_path: str | None):
    """The estimator-matched recovery: optimize the NEE renderer against a
    float-radiance NEE truth of the SAME scene (4096 spp sobol, rendered
    by the megakernel). No 8-bit clipping, no estimator-mean offset --
    this isolates what the round-5 differentiable NEE can actually
    recover. Acceptance: white-wall albedo error < 0.05 (VERDICT r4 #2).

    The companion run against the committed PATH-mode golden (above)
    measures what happens when the target's estimator does NOT match:
    the optimizer absorbs the 0.060-RMS quirk offset into albedo
    (round-5 measurement -- walls dim by ~0.1-0.2), which is why
    make_loss documents mode-matched targets as a requirement."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cornelis_tpu.diff.inverse import InverseRenderer
    from cornelis_tpu.ops.pallas_integrator import (
        host_scene_from_description,
        register_host_scene,
        render_chunk_pallas,
    )
    from cornelis_tpu.rng import make_key
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box
    from cornelis_tpu.utils.barrier import device_barrier

    W = 256
    TRUTH_SPP = 4096
    CHUNK = 512
    desc = cornell_box()
    true_scene = compile_scene(desc)
    on_tpu = jax.default_backend() not in ("cpu",)
    tkey = make_key(777)
    if on_tpu:
        register_host_scene(true_scene, host_scene_from_description(desc))
        acc = None
        for off in range(0, TRUTH_SPP, CHUNK):
            out = render_chunk_pallas(
                true_scene, tkey, np.uint32(off), width=W, height=W,
                spp_chunk=CHUNK, spp_total=TRUTH_SPP, max_depth=16,
                sampler="sobol", mode="nee",
            )
            acc = out if acc is None else acc + out
        target = np.asarray(device_barrier(acc)) / TRUTH_SPP
    else:  # CPU smoke: tiny truth via the XLA path
        from cornelis_tpu.integrator import render_chunk

        target = np.asarray(render_chunk(
            true_scene, tkey, jnp.uint32(0), width=W, height=W,
            spp_chunk=64, spp_total=64, max_depth=16,
            sampler="sobol", mode="nee",
        )) / 64

    true_albedo = np.stack([np.asarray(c) for c in true_scene.mat_albedo], -1)
    start = true_scene._replace(
        mat_albedo=type(true_scene.mat_albedo)(
            x=jnp.clip(true_scene.mat_albedo.x * 0.4 + 0.3, 0.02, 0.95),
            y=jnp.clip(true_scene.mat_albedo.y * 0.4 + 0.3, 0.02, 0.95),
            z=jnp.clip(true_scene.mat_albedo.z * 0.4 + 0.3, 0.02, 0.95),
        ),
        mat_roughness=jnp.full_like(true_scene.mat_roughness, 0.35),
    )
    inv = InverseRenderer(
        start, jnp.asarray(target), fields=("mat_albedo", "mat_roughness"),
        width=W, height=W, spp=32, max_depth=16, learning_rate=lr,
        seed=3, mode="nee",
    )
    RED, WHITE, GREEN = 1, 2, 3
    curve = []
    t0 = time.time()
    for step in range(1, steps_n + 1):
        loss = inv.step()
        if step % 10 == 0 or step == 1:
            rec = inv.scene()
            rec_albedo = np.stack([np.asarray(c) for c in rec.mat_albedo], -1)
            wall = float(np.abs(
                rec_albedo[[RED, WHITE, GREEN]] - true_albedo[[RED, WHITE, GREEN]]
            ).mean())
            white = float(np.abs(rec_albedo[WHITE] - true_albedo[WHITE]).mean())
            curve.append({
                "step": step, "loss": round(loss, 6),
                "visible_wall_mae": round(wall, 4),
                "white_wall_mae": round(white, 4),
                "elapsed_s": round(time.time() - t0, 1),
            })
            print(f"  [nee-self] step {step}: loss {loss:.3e} wall {wall:.4f} "
                  f"white {white:.4f}", flush=True)
            if curve_path:
                with open(curve_path, "w") as f:
                    json.dump(curve, f, indent=1)
    rec = inv.scene()
    rec_albedo = np.stack([np.asarray(c) for c in rec.mat_albedo], -1)
    return {
        "mode": "nee_selftarget",
        "target": f"nee sobol {TRUTH_SPP} spp float radiance (no clip mask)",
        "shape": "256x256x32spp_d16",
        "steps": steps_n,
        "lr": lr,
        "total_s": round(time.time() - t0, 1),
        "final_visible_wall_mae": curve[-1]["visible_wall_mae"],
        "final_white_wall_mae": curve[-1]["white_wall_mae"],
        "per_material_albedo": {
            "true": true_albedo.round(3).tolist(),
            "recovered": rec_albedo.round(3).tolist(),
        },
    }


def main() -> None:
    import jax

    steps_n = int(sys.argv[sys.argv.index("--steps") + 1]) if "--steps" in sys.argv else 300
    lr = float(sys.argv[sys.argv.index("--lr") + 1]) if "--lr" in sys.argv else 5e-2

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    out = {"grad_variance": gradient_variance_ratio()}
    with open("/tmp/r5_inverse.json", "w") as f:
        json.dump(out, f, indent=1)

    os.makedirs(os.path.join(REPO, "docs", "perf_r5"), exist_ok=True)
    out["nee"] = inverse_demo(
        "nee", steps_n, lr,
        os.path.join(REPO, "docs", "perf_r5", "r5_inverse_curve.json"),
    )
    with open("/tmp/r5_inverse.json", "w") as f:
        json.dump(out, f, indent=1)
    out["path"] = inverse_demo("path", steps_n, lr, None)
    with open("/tmp/r5_inverse.json", "w") as f:
        json.dump(out, f, indent=1)
    out["nee_selftarget"] = inverse_demo_float_target(
        steps_n, lr,
        os.path.join(REPO, "docs", "perf_r5", "r5_inverse_selftarget_curve.json"),
    )
    with open("/tmp/r5_inverse.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "grad_variance"},
                     default=str)[:1200], flush=True)
    print("R5 INVERSE DONE", flush=True)


if __name__ == "__main__":
    main()
