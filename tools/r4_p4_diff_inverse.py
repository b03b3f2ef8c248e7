"""Round-4 TPU batch, process 4: differentiable-mode numbers + the
realistic inverse-render demo (VERDICT r3 #4).

  1. bench._measure_diff() at the stated 128x128x32spp d8 shape on the
     real chip (the fields BENCH_r04 will carry).
  2. Inverse rendering at 128^2 from the COMMITTED 512^2 golden: the
     target is tests/golden/ours_cornell_512.png box-downsampled to 128^2
     and linearized; the optimizer must recover the Cornell wall/floor
     albedos (and roughness) from a perturbed start. Writes a convergence
     curve (loss + per-material albedo error vs step) for docs/.

Writes /tmp/r4_p4.json + /tmp/r4_inverse_curve.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import jax

    skip_bench = "--skip-bench" in sys.argv
    depth = int(sys.argv[sys.argv.index("--depth") + 1]) if "--depth" in sys.argv else 8
    steps_n = int(sys.argv[sys.argv.index("--steps") + 1]) if "--steps" in sys.argv else 300
    lr = float(sys.argv[sys.argv.index("--lr") + 1]) if "--lr" in sys.argv else 5e-2

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    assert jax.default_backend() not in ("cpu",)

    import jax.numpy as jnp
    import numpy as np

    import bench
    from cornelis_tpu.diff.inverse import InverseRenderer, apply_params
    from cornelis_tpu.math.color import srgb_decode
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box
    from cornelis_tpu.utils.png import read_png

    out = {}

    if not skip_bench:
        t0 = time.time()
        out["diff"] = bench._measure_diff()
        print("diff bench:", json.dumps(out["diff"]), f"({time.time()-t0:.0f} s)",
              flush=True)
    with open("/tmp/r4_p4.json", "w") as f:
        json.dump(out, f, indent=1)

    # --- inverse render at 128^2 from the committed golden --------------
    W = 128
    golden8 = read_png(os.path.join(REPO, "tests", "golden", "ours_cornell_512.png"))
    lin512 = np.asarray(
        srgb_decode(jnp.asarray(golden8.astype(np.float32) / 255.0), standard=False)
    )
    # 4x4 box downsample 512 -> 128 (the golden was rendered at 512; the
    # optimization runs at 128 -- the target must match the render grid).
    target = lin512.reshape(W, 4, W, 4, 3).mean(axis=(1, 3))
    # The 8-bit golden CLIPS at 1.0; the render produces physical radiance
    # (~15 on the light disc). Zero-weight every 128^2 pixel containing a
    # clipped source pixel or the unweighted MSE there swamps the real
    # gradients (measured: loss floor 3.9, albedo diverged).
    clipped = (golden8.max(axis=-1) >= 250).reshape(W, 4, W, 4).max(axis=(1, 3))
    weight = (~clipped).astype(np.float32)
    print(f"masked {int(clipped.sum())}/{W*W} clipped pixels", flush=True)

    true_scene = compile_scene(cornell_box())
    true_albedo = np.stack(
        [np.asarray(c) for c in true_scene.mat_albedo], axis=-1
    )  # (M, 3)

    # Perturbed start: blend every albedo toward mid-grey and flatten
    # roughness -- the optimizer must pull them back from image evidence.
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
        max_depth=depth,
        learning_rate=lr,
        seed=3,
        weight=jnp.asarray(weight),
    )

    STEPS = steps_n
    curve = []
    t0 = time.time()
    for step in range(1, STEPS + 1):
        loss = inv.step()
        if step % 10 == 0 or step == 1:
            rec = inv.scene()
            rec_albedo = np.stack([np.asarray(c) for c in rec.mat_albedo], -1)
            err = float(np.abs(rec_albedo - true_albedo).mean())
            curve.append(
                {"step": step, "loss": round(loss, 6),
                 "albedo_mae": round(err, 4),
                 "elapsed_s": round(time.time() - t0, 1)}
            )
            print(f"  step {step}: loss {loss:.3e} albedo MAE {err:.4f}",
                  flush=True)
            with open("/tmp/r4_inverse_curve.json", "w") as f:
                json.dump(curve, f, indent=1)

    rec = inv.scene()
    rec_albedo = np.stack([np.asarray(c) for c in rec.mat_albedo], -1)
    out["inverse"] = {
        "shape": f"{W}x{W}x32spp_d{depth}",
        "steps": STEPS,
        "total_s": round(time.time() - t0, 1),
        "final_loss": curve[-1]["loss"],
        "final_albedo_mae": curve[-1]["albedo_mae"],
        "start_albedo_mae": round(
            float(
                np.abs(
                    np.stack([np.asarray(c) for c in start.mat_albedo], -1)
                    - true_albedo
                ).mean()
            ),
            4,
        ),
        "per_material_albedo": {
            "true": true_albedo.round(3).tolist(),
            "recovered": rec_albedo.round(3).tolist(),
        },
    }
    with open("/tmp/r4_p4.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["inverse"])[:800], flush=True)

    # No mark_process_warm here: this process ran only the XLA wavefront,
    # so it must not stamp Pallas device warmth.
    print("P4 DONE", flush=True)


if __name__ == "__main__":
    main()
