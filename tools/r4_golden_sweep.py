"""Golden-arbitration SWEEP (VERDICT r3 #5): run the float64 reference
oracle on EVERY worst region instead of 3 spot checks.

For each clip-free 32x32 region of the committed 512^2 golden pair whose
max |region-mean diff| exceeds DIFF_BAR (plus a fixed sample of clean
regions), renders the region with tools/ref_oracle_trace.py's f64
transcription of the reference's algorithm and records
oracle/ours/reference means per channel. Verdict per region: which
renderer is closer to the reference's own algorithm.

Writes /tmp/r4_golden_sweep.json (copy into tests/golden/ + GOLDEN_512.md
after review). Runtime ~1-2 min per region single-core; run in the
background.

  python tools/r4_golden_sweep.py [spp]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GRID = 16
W = H = 512
DIFF_BAR = 0.03
EXTRA_CLEAN = [(5, 5), (8, 8), (12, 3), (6, 12)]  # fixed "random" sample


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from cornelis_tpu.math.color import srgb_decode
    from cornelis_tpu.utils.png import read_png
    from tools import ref_oracle_trace as oracle

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

    def linearize(raw8):
        return np.asarray(
            srgb_decode(jnp.asarray(raw8.astype(np.float32) / 255.0), standard=False)
        )

    ref8 = read_png(os.path.join(REPO, "tests", "golden", "reference_cornell_512.png"))
    ours8 = read_png(os.path.join(REPO, "tests", "golden", "ours_cornell_512.png"))
    ref = linearize(ref8)
    ours = linearize(ours8)

    def block_means(img):
        return img.reshape(GRID, H // GRID, GRID, W // GRID, 3).mean(axis=(1, 3))

    ref_m = block_means(ref)
    ours_m = block_means(ours)
    adiff = np.abs(ref_m - ours_m).max(axis=-1)
    clip = (
        (ref8.max(axis=-1) >= 250)
        .reshape(GRID, H // GRID, GRID, W // GRID)
        .mean(axis=(1, 3))
    )
    clean = clip < 0.001

    targets = [
        (r, c)
        for r in range(GRID)
        for c in range(GRID)
        if clean[r, c] and adiff[r, c] > DIFF_BAR
    ]
    targets += [rc for rc in EXTRA_CLEAN if rc not in targets and clean[rc]]
    print(f"{len(targets)} regions to arbitrate (bar {DIFF_BAR})", flush=True)

    rows = []
    side = H // GRID
    for k, (r, c) in enumerate(targets):
        t0 = time.time()
        img = oracle.run(
            (r * side, (r + 1) * side), (c * side, (c + 1) * side), spp
        )
        om = img.mean(axis=(0, 1))
        rm = ref_m[r, c]
        um = ours_m[r, c]
        d_ours = float(np.abs(um - om).max())
        d_ref = float(np.abs(rm - om).max())
        rows.append(
            {
                "region": [r, c],
                "golden_absdiff": round(float(adiff[r, c]), 4),
                "oracle": [round(float(v), 4) for v in om],
                "ours": [round(float(v), 4) for v in um],
                "reference": [round(float(v), 4) for v in rm],
                "ours_vs_oracle": round(d_ours, 4),
                "ref_vs_oracle": round(d_ref, 4),
                "closer": "ours" if d_ours <= d_ref else "reference",
            }
        )
        print(
            f"[{k+1}/{len(targets)}] ({r:2d},{c:2d}) ours {d_ours:.4f} "
            f"ref {d_ref:.4f} -> {rows[-1]['closer']} "
            f"({time.time()-t0:.0f} s)",
            flush=True,
        )
        with open("/tmp/r4_golden_sweep.json", "w") as f:
            json.dump({"spp": spp, "diff_bar": DIFF_BAR, "rows": rows}, f, indent=1)

    ours_wins = sum(1 for x in rows if x["closer"] == "ours")
    worst_ours = max(x["ours_vs_oracle"] for x in rows)
    print(
        f"DONE: ours closer in {ours_wins}/{len(rows)}; "
        f"max |ours - oracle| = {worst_ours:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
