"""Replot training losses/metrics from a run directory's losses.json /
metrics.json (reference util/load_display_losses.py). Writes PNG charts
next to the JSON when matplotlib is available, else prints a text summary.

    python scripts/plot_losses.py checkpoints/myrun
"""

from __future__ import annotations

import json
import os
import sys


def main(run_dir):
    for kind in ("losses", "metrics"):
        path = os.path.join(run_dir, f"{kind}.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            rows = json.load(f)
        if not rows:
            continue
        keys = sorted({k for r in rows for k in r
                       if k not in ("epoch", "iters")})
        xs = [r.get("iters", i) for i, r in enumerate(rows)]
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(10, 5))
            for k in keys:
                ys = [r.get(k) for r in rows]
                ax.plot([x for x, y in zip(xs, ys) if y is not None],
                        [y for y in ys if y is not None], label=k)
            ax.set_xlabel("iters")
            ax.legend(fontsize=7)
            out = os.path.join(run_dir, f"{kind}.png")
            fig.savefig(out, dpi=120, bbox_inches="tight")
            print("wrote", out)
        except ImportError:
            print(f"--- {kind} (last row) ---")
            for k in keys:
                vals = [r[k] for r in rows if k in r]
                print(f"  {k}: last={vals[-1]:.5f} min={min(vals):.5f} "
                      f"max={max(vals):.5f} (n={len(vals)})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
